"""Real-HTTP verification over an in-process loopback server: the stdlib
transports (Slack/Telegram/webhook sinks) and the REST DataSource's HTTP
fetcher exercised end-to-end without external network."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


class _Handler(BaseHTTPRequestHandler):
    server_version = "test"

    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, obj, extra: dict | None = None) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _text(self, code: int, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        state = self.server.state  # type: ignore[attr-defined]
        if self.path.startswith("/pages"):
            page = int(self.path.split("page=")[1].split("&")[0])
            rows = [
                {"obj_id": page * 10 + i, "ra": float(i), "dec": -float(i),
                 "name": f"N{page}_{i}", "page": page}
                for i in range(3)
            ]
            state["gets"].append(self.path)
            self._json(200, rows)
        else:
            self._json(404, {"err": "no route"})

    def do_POST(self):
        state = self.server.state  # type: ignore[attr-defined]
        n = int(self.headers.get("Content-Length", "0"))
        payload = json.loads(self.rfile.read(n)) if n else None
        if self.path == "/slack":  # real Slack webhooks answer plain "ok"
            state["posts"].append((self.path, payload))
            self._text(200, b"ok")
            return
        if self.path == "/flaky":
            state["flaky_hits"] += 1
            if state["flaky_hits"] == 1:
                self._json(429, {"err": "rate limited"},
                           {"Retry-After": "0.01"})
                return
        state["posts"].append((self.path, payload))
        self._json(200, {"ok": True})


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.state = {"posts": [], "gets": [], "flaky_hits": 0}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv.state
    srv.shutdown()


def test_http_post_and_429_mapping(server):
    from fink_filters_spark.net import HttpError, http_post_json

    base, state = server
    assert http_post_json(f"{base}/hook", {"a": 1}) == {"ok": True}
    assert state["posts"][-1] == ("/hook", {"a": 1})
    with pytest.raises(HttpError) as ei:
        http_post_json(f"{base}/flaky", {"b": 2})
    assert ei.value.status == 429 and ei.value.retry_after == 0.01
    # connection-level failure -> HttpError with no status
    with pytest.raises(HttpError) as ei2:
        http_post_json("http://127.0.0.1:1/x", {}, timeout=0.2)
    assert ei2.value.status is None


def test_slack_and_telegram_transports_deliver(server, monkeypatch):
    from fink_filters_spark.sinks import SlackTransport, TelegramTransport

    base, state = server
    monkeypatch.setenv("KNWEBHOOK", f"{base}/slack")
    SlackTransport().send({"text": "SN candidate", "objectId": "ZTF1"})
    path, payload = state["posts"][-1]
    assert path == "/slack" and payload["text"] == "SN candidate"
    assert payload["objectId"] == "ZTF1"

    monkeypatch.setenv("FINK_TG_TOKEN", "tok123")
    # default is PLAIN text (no parse_mode): unescaped survey ids like
    # ZTF21_abc would make MarkdownV2 sends fail server-side
    TelegramTransport(chat_id="@chan", api_base=base).send({"text": "hi_x"})
    path, payload = state["posts"][-1]
    assert path == "/bottok123/sendMessage"
    assert payload == {"chat_id": "@chan", "text": "hi_x"}
    TelegramTransport(chat_id="@chan", api_base=base,
                      parse_mode="MarkdownV2").send({"text": "ok"})
    assert state["posts"][-1][1]["parse_mode"] == "MarkdownV2"

    with pytest.raises(ValueError):
        SlackTransport(webhook_env="UNSET_ENV_VAR_XYZ")


def test_credentials_redacted_from_errors_and_cause_chain(monkeypatch):
    import traceback

    from fink_filters_spark.sinks import (
        SlackTransport,
        TelegramTransport,
        TransportError,
    )

    tr = TelegramTransport(chat_id="@c", token="sekrit42",
                           api_base="http://127.0.0.1:1")
    with pytest.raises(TransportError) as ei:
        tr.send({"text": "x"})
    # the WHOLE formatted exception (what logging.exception prints,
    # including __cause__/__context__) must be free of the token
    rendered = "".join(traceback.format_exception(ei.value))
    assert "sekrit42" not in rendered
    assert "***" in str(ei.value)

    # a Slack webhook URL is itself a credential
    sl = SlackTransport(url="http://127.0.0.1:1/services/SECRETPATH")
    with pytest.raises(TransportError) as ei2:
        sl.send({"text": "x"})
    rendered2 = "".join(traceback.format_exception(ei2.value))
    assert "SECRETPATH" not in rendered2

    # NON-HttpError failures (e.g. ValueError from a malformed URL) must
    # also come out sanitized — urllib raises before any request is made
    bad = TelegramTransport(chat_id="@c", token="sekrit42",
                            api_base="127.0.0.1:9")  # no scheme
    with pytest.raises(TransportError) as ei3:
        bad.send({"text": "x"})
    assert "sekrit42" not in "".join(traceback.format_exception(ei3.value))


def test_non_json_2xx_body_is_success(server):
    from fink_filters_spark.net import http_post_json

    base, state = server
    assert http_post_json(f"{base}/slack", {"text": "t"}) == "ok"
    assert state["posts"][-1] == ("/slack", {"text": "t"})


def test_retry_policy_honors_server_retry_after(server):
    from fink_filters_spark.sinks import HttpTransport, RetryPolicy

    base, state = server
    state["flaky_hits"] = 0
    waits = []
    policy = RetryPolicy(max_attempts=3, sleep=waits.append)
    tr = HttpTransport(f"{base}/flaky")
    assert policy.run(lambda: tr.send({"x": 1})) is True
    assert waits == [0.01]  # the server's Retry-After, not the base backoff
    assert state["posts"][-1] == ("/flaky", {"x": 1})


def test_rest_snapshot_datasource_fetches_over_http(server, spark):
    from fink_filters_spark.sources.rest_datasource import register

    base, state = server
    register(spark)
    df = (
        spark.read.format("rest_snapshot")
        .option("pages", "3")
        .option("url", f"{base}/pages")
        .load()
    )
    rows = sorted((r.page, r.obj_id, r.name) for r in df.collect())
    assert len(rows) == 9  # 3 pages x 3 records, fetched in executor tasks
    assert rows[0] == (0, 0, "N0_0") and rows[-1] == (2, 22, "N2_2")
    assert any("/pages?page=2" in g for g in state["gets"])


def test_notification_sink_end_to_end_over_http(server, spark):
    from fink_filters_spark.sinks import HttpTransport, NotificationSink

    base, state = server
    sink = NotificationSink(
        transport=HttpTransport(f"{base}/sink"),
        formatter=lambda row: {"text": f"alert {row['objectId']}"},
        key_cols=("objectId",),
    )
    df = spark.createDataFrame(
        [("ZTF1", 0.9), ("ZTF2", 0.8)], "objectId string, score double"
    )
    sink(df, batch_id=7)
    sent = [p for path, p in state["posts"] if path == "/sink"]
    assert {p["text"] for p in sent} == {"alert ZTF1", "alert ZTF2"}
    # idempotency: foreachBatch REPLAYS redeliver the same batch_id —
    # that's what must not resend...
    n = len(sent)
    sink(df, batch_id=7)
    sent2 = [p for path, p in state["posts"] if path == "/sink"]
    assert len(sent2) == n
    # ...while a NEW batch carrying the same object (fresh alert data) is
    # a legitimate new notification, not a duplicate
    sink(df, batch_id=8)
    sent3 = [p for path, p in state["posts"] if path == "/sink"]
    assert len(sent3) == n + 2


def test_anomaly_flow_end_to_end_over_loopback(server, spark):
    """The reference's anomaly lifecycle recomposed end-to-end: SQL-string
    prefilter -> night-median guard -> dedup-then-top-k -> the reference's
    message templates -> a REAL Slack webhook POST per block (mrkdwn text
    riding in the Slack payload) — against the loopback server, like the
    reference's msg_handler_slack chat_postMessage loop
    (filter_anomaly_notification/filter.py:166-253, filter_utils.py:269-326)."""
    from pyspark.sql import functions as F

    from fink_filters_spark.functions.astro import gal_b, gal_l
    from fink_filters_spark.programs.anomaly import (
        anomaly_messages,
        anomaly_notification,
    )
    from fink_filters_spark.sinks import SlackTransport

    base, state = server
    df = spark.range(0, 50).select(
        F.concat(F.lit("ZTF2"), F.col("id")).alias("objectId"),
        F.col("id").cast("long").alias("candid"),
        (F.col("id") % 360).cast("double").alias("ra"),
        ((F.col("id") % 120) - 60).cast("double").alias("dec"),
        (F.col("id") * 37 % 100 / 100.0).alias("rb"),
        F.lit("2024-01-02 03:04:05.678901").alias("timestamp"),
        (-(F.col("id") % 17) / 10.0).alias("anomaly_score"),
    )
    sel = anomaly_notification(df, threshold=3).select(
        "*", gal_l("ra", "dec").alias("gal_l"), gal_b("ra", "dec").alias("gal_b")
    )
    rows = [r.asDict() for r in sel.collect()]
    assert 0 < len(rows) <= 3
    init, _tg, slack_blocks = anomaly_messages(rows, median=-0.8)
    tr = SlackTransport(url=f"{base}/slack")
    before = len(state["posts"])
    for block in [init] + slack_blocks:
        tr.send({"text": block})
    sent = [p for _, p in state["posts"][before:]]
    assert sent[0]["text"] == "Median anomaly score overnight: -0.8."
    assert len(sent) == 1 + len(rows)
    for p, row in zip(sent[1:], rows):
        assert p["text"].startswith("==========================\nID: <")
        assert row["objectId"] in p["text"]
        assert "**Anomaly score**" in p["text"]
