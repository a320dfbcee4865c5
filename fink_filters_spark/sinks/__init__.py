"""Notification sinks (SURVEY §2.B B6-B8) as foreachBatch writers.

The reference POSTs to Slack/Telegram/REST *inside the filter UDFs on the
executors* (``ztf/livestream/filter_early_sn_candidates/filter.py:182-211``,
``filter_kn_candidates/filter.py:321-333``) — side effects in the selection
path, re-fired on task retry, invisible to the planner. Here notification is
a SINK stage: the filtered micro-batch flows into ``foreachBatch``, rows are
collected (post-filter cardinality is tiny by construction), formatted, and
handed to a transport with retry/backoff. Exactly-once-ish delivery comes
from the (batch_id, row key) idempotency key.

Transports are pluggable: ``CollectingTransport`` records payloads in
memory / to a local JSONL (the offline default), and ``HttpTransport`` /
``SlackTransport`` / ``TelegramTransport`` are REAL stdlib-urllib JSON
clients (``fink_filters_spark.net``) — the container has no external
network, so tests exercise them against an in-process loopback
``http.server`` (including 429 Retry-After pacing); batching, formatting,
retry, and idempotency logic are shared across all transports.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


class TransportError(Exception):
    def __init__(self, msg: str, retry_after: float | None = None):
        super().__init__(msg)
        self.retry_after = retry_after


class Transport:
    """One notification channel. ``send`` raises TransportError to retry."""

    def send(self, payload: dict) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class CollectingTransport(Transport):
    """Default offline transport: records payloads (optionally to JSONL)."""

    def __init__(self, path: str | None = None):
        self.sent: list[dict] = []
        self.path = path

    def send(self, payload: dict) -> None:
        self.sent.append(payload)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(payload, default=str) + "\n")


class FlakyTransport(Transport):
    """Test transport failing the first ``fail_times`` sends (retry tests)."""

    def __init__(self, fail_times: int = 1, retry_after: float | None = None):
        self.fail_times = fail_times
        self.retry_after = retry_after
        self.sent: list[dict] = []
        self.attempts = 0

    def send(self, payload: dict) -> None:
        self.attempts += 1
        if self.attempts <= self.fail_times:
            raise TransportError("simulated failure", retry_after=self.retry_after)
        self.sent.append(payload)


class HttpTransport(Transport):
    """Generic JSON-webhook transport over the stdlib HTTP layer
    (``fink_filters_spark.net``) — a REAL client, loopback-tested
    in-container; rate limits (429 Retry-After) surface as retryable
    TransportError so RetryPolicy honors the server's pacing."""

    def __init__(self, url: str, timeout: float = 10.0,
                 headers: dict | None = None):
        self.url = url
        self.timeout = timeout
        self.headers = headers or {}
        self._secret = ""  # subclasses set this to redact it from errors

    def _sanitize(self, msg: str) -> str:
        """Webhook URLs embed credentials in the PATH (Slack/Discord/Telegram
        convention), so error text keeps scheme+host only; ``_secret`` covers
        tokens that could surface outside the URL. Beyond the exact URL, the
        bare path (redirect targets, exception text that drops the host) and
        its percent-encoded form are replaced too — defense in depth against
        variants the exact-match replace would miss."""
        from urllib.parse import quote, urlsplit

        if self._secret:
            msg = msg.replace(self._secret, "***")
            msg = msg.replace(quote(self._secret, safe=""), "***")
        parts = urlsplit(self.url)
        if parts.netloc and parts.path not in ("", "/"):
            msg = msg.replace(self.url, f"{parts.scheme}://{parts.netloc}/***")
            for variant in (parts.path, quote(parts.path, safe=""),
                            quote(parts.path, safe="/")):
                if len(variant) > 1:
                    msg = msg.replace(variant, "/***")
        return msg

    def send(self, payload: dict) -> None:
        from ..net import HttpError, http_post_json

        # every failure is re-raised with a sanitized message and a
        # SUPPRESSED cause chain: logging.exception prints __cause__ /
        # __context__ too, and those embed the raw credential-bearing URL
        try:
            http_post_json(self.url, payload, timeout=self.timeout,
                           headers=self.headers)
        except HttpError as e:
            raise TransportError(self._sanitize(str(e)),
                                 retry_after=e.retry_after) from None
        except Exception as e:  # e.g. ValueError from a malformed URL
            raise TransportError(
                self._sanitize(f"{type(e).__name__}: {e}")) from None


class SlackTransport(HttpTransport):
    """B6: Slack incoming-webhook transport. Reference behavior being
    reproduced: webhook POST per candidate gated by KNWEBHOOK* env vars
    (``filter_kn_candidates/filter.py:321-333``) and slack_sdk
    chat_postMessage (``filter_anomaly_notification/filter_utils.py:269-326``).
    The webhook URL comes from the same env-var convention; the payload is
    Slack's ``{"text": ...}`` shape (non-text keys ride along)."""

    def __init__(self, webhook_env: str = "KNWEBHOOK",
                 url: str | None = None, timeout: float = 10.0):
        import os

        resolved = url or os.environ.get(webhook_env, "")
        if not resolved:
            raise ValueError(f"no Slack webhook: set ${webhook_env} or pass url=")
        super().__init__(resolved, timeout=timeout)

    def send(self, payload: dict) -> None:
        if "text" not in payload:
            payload = {"text": json.dumps(payload, default=str), **payload}
        super().send(payload)


class TelegramTransport(HttpTransport):
    """B7: Telegram bot transport gated by FINK_TG_TOKEN (reference
    ``filter_early_sn_candidates/filter.py:182-211``): POST to the bot
    API's sendMessage method with a fixed chat id. ``api_base`` is
    overridable so tests point it at a loopback server."""

    def __init__(self, chat_id: str, token_env: str = "FINK_TG_TOKEN",
                 token: str | None = None,
                 api_base: str = "https://api.telegram.org",
                 timeout: float = 10.0,
                 parse_mode: str | None = None):
        import os

        tok = token or os.environ.get(token_env, "")
        if not tok:
            raise ValueError(f"no Telegram token: set ${token_env} or pass token=")
        self.chat_id = chat_id
        # default plain text: parse_mode="MarkdownV2" makes the Bot API
        # REJECT any message with unbalanced metacharacters (survey ids
        # like ZTF21_abc contain '_'), so markup is strictly opt-in and the
        # caller owns the escaping
        self.parse_mode = parse_mode
        super().__init__(f"{api_base}/bot{tok}/sendMessage", timeout=timeout)
        self._secret = tok  # never let the bot token reach logs

    def send(self, payload: dict) -> None:
        text = payload.get("text")
        if text is None:
            text = json.dumps(payload, default=str)
        body = {"chat_id": self.chat_id, "text": text}
        if self.parse_mode:
            body["parse_mode"] = self.parse_mode
        super().send(body)


@dataclass
class RetryPolicy:
    """B8: retry with backoff honoring server-provided retry_after
    (reference ``filter_anomaly_notification/filter_utils.py:70-139``)."""

    max_attempts: int = 3
    base_delay: float = 0.5
    max_delay: float = 30.0
    sleep: Callable[[float], None] = time.sleep

    def run(self, fn: Callable[[], None]) -> bool:
        delay = self.base_delay
        for attempt in range(1, self.max_attempts + 1):
            try:
                fn()
                return True
            except TransportError as e:
                if attempt == self.max_attempts:
                    return False
                wait = e.retry_after if e.retry_after is not None else delay
                # clamp below at 0: a server-supplied negative Retry-After
                # would make time.sleep raise and kill the streaming query
                # — a remote peer must not control pipeline liveness
                self.sleep(min(max(wait, 0.0), self.max_delay))
                delay = min(delay * 2, self.max_delay)
        return False


@dataclass
class NotificationSink:
    """foreachBatch writer: format each row, send via transport with retry,
    dedupe on a (batch_id, row-key) idempotency key across REPLAYS of the
    same micro-batch (foreachBatch redelivers the same batch_id after a
    failure; a new batch_id carrying the same key is a legitimate new
    notification). Retry exhaustion RAISES after the batch's other rows
    are attempted, so the engine replays the batch and only the
    undelivered rows resend — a send failure is never silently dropped.

    ``weekdays`` restricts delivery to the given ISO weekdays (1=Mon..7=Sun)
    — the reference's Friday-only Slack gate
    (``filter_kn_candidates/filter.py:340-345``) as sink POLICY rather than
    logic buried in the filter UDF. Selection semantics are unaffected.

    ``max_rows_per_batch`` bounds the per-batch ``collect()``: a
    notification sink is human-facing, so rows beyond the cap are DROPPED
    for that batch by design (the reference likewise collects its selected
    alerts driver-side before posting). Keep the cap small — this sink is
    for tens of messages per micro-batch, not bulk egress; route bulk
    output through the storage/Kafka writers instead.
    """

    transport: Transport
    formatter: Callable[[dict], dict] = lambda row: row
    key_cols: tuple[str, ...] = ()
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    max_rows_per_batch: int = 1000
    weekdays: tuple[int, ...] | None = None
    clock: Callable[[], int] = lambda: __import__("datetime").date.today().isoweekday()
    _seen: set = field(default_factory=set)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.weekdays is not None and self.clock() not in self.weekdays:
            return
        rows = batch_df.limit(self.max_rows_per_batch).collect()
        failed = 0
        for row in rows:
            d = row.asDict(recursive=True)
            key = None
            if self.key_cols:
                # (batch_id, row key): the dedup exists for RETRIED batches
                # (same batch_id redelivered by foreachBatch), not to
                # suppress a key's legitimate later notifications — and a
                # batch-scoped key also bounds _seen (pruned below) instead
                # of growing for the stream's lifetime
                key = (batch_id, *(d.get(k) for k in self.key_cols))
                if key in self._seen:
                    continue
            payload = dict(self.formatter(d))
            payload["_batch_id"] = batch_id
            # mark seen only AFTER a successful send: retry exhaustion must
            # leave the key eligible for a replayed batch, not silently
            # swallow the notification forever
            if self.retry.run(lambda p=payload: self.transport.send(p)):
                if key is not None:
                    self._seen.add(key)
            else:
                failed += 1
        # prune other batches' keys: replays redeliver one batch_id
        self._seen = {k for k in self._seen if k[0] == batch_id}
        if failed:
            raise TransportError(
                f"NotificationSink: {failed}/{len(rows)} notifications "
                f"failed after {self.retry.max_attempts} attempts in batch "
                f"{batch_id} — raising so the batch retries (delivered rows "
                "are deduped by idempotency key)"
            )
