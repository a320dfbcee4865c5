"""Notification sinks (SURVEY §2.B B6-B8) as foreachBatch writers.

The reference POSTs to Slack/Telegram/REST *inside the filter UDFs on the
executors* (``ztf/livestream/filter_early_sn_candidates/filter.py:182-211``,
``filter_kn_candidates/filter.py:321-333``) — side effects in the selection
path, re-fired on task retry, invisible to the planner. Here notification is
a SINK stage: the filtered micro-batch flows into ``foreachBatch``, rows are
collected (post-filter cardinality is tiny by construction), formatted, and
handed to a transport with retry/backoff. Exactly-once-ish delivery comes
from the (batch_id, row key) idempotency key.

Transports are pluggable; the default ``CollectingTransport`` records
payloads in memory / to a local directory — the HTTP clients
(slack_sdk / python-telegram-bot / requests) are NOT available in this
offline container, so the webhook POST itself is stubbed behind the
Transport interface (clearly marked), while batching, formatting, retry,
and idempotency logic are real and tested.
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


class SlackTransport(Transport):  # pragma: no cover - requires network
    """B6: Slack webhook/WebClient transport — STUB.

    Reference behavior being reproduced: webhook POST per candidate gated by
    KNWEBHOOK* env vars (``filter_kn_candidates/filter.py:321-333``) and
    slack_sdk file upload + chat_postMessage
    (``filter_anomaly_notification/filter_utils.py:269-326``).
    """

    def __init__(self, webhook_env: str = "KNWEBHOOK"):
        self.webhook_env = webhook_env

    def send(self, payload: dict) -> None:
        raise NotImplementedError(
            "offline container: no HTTP client; wire requests.post(webhook, json=payload)"
        )


class TelegramTransport(Transport):  # pragma: no cover - requires network
    """B7: Telegram bot transport gated by FINK_TG_TOKEN — STUB
    (reference ``filter_early_sn_candidates/filter.py:182-211``)."""

    def send(self, payload: dict) -> None:
        raise NotImplementedError("offline container: no HTTP client")


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
                self.sleep(min(wait, self.max_delay))
                delay = min(delay * 2, self.max_delay)
        return False


@dataclass
class NotificationSink:
    """foreachBatch writer: format each row, send via transport with retry,
    dedupe on an idempotency key across retried batches.

    ``weekdays`` restricts delivery to the given ISO weekdays (1=Mon..7=Sun)
    — the reference's Friday-only Slack gate
    (``filter_kn_candidates/filter.py:340-345``) as sink POLICY rather than
    logic buried in the filter UDF. Selection semantics are unaffected.
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
        for row in rows:
            d = row.asDict(recursive=True)
            if self.key_cols:
                key = tuple(d.get(k) for k in self.key_cols)
                if key in self._seen:
                    continue
                self._seen.add(key)
            payload = dict(self.formatter(d))
            payload["_batch_id"] = batch_id
            self.retry.run(lambda p=payload: self.transport.send(p))
