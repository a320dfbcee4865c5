"""Minimal stdlib HTTP layer for sources/sinks (no third-party client).

The reference uses ``requests`` / ``slack_sdk`` / telegram's client for its
HTTP side effects (``ztf/livestream/filter_anomaly_notification/
filter_utils.py:70-139,269-326``, ``filter_early_sn_candidates/
filter.py:182-211``). This container has no external network and none of
those wheels, but ``urllib`` is stdlib — so the transports can still be
REAL clients, exercised in tests against an in-process loopback
``http.server``. Rate-limit handling mirrors the reference's
``msg_handler_slack`` pattern: a 429 maps to a retryable error carrying the
server's ``Retry-After``.
"""

from __future__ import annotations

import http.client
import json
import urllib.error
import urllib.request

__all__ = ["HttpError", "http_get_json", "http_post_json"]


class HttpError(Exception):
    """Transport-level failure. ``retry_after`` (seconds) is populated from
    the HTTP Retry-After header when the server sent one (429/503);
    ``status`` is None for connection-level failures."""

    def __init__(self, msg: str, status: int | None = None,
                 retry_after: float | None = None):
        super().__init__(msg)
        self.status = status
        self.retry_after = retry_after


def _retry_after(headers) -> float | None:
    v = headers.get("Retry-After") if headers is not None else None
    try:
        return float(v) if v is not None else None
    except ValueError:  # HTTP-date form — treat as "retry with own backoff"
        return None


def _do(req: urllib.request.Request, timeout: float):
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            if not body:
                return None
            try:
                return json.loads(body)
            except ValueError:
                # 2xx with a non-JSON body is still success — real Slack
                # incoming webhooks answer 200 with the literal text "ok"
                return body.decode(errors="replace")
    except urllib.error.HTTPError as e:
        raise HttpError(
            f"HTTP {e.code} from {req.full_url}",
            status=e.code,
            retry_after=_retry_after(e.headers),
        ) from e
    except (
        urllib.error.URLError,
        OSError,
        TimeoutError,
        # body-read failures (server closed mid-body -> IncompleteRead,
        # malformed chunked encoding) are HTTPException, NOT OSError —
        # without this they escaped raw past the documented
        # raises-HttpError contract and skipped the retryable path
        http.client.HTTPException,
    ) as e:
        raise HttpError(f"connection failure to {req.full_url}: {e}") from e


def http_get_json(url: str, timeout: float = 10.0,
                  headers: dict | None = None):
    """GET ``url`` and parse the JSON body (None for an empty body)."""
    req = urllib.request.Request(url, headers=headers or {}, method="GET")
    return _do(req, timeout)


def http_post_json(url: str, payload: dict, timeout: float = 10.0,
                   headers: dict | None = None):
    """POST ``payload`` as a JSON body; returns the parsed JSON response
    (None for an empty body). Raises HttpError on non-2xx / connection
    failure, with retry_after populated from 429/503 responses."""
    data = json.dumps(payload, default=str).encode()
    hdrs = {"Content-Type": "application/json", **(headers or {})}
    req = urllib.request.Request(url, data=data, headers=hdrs, method="POST")
    return _do(req, timeout)
