"""Anomaly-notification program (SURVEY §3.2,
``ztf/filter_anomaly_notification/filter.py:26-268``).

Reference lifecycle: SQL-string filters -> isEmpty guard -> approxQuantile
median (job 1) -> sort().limit(10*k).toPandas() (job 2, driver collect) ->
pandas dedup by objectId -> cut at the k-th score -> per-candidate REST/Slack
loop on the driver.

Spark recomposition: the dedup-then-top-k is operators/topk.topk_by_key
(distributed window + TakeOrderedAndProject — no pandas, no trick_par
over-fetch heuristic); the median guard stays approxQuantile (same API); the
notification fan-out is a sinks.NotificationSink, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.topk import topk_by_key


def anomaly_notification(
    df: DataFrame,
    score_col: str = "anomaly_score",
    key_col: str = "objectId",
    threshold: int = 10,
    cutoff_quantile: float = 0.5,
    filters: list[str] | None = None,
    sink=None,
    tiebreak_col: str = "candid",
) -> DataFrame:
    """Select the ``threshold`` most anomalous objects of the night.

    Returns the selection DataFrame; if ``sink`` (a foreachBatch-style
    callable) is given, it is invoked once with the result (batch_id=-1).

    ``tiebreak_col``: equal-score alerts for one object need a
    deterministic survivor or the notification payload changes between
    identical reruns (shuffle-order row_number); defaults to the alert's
    unique ``candid``, falling back to unordered ties only when the
    column is absent.
    """
    for cond in filters or [f"not isnull({score_col})"]:
        df = df.filter(cond)
    if df.isEmpty():
        return df.limit(0)

    # night median guard (reference :170-172): approxQuantile, rel.err 0.05.
    median = df.approxQuantile(score_col, [cutoff_quantile], 0.05)[0]
    candidates = df.filter(F.col(score_col) <= F.lit(median))

    # most-anomalous = lowest score in the reference's convention (:176)
    return topk_by_key(
        candidates, key=key_col, score=score_col, k=threshold,
        ascending=True,
        tiebreak=tiebreak_col if tiebreak_col in df.columns else None,
    )


def notify(selection: DataFrame, sink) -> None:
    """Send the selection through a NotificationSink (B6-B8 semantics)."""
    sink(selection, -1)
