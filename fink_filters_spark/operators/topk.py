"""Top-k selection with dedup-by-key — the reference's anomaly-notification
shape (SURVEY §2.G G1, ``ztf/filter_anomaly_notification/filter.py:176-188``):
sort by score, pull ``trick_par*k`` to pandas, dedup objectId, cut at the
k-th score. The driver-side pandas step does not scale; the Spark dual is

    row_number() over (partition by key order by score)  ->  rn = 1
    global orderBy(score).limit(k)

which Catalyst executes as partial top-k per partition + TakeOrderedAndProject
— no full sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk_by_key(
    df: DataFrame,
    key: str,
    score: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Best row per ``key`` (dedup), then global top-``k`` by ``score``.

    NULL — and NaN — scores always sort LAST: Spark's plain asc() puts
    NULL first, and Spark orders NaN ABOVE every real value (so a 0/0
    anomaly score would win a descending top-k) — the pandas reference
    (sort_values) puts both last in either direction. NaN is folded to
    NULL via nanvl for the ordering only (the row's own column is
    untouched), then the *_nulls_last direction applies to both.

    ``tiebreak``: equal-score rows within a key are otherwise ordered by
    nothing — row_number() would pick a shuffle-order-dependent survivor
    whose payload columns change between identical reruns. Callers that
    need bit-reproducible output (this repo's default posture) must pass
    a unique column; None is accepted for exploratory use where any
    representative row will do."""
    if df.schema[score].dataType.simpleString() in ("float", "double"):
        sc = F.nanvl(F.col(score), F.lit(None))
    else:
        # integral scores have no NaN; keep native ordering (a cast to
        # double would lose precision past 2^53 and reorder big longs)
        sc = F.col(score)
    direction = sc.asc_nulls_last() if ascending else sc.desc_nulls_last()
    order = [direction] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    best = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    final_order = [direction] + [F.asc(key)]
    return best.orderBy(*final_order).limit(k)
