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

    NULL scores always sort LAST (asc_nulls_last / desc_nulls_last): Spark's
    plain asc() puts NULL first, which would let null-score rows win both
    the per-key dedup and the global cut — the pandas reference
    (sort_values) puts NaN last in either direction."""
    direction = F.asc_nulls_last(score) if ascending else F.desc_nulls_last(score)
    order = [direction] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    best = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    final_order = [direction] + [F.asc(key)]
    return best.orderBy(*final_order).limit(k)
