"""As-of (temporal nearest-predecessor) join — a custom operator Spark lacks
natively, built as a composition of existing DataFrame ops (union + window),
per the build rules for operators the engine must add beyond the reference
surface (the reference has no relational joins at all — SURVEY §2.D).

Semantics (direction="backward", inclusive): for each left row, attach the
payload of the right row with the greatest right_time <= left_time within
the same key group; null payload when no predecessor exists (left outer).
Matches DuckDB/kdb ASOF JOIN semantics (``l ASOF LEFT JOIN r ON l.k = r.k
AND l.t >= r.t``).

Why union+window instead of a range join: a naive join on
``l.k = r.k AND r.t <= l.t`` + max-per-row explodes to O(|matches|) pairs
before the dedup — quadratic per key in the worst case. The union encoding
is one shuffle on (key, time): sort-within-partition, then a running
``last(payload ignorenulls)`` carries each right payload forward to the
left rows that follow it. Linear work, no NLJ, AQE-safe — the plan a
1000-executor cluster wants at 100 TB (both sides shuffle-partitioned by
key; per-key state during the window scan is one payload row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Backward-inclusive as-of join; left columns preserved, ``payload``
    columns from ``right`` attached (null when no predecessor).

    ``right`` must be deterministic at (on, right_time) grain — pre-aggregate
    duplicates upstream (e.g. ``max_by``) or the carried payload depends on
    sort ties.
    """
    left_cols = left.columns
    lhs = left.withColumn("__t", F.col(left_time).cast("long")).withColumn(
        "__is_r", F.lit(0)
    )
    for p in payload:
        lhs = lhs.withColumn(f"__p_{p}", F.lit(None).cast(right.schema[p].dataType))
    rhs = right.select(
        F.col(on),
        F.col(right_time).cast("long").alias("__t"),
        F.lit(1).alias("__is_r"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
    )
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = lhs.unionByName(rhs.select(lhs.columns))
    # right rows sort BEFORE left rows at equal time -> inclusive match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for p in payload:
        merged = merged.withColumn(f"__p_{p}", F.last(f"__p_{p}", ignorenulls=True).over(w))
    return (
        merged.filter(F.col("__is_r") == 0)
        .select(*left_cols, *[F.col(f"__p_{p}").alias(p) for p in payload])
    )
