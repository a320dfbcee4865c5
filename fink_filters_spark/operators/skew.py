"""Skew mitigation for hot join/group keys (100 TB design surface).

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime; ``salted_join`` is the explicit fallback for the cases AQE cannot
rewrite — e.g. a broadcast-ineligible dimension joined on a power-law key
(one objectId with millions of detections). The big side's hot keys spread
over ``salt`` buckets; the small side replicates each row ``salt`` times, so
the join remains exact while the per-task load flattens.

``salted_group_count`` shows the two-phase aggregation form of the same
trick (pre-aggregate on (key, salt), then merge) — for aggregations that are
not algebraic partial-aggregates already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Exact equi-join with the big side salted and the small side exploded.

    Output columns = big ⋈ small minus the helper salt column. ``how`` is
    restricted to the joins whose semantics survive small-side replication;
    right/full outer would null-extend each UNMATCHED small-side row once
    per salt replica (``salt`` duplicate outputs).
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the exploded small side"
            f" would emit unmatched rows {salt}x under right/full outer joins"
        )
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, on=[key, "__salt"], how=how).drop("__salt")


def salted_group_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase grouped count: (key, salt) partial -> key merge.

    The salt must be ROW-dependent (hash of every column, same scheme as
    ``salted_join``): deriving it from the grouping key alone maps all of a
    hot key's rows to one (key, salt) bucket — the phase-1 shuffle then
    concentrates exactly like an unsalted groupBy and the operator is a
    silent no-op for its stated purpose. spark_partition_id is mixed in so
    even byte-identical duplicate rows spread across the buckets they came
    from (still deterministic for a fixed input partitioning)."""
    partial = (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*df.columns) + F.spark_partition_id(), F.lit(salt)),
        )
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").alias("n"))
