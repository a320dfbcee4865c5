"""Incremental aggregate maintenance (partial-agg merge).

At 100 TB the history is append-only and nightly: rescanning every night's
data to refresh a dashboard aggregate is O(history) per refresh. The
standard fix is to persist a MERGEABLE partial-aggregate state per
(key, increment) and fold new increments in — O(increment) per refresh,
exactly the map-side-combine algebra Spark's own HashAggregate uses
(count/sum merge by +, min/max by min/max).

State schema produced here: the grouping keys plus, per measure ``m``:
``m_count, m_sum, m_min, m_max`` (sums over exact integer-quantized
values — tables.py parity conventions — so merge order cannot change the
result). ``finalize`` derives the non-mergeable outputs (avg) at read
time.

No reference counterpart (the reference recomputes offline programs per
night, SURVEY §3.2); this is new-scope engine surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

STATE_FIELDS = ("count", "sum", "min", "max")


def partial_state(df: DataFrame, keys: list[str], measures: dict[str, Column]) -> DataFrame:
    """One increment's mergeable state: groupBy(keys) with count/sum/min/max
    per measure. ``measures`` maps name -> exact-integer Column."""
    proj = df.select(*keys, *[c.alias(m) for m, c in measures.items()])
    aggs = []
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}_count"),
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return proj.groupBy(*keys).agg(*aggs)


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold any number of state DataFrames into one: union + re-aggregate
    with the merge algebra (count,sum -> sum; min -> min; max -> max).
    A key present in only some increments merges correctly because union
    is by name and absent rows simply don't contribute."""
    if not states:
        raise ValueError("merge_states needs at least one state")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    measures = sorted(
        {c[: -len("_count")] for c in unioned.columns if c.endswith("_count")}
    )
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}_count").alias(f"{m}_count"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the read-time aggregate view from a state: per measure,
    count/sum/min/max pass through and avg = (sum * 1e6) div count in
    exact integer ppm (hash-stability: DESIGN.md "integer micro-units")."""
    measures = sorted(
        {c[: -len("_count")] for c in state.columns if c.endswith("_count")}
    )
    cols: list[Column] = [F.col(k) for k in keys]
    for m in measures:
        cols += [
            F.col(f"{m}_count"),
            F.col(f"{m}_sum"),
            F.col(f"{m}_min"),
            F.col(f"{m}_max"),
            F.expr(
                f"CAST((CAST({m}_sum AS DECIMAL(38,0)) * 1000000)"
                f" div {m}_count AS LONG)"
            ).alias(f"{m}_avg_ppm"),
        ]
    return state.select(*cols)
