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


def _measure_names(columns: list[str], keys: list[str]) -> list[str]:
    """Measure names recovered from a state schema — THE one derivation
    (merge_states and finalize must agree). Key columns are excluded from
    the suffix sniff: a grouping key itself named ``*_count`` would
    otherwise manufacture a phantom measure and fail on its missing
    ``*_sum`` column."""
    keyset = set(keys)
    return sorted(
        {
            c[: -len("_count")]
            for c in columns
            if c.endswith("_count") and c not in keyset
        }
    )


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
    measures = _measure_names(unioned.columns, keys)
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
    measures = _measure_names(state.columns, keys)
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
