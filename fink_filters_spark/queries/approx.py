"""Approximate-algorithms surface (E1's approxQuantile generalized).

Sketches are the only viable form of distinct-count / quantile at 100 TB
(exact distinct shuffles every key; exact percentile sorts the world), but
their outputs aren't bit-reproducible across engines — so these queries are
made oracle-checkable by ASSERTING THE ERROR BOUND INSIDE THE QUERY: Spark
computes sketch AND exact in one pass, emits the exact value plus a
boolean "sketch within tolerance", and the DuckDB oracle reproduces the
exact side with a literal TRUE. A sketch regression (or a broken bound)
flips the boolean and fails the hash — a stronger check than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table, milli
from . import QuerySpec

RSD = 0.02          # HLL target relative standard deviation
UNIQ_TOL = 0.05     # accept |est - exact| <= 5% of exact
PCTL_ACC = 10_000   # approx_percentile accuracy knob
PCTL_TOL = 0.02     # accept p50 within 2% of the exact interpolated median


def agg_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: exact distinct users + HLL estimate bound check, and
    exact interpolated median of the integer value + GK-sketch bound check.
    One grouped pass computes all four; only exact values and the two
    booleans leave the query."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.select("event_type", "user_id", milli("value").alias("v")).groupBy(
        "event_type"
    ).agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.approx_count_distinct("user_id", rsd=RSD).alias("__est"),
        F.expr("percentile(v, 0.5)").alias("p50_v"),
        F.expr(f"approx_percentile(v, 0.5, {PCTL_ACC})").alias("__p50a"),
    )
    uniq_ok = (
        F.abs(F.col("__est") - F.col("n_users"))
        <= F.col("n_users").cast("double") * UNIQ_TOL
    )
    p50_ok = (
        F.abs(F.col("__p50a").cast("double") - F.col("p50_v"))
        <= F.abs(F.col("p50_v")) * PCTL_TOL
    )
    return per.select(
        "event_type",
        "n_users",
        # hash-stability: median of ints is an integer or exact .5 — 2x is
        # an exact BIGINT in every engine (DESIGN.md "integer micro-units")
        (F.col("p50_v") * 2).cast("long").alias("p50_v_x2"),
        uniq_ok.alias("uniq_ok"),
        p50_ok.alias("p50_ok"),
    )


APPROX_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS p50_v_x2,
       TRUE AS uniq_ok,
       TRUE AS p50_ok
FROM (SELECT event_type, user_id, CAST(round(value * 1000) AS BIGINT) AS v FROM events)
GROUP BY event_type
"""


SPECS = [
    QuerySpec("agg_approx_check", agg_approx_check, APPROX_SQL,
              "HLL distinct + approx percentile, error-bound-asserted vs exact"),
]
