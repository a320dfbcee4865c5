"""Relational core: scan → filter → aggregate → join → top-k.

The reference delegates all of this to vanilla Spark (SURVEY §4); these
queries pin down the engine surface (pushdown, broadcast joins, partial
aggregation, TakeOrderedAndProject) on the synthetic TPC-H-ish tables.

Scale notes (100 TB): group-by keys here are low-cardinality -> partial
(map-side) aggregation collapses the shuffle to ~|groups|·|partitions| rows.
Joins put the small dimension on the build side via explicit broadcast();
only lineitem⋈orders is a genuine shuffle join, on their natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table
from . import QuerySpec


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str):
    return F.round(F.col(col) * 100).cast("long")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-table scan + low-cardinality agg (4 groups)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .withColumn("ep_cents", _cents("l_extendedprice"))
        .withColumn("disc_pct", _pct("l_discount"))
        .withColumn("tax_pct", _pct("l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum("ep_cents").alias("sum_base_cents"),
            F.sum(F.col("ep_cents") * (100 - F.col("disc_pct"))).alias("sum_disc_e4"),
            F.sum(
                F.col("ep_cents") * (100 - F.col("disc_pct")) * (100 + F.col("tax_pct"))
            ).alias("sum_charge_e6"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.round(F.col("sum_qty").cast("double") / F.col("count_order"), 6)
        )
        .withColumn(
            "avg_price",
            F.round(F.col("sum_base_cents").cast("double") / 100.0 / F.col("count_order"), 6),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(ep_cents) AS BIGINT) AS sum_base_cents,
       CAST(sum(ep_cents * (100 - disc_pct)) AS BIGINT) AS sum_disc_e4,
       CAST(sum(ep_cents * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) AS sum_charge_e6,
       count(*) AS count_order,
       round(CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(CAST(sum(ep_cents) AS BIGINT) AS DOUBLE) / 100.0 / count(*), 6) AS avg_price
FROM (
  SELECT *,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep_cents,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter, broadcast customer, shuffle join
    orders⋈lineitem, grouped revenue, deterministic top-10."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("rev_e4", _cents("l_extendedprice") * (100 - _pct("l_discount")))
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"),
                 "o_orderpriority")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue_e4 DESC, l_orderkey ASC
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with three broadcast dims + co-nation
    supplier condition."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("rev_e4", _cents("l_extendedprice") * (100 - _pct("l_discount")))
        .groupBy("n_name")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def topk_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 anomaly top-k (reference ``ztf/filter_anomaly_notification/
    filter.py:176-188``): dedup-by-key (best event per user) then global
    top-20 — distributed TakeOrderedAndProject instead of the reference's
    sort+collect+pandas dedup."""
    from ..operators.topk import topk_by_key
    from ..tables import load_events

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    return topk_by_key(ev, key="user_id", score="value", k=20, tiebreak="event_id")


TOPK_SQL = """
WITH b AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
)
SELECT event_id, user_id, value FROM b WHERE rn = 1
ORDER BY value DESC, user_id ASC
LIMIT 20
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2 night-statistics shape (reference ``filter_anomaly_notification/
    filter.py:170-172`` uses approxQuantile; here the exact percentile so the
    oracle can match — Spark's GK-sketch approx variant is exercised in
    tests/)."""
    from ..tables import load_events, milli

    ev = load_events(spark, sf_dir).withColumn("v", milli("value"))
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_v"),
        F.round(F.expr("percentile(v, 0.5)"), 6).alias("median_v"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


AGG_STATS_SQL = """
SELECT count(*) AS n,
       CAST(sum(v) AS BIGINT) AS sum_v,
       round(quantile_cont(v, 0.5), 6) AS median_v,
       min(value) AS min_value,
       max(value) AS max_value,
       count(DISTINCT user_id) AS n_users
FROM (SELECT user_id, value, CAST(round(value * 1000) AS BIGINT) AS v FROM events)
"""


SPECS = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL,
              "scan+agg engine surface (SURVEY §2.E)"),
    QuerySpec("topk_anomalies", topk_anomalies, TOPK_SQL,
              "G1 dedup-then-top-k"),
    QuerySpec("agg_stats", agg_stats, AGG_STATS_SQL,
              "E1/E2 global stats + exact median"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL,
              "broadcast+shuffle join, top-k (SURVEY §2.G G1)"),
    QuerySpec("q5_nation_revenue", q5_nation_revenue, Q5_SQL,
              "multi-broadcast star join (SURVEY §2.D)"),
]
