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
        # hash-stability: exact integer micro-units (DESIGN.md); avg_qty in
        # ppm of a quantity unit, avg_price in micro-dollars (cents * 1e4)
        .withColumn(
            "avg_qty_ppm",
            F.expr(
                "CAST((CAST(sum_qty AS DECIMAL(38,0)) * 1000000)"
                " div count_order AS LONG)"
            ),
        )
        .withColumn(
            "avg_price_micro",
            F.expr(
                "CAST((CAST(sum_base_cents AS DECIMAL(38,0)) * 10000)"
                " div count_order AS LONG)"
            ),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(ep_cents) AS BIGINT) AS sum_base_cents,
       CAST(sum(ep_cents * (100 - disc_pct)) AS BIGINT) AS sum_disc_e4,
       CAST(sum(ep_cents * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) AS sum_charge_e6,
       count(*) AS count_order,
       CAST((CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS avg_qty_ppm,
       CAST((CAST(sum(ep_cents) AS HUGEINT) * 10000) // count(*) AS BIGINT) AS avg_price_micro
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
    # every table here scales with SF, so no forced broadcasts: the plan
    # declares shuffle joins on the natural keys and AQE upgrades a side to
    # broadcast at runtime when its filtered size allows (all of them at
    # sf0.1; none of the fact sides at 100 TB).
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
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
    # only nation⋈region is a FIXED-size dimension (explicit broadcast);
    # orders/customer/supplier all scale with SF, so they stay shuffle
    # joins in the plan and AQE upgrades them to broadcast at runtime
    # whenever the filtered side is actually small (true at sf0.1)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sup,
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
        # hash-stability: a median of integers is an integer or exact .5 —
        # 2*median is an exact BIGINT in every engine (DESIGN.md)
        (F.expr("percentile(v, 0.5)") * 2).cast("long").alias("median_v_x2"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


AGG_STATS_SQL = """
SELECT count(*) AS n,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS median_v_x2,
       min(value) AS min_value,
       max(value) AS max_value,
       count(DISTINCT user_id) AS n_users
FROM (SELECT user_id, value, CAST(round(value * 1000) AS BIGINT) AS v FROM events)
"""


def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a join-side residual predicate,
    per-key count (zeros preserved), then a second aggregation over the
    counts. Exercises the outer-join + double-aggregation surface.

    Scale: orders are pre-aggregated per custkey BEFORE the outer join, so
    the map-side partial agg collapses the fact table ahead of its shuffle
    (|orders| rows -> ~|customers| partials) and the join moves aggregated
    rows only — join-then-aggregate would shuffle every order row. Customers
    with no qualifying orders surface via the left join with count 0. The
    second agg is tiny (distinct counts ~ hundreds) and collapses map-side."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    order_counts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_cust = (
        cust.join(order_counts, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q4_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery == LEFT SEMI join
    (orders that have at least one returned lineitem), grouped priority
    counts. Catalyst plans the semi join; lineitem side is projected to the
    join key only before the shuffle (column pruning at the scan)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) rewritten as aggregate + re-join — the standard decorrelation.
    The comparison ``l_quantity < 0.2 * avg(qty)`` is kept exact in integers:
    qty * n * 5 < sum_qty (no float average crosses the oracle boundary).

    Scale: lineitem is scanned twice (pruned to 2-3 columns each time); the
    per-part aggregate (|parts| rows, far smaller than lineitem) becomes the
    broadcast build side — at 100 TB, if |parts| outgrows the threshold,
    AQE falls back to a shuffle join keyed on l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("pp_partkey"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_li"),
        )
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pp_partkey"))
        .filter(F.col("l_quantity").cast("long") * F.col("n_li") * F.lit(5) < F.col("sum_qty"))
        .agg(
            F.sum(_cents("l_extendedprice")).alias("total_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pp_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
       count(*) AS n_rows
FROM lineitem JOIN per_part ON l_partkey = pp_partkey
WHERE CAST(l_quantity AS BIGINT) * n_li * 5 < sum_qty
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional aggregation
    (sum(CASE WHEN ...)), final ratio as one deterministic double expression
    over exact integer sums (parity rules in tables.py)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    # part scales with SF — no forced broadcast; AQE picks broadcast at
    # runtime when the projected (p_partkey, p_type) side is actually small
    agg = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("rev_e4", rev)
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), F.col("rev_e4"))
                  .otherwise(F.lit(0))).alias("promo_e4"),
            F.sum("rev_e4").alias("total_e4"),
        )
    )
    # hash-stability: promo share as exact integer ppm (DESIGN.md)
    return agg.withColumn(
        "promo_ppm",
        F.expr(
            "CAST((CAST(promo_e4 AS DECIMAL(38,0)) * 1000000)"
            " div total_e4 AS LONG)"
        ),
    )


Q14_SQL = """
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_e4 ELSE 0 END) AS BIGINT) AS promo_e4,
       CAST(sum(rev_e4) AS BIGINT) AS total_e4,
       CAST((sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_e4 ELSE 0 END) * 1000000)
             // sum(rev_e4) AS BIGINT) AS promo_ppm
FROM (
  SELECT p_type,
         CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery (average balance of in-credit
    customers) + anti join (customers with no urgent orders), grouped totals.
    The scalar aggregate is a 1-row broadcast (cross join); the threshold
    ``c_acctbal > avg(...)`` stays exact: bal_cents * n_pos > sum_pos_cents.

    Scale: the anti join shuffles customer vs orders key projections; the
    scalar side is a 1-row broadcast nested loop — no driver collect."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents("c_acctbal")).alias("sum_pos_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        cust.withColumn("bal_cents", _cents("c_acctbal"))
        .join(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos_cents"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
    )


Q22_SQL = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_pos_cents,
         count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM (SELECT *, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer) c, pos
WHERE bal_cents * n_pos > sum_pos_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
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
    QuerySpec("q13_order_histogram", q13_order_histogram, Q13_SQL,
              "left outer join + double aggregation"),
    QuerySpec("q4_exists_semi", q4_exists_semi, Q4_SQL,
              "EXISTS == left-semi join"),
    QuerySpec("q17_small_quantity", q17_small_quantity, Q17_SQL,
              "correlated scalar subquery decorrelated to agg+join"),
    QuerySpec("q14_promo_share", q14_promo_share, Q14_SQL,
              "conditional aggregation over broadcast join"),
    QuerySpec("q22_idle_customers", q22_idle_customers, Q22_SQL,
              "global scalar subquery + anti join"),
]
