"""Relational surface, part 3 — the remaining TPC-H query shapes, adapted to
the synthetic schema (no partsupp table: the lineitem (partkey, suppkey)
pairs play the part-supplier link, p_retailprice stands in for supply cost).

Shapes covered here (reference delegates all of this to vanilla Spark,
SURVEY §4; these pin the generic-engine surface):

- q6  : pure filter + global agg — the predicate-pushdown showcase.
- q2  : per-group min + equality re-join (correlated MIN subquery).
- q9  : many-way join + date-part extraction + signed measure agg.
- q11 : fraction-of-total HAVING via a global scalar subquery.
- q12 : join + CASE-bucketed conditional counts per category.
- q15 : aggregate view + global MAX scalar subquery (top supplier).
- q20 : nested correlated aggregate comparison (semi join on a condition
        between two different aggregates of the same fact table).

Scale notes (100 TB): every aggregate here is partial-aggregable (integer
sums/counts — see tables.py parity rules); derived per-key aggregates are
far smaller than the fact table, so AQE turns their re-joins into broadcasts
at runtime when they fit, and they stay key-partitioned shuffle joins when
they don't. No driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table
from . import QuerySpec


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str):
    return F.round(F.col(col) * 100).cast("long")


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-table filter + global aggregate; every
    predicate is a plain comparison, so the whole WHERE clause reaches the
    parquet scan as PushedFilters and only 4 columns are read."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") < 24.0)
        )
        .withColumn("disc_pct", _pct("l_discount"))
        .filter((F.col("disc_pct") >= 5) & (F.col("disc_pct") <= 7))
        .agg(
            F.sum(_cents("l_extendedprice") * F.col("disc_pct")).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(sum(ep_cents * disc_pct) AS BIGINT) AS revenue_e4,
       count(*) AS n_rows
FROM (
  SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS ep_cents,
         CAST(round(l_discount*100) AS BIGINT) AS disc_pct
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_quantity < 24.0
)
WHERE disc_pct BETWEEN 5 AND 7
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for each qualifying part,
    keep the supplier(s) achieving the minimum observed price. Decorrelated
    as: per-(part,supplier) min price → per-part min → equality re-join.

    Scale: the part filter is pushed BELOW the lineitem aggregation as a
    broadcast semi join (Catalyst won't infer a semi join through an
    aggregate on its own) — only qualifying parts' lineitems are ever
    grouped, shrinking the first shuffle by the part-filter selectivity.
    The remaining aggregates are dimension-sized and AQE broadcasts them."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    link = (
        li.groupBy(F.col("l_partkey").alias("ps_partkey"),
                   F.col("l_suppkey").alias("ps_suppkey"))
        .agg(F.min(_cents("l_extendedprice")).alias("cost_cents"))
    )
    best = link.groupBy(F.col("ps_partkey").alias("mp_partkey")).agg(
        F.min("cost_cents").alias("min_cost_cents")
    )
    return (
        link.join(
            best,
            (F.col("ps_partkey") == F.col("mp_partkey"))
            & (F.col("cost_cents") == F.col("min_cost_cents")),
        )
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(sup, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            _cents("s_acctbal").alias("s_acctbal_cents"),
            "cost_cents",
        )
    )


Q2_SQL = """
WITH link AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(min(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT ps_partkey AS mp_partkey, CAST(min(cost_cents) AS BIGINT) AS min_cost_cents
  FROM link GROUP BY ps_partkey
)
SELECT p_partkey, p_name, s_name, n_name,
       CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_cents,
       cost_cents
FROM link
JOIN best ON ps_partkey = mp_partkey AND cost_cents = min_cost_cents
JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 10 AND p_type = 'ECONOMY'
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way join + year extraction + signed profit measure
    per (nation, year). p_retailprice stands in for ps_supplycost:
    profit = discounted revenue − quantity · retail cost (can be negative).

    Scale: lineitem⋈orders shuffles on orderkey; part/supplier/nation are
    AQE-broadcast after pruning to 2 columns each; the group-by output is
    |nations|·|years| rows — collapsed map-side."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", _cents("p_retailprice").alias("retail_cents"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = (
        _cents("l_extendedprice") * (100 - _pct("l_discount"))
        - F.col("l_quantity").cast("long") * F.col("retail_cents") * F.lit(100)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("amount_e4", amount)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum("amount_e4").alias("profit_e4"))
    )


Q9_SQL = """
SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(sum(
         CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
         - CAST(l_quantity AS BIGINT) * CAST(round(p_retailprice*100) AS BIGINT) * 100
       ) AS BIGINT) AS profit_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value restricted to one nation's suppliers,
    kept only when it exceeds a fraction of the total — a HAVING clause
    against a global scalar subquery. Unlike TPC-H's fixed fraction (whose
    selectivity collapses as |parts| grows with SF), the threshold is
    scale-invariant: keep parts above 2× the average per-part value. The
    test stays exact: value_e2 · n_parts > 2 · total_e2 (no float ratio).

    Scale: the scalar total is a second aggregation of the same per-part
    aggregate (cheap); it joins in as a 1-row broadcast nested loop."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    ).select("n_nationkey")
    li = load_table(spark, sf_dir, "lineitem")
    value = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")
                   * _cents("l_extendedprice")).alias("value_e2"))
    )
    total = value.agg(F.sum("value_e2").alias("total_e2"),
                      F.count(F.lit(1)).alias("n_parts"))
    return (
        value.join(F.broadcast(total))
        .filter(F.col("value_e2") * F.col("n_parts") > F.lit(2) * F.col("total_e2"))
        .select("l_partkey", "value_e2")
    )


Q11_SQL = """
WITH value AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_e2
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l_partkey
)
SELECT l_partkey, value_e2
FROM value, (SELECT CAST(sum(value_e2) AS BIGINT) AS total_e2, count(*) AS n_parts
             FROM value) t
WHERE value_e2 * n_parts > 2 * total_e2
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + CASE-bucketed conditional counts
    per category (high- vs low-priority orders per return flag)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view per supplier over a quarter, then the
    supplier(s) achieving the global maximum — a MAX scalar subquery over a
    derived aggregate. Exact integer revenue makes the equality robust."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("r_suppkey"))
        .agg(F.sum(_cents("l_extendedprice")
                   * (100 - _pct("l_discount"))).alias("total_rev_e4"))
    )
    mx = rev.agg(F.max("total_rev_e4").alias("max_rev_e4"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev_e4") == F.col("max_rev_e4"))
        .join(sup, F.col("r_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS r_suppkey,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-07-01' AND l_shipdate < TIMESTAMP '1997-10-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM rev JOIN supplier ON r_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
"""


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested correlated aggregate comparison — suppliers
    with at least one qualifying part whose 1997 shipped quantity exceeds
    half their all-time quantity for that part, restricted to two nations.
    Decorrelated as: two aggregates of lineitem at (supplier, part) grain,
    joined and compared, then a left-semi join into supplier.

    Scale: both aggregates share the (l_suppkey, l_partkey) grouping key, so
    they reuse one shuffle partitioning; the semi join input is pair-grain
    (≪ lineitem)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    ).select("n_nationkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    qty97 = F.when(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz")),
        F.col("l_quantity").cast("long"),
    ).otherwise(F.lit(0))
    pairs = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(qty97).alias("qty_97"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty_all"),
        )
        .filter(F.col("qty_97") * 2 > F.col("qty_all"))
        .select("l_suppkey")
    )
    return (
        sup.join(pairs, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", _cents("s_acctbal").alias("s_acctbal_cents"))
    )


Q20_SQL = """
WITH pairs AS (
  SELECT l_suppkey,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1998-01-01'
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_97,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_all
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name, CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_cents
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2')
  AND s_suppkey IN (SELECT l_suppkey FROM pairs WHERE qty_97 * 2 > qty_all)
"""


SPECS = [
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              "pure pushdown filter + global agg"),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL,
              "correlated MIN subquery decorrelated to agg + equality re-join"),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL,
              "5-way join, year extraction, signed measure"),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL,
              "fraction-of-total HAVING via scalar subquery"),
    QuerySpec("q12_priority_shipping", q12_priority_shipping, Q12_SQL,
              "CASE-bucketed conditional counts"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              "aggregate view + MAX scalar subquery"),
    QuerySpec("q20_heavy_shippers", q20_heavy_shippers, Q20_SQL,
              "nested correlated aggregate comparison -> semi join"),
]
