"""Relational surface, part 2: multi-alias joins, distinct aggregation,
NOT-IN rewrites, HAVING-IN semi joins, disjunctive pushdown, and
double-correlated EXISTS/NOT-EXISTS — the remaining TPC-H query shapes
expressible on the synthetic tables (no partsupp / commitdate columns, so
Q16/Q18/Q21 are adapted to use lineitem as the bridge).

The reference delegates all relational work to vanilla Spark (SURVEY §4);
these queries pin the generic-engine surface a fink-filters user gets for
free when they adopt this package.

Scale notes (100 TB): every query here keeps fact-table joins keyed on
their natural keys (shuffle joins that AQE upgrades to broadcast when the
filtered side allows), projects before the shuffle, and never collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..tables import load_table
from . import QuerySpec


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str):
    return F.round(F.col(col) * 100).cast("long")


_REV_E4 = "CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))"


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension (nation) joined twice under two
    aliases — supplier nation vs customer nation — for a chosen nation pair,
    grouped by the pair and ship year.

    Scale: the two nation joins are fixed-size broadcasts; lineitem⋈orders
    and orders⋈customer shuffle on their natural keys. The nation-pair
    filter lands on the broadcast sides, so the fact shuffle carries only
    surviving rows."""
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .withColumn("rev_e4", _cents("l_extendedprice") * (100 - _pct("l_discount")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_REV_E4} AS rev_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer over one
    quarter-year window, grouped on a wide key (customer attributes +
    nation), deterministic top-20.

    Scale: lineitem('R')⋈orders(window) shuffles on orderkey, then on
    custkey into customer; nation is a fixed broadcast. Top-20 is
    TakeOrderedAndProject — no global sort materialization."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rev_e4", _cents("l_extendedprice") * (100 - _pct("l_discount")))
        .groupBy("c_custkey", "c_name", F.col("c_acctbal").alias("c_acctbal"), "n_name")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name, {_REV_E4} AS rev_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
)
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_e4 DESC, c_custkey ASC
LIMIT 20
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: lineitem is the part↔supplier bridge since
    there is no partsupp table): count DISTINCT suppliers per (brand, type,
    size) bucket, excluding one brand, one type prefix, and a NOT-IN
    supplier denylist (rewritten as a broadcast anti join).

    Scale: the anti join's build side (filtered supplier keys) is tiny; the
    distinct-agg shuffles (brand,type,size,suppkey) then re-aggregates —
    Spark's two-phase distinct keeps it map-side partial."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    deny = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%77%"))
        .select(F.col("s_suppkey").alias("deny_key"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(deny, F.col("l_suppkey") == F.col("deny_key"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
GROUP BY p_brand, p_type, p_size
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING over a lineitem aggregate, consumed as an IN-subquery == semi
    join), re-joined to customer and lineitem for the report, top-20.

    Scale: the HAVING aggregate reuses the lineitem shuffle keyed on
    l_orderkey; the surviving key set is small → AQE broadcasts it back
    against orders."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
        .select(F.col("l_orderkey").alias("big_okey"), "sum_qty")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_okey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            _cents("o_totalprice").alias("o_totalprice_cents"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice_cents"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(round(o_totalprice*100) AS BIGINT) AS o_totalprice_cents,
       sum_qty
FROM orders
JOIN (SELECT l_orderkey AS big_okey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 300) big
  ON o_orderkey = big_okey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice_cents DESC, o_orderkey ASC
LIMIT 20
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a 3-way disjunction of conjunctive
    brand/size/quantity windows. Exercises OR-of-ANDs predicate planning:
    Catalyst extracts the common join key and pushes the shared
    ``p_size`` / ``l_quantity`` bounds below the join as a union of ranges.

    Scale: part side is projected to 3 columns; join shuffles on partkey
    with the residual disjunction evaluated post-join inside codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & qty.between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .withColumn("rev_e4", _cents("l_extendedprice") * (100 - _pct("l_discount")))
        .agg(F.sum("rev_e4").alias("revenue_e4"), F.count(F.lit(1)).alias("n_rows"))
    )


Q19_SQL = f"""
SELECT CAST(sum(rev_e4) AS BIGINT) AS revenue_e4, count(*) AS n_rows
FROM (
  SELECT {_REV_E4} AS rev_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
)
"""


def q21_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: return-flag plays the late-delivery role
    since there are no commit/receipt dates): suppliers who, on finished
    multi-supplier orders, were the ONLY supplier with returned lines —
    correlated EXISTS (another supplier participated) + NOT EXISTS (no other
    supplier returned), planned as a semi join and an anti join over two
    aliases of lineitem.

    Scale: ONE lineitem scan. The EXISTS/NOT-EXISTS pair is algebraized
    into a per-(orderkey, suppkey) aggregate carrying the supplier's
    returned-ROW count (map-side partial agg collapses duplicate pairs
    before the shuffle), then a window over orderkey derives the order's
    supplier counts in place of a second aggregate + re-join of the
    returned lines: ``some other supplier`` == n_supp > 1, ``no other
    supplier returned`` == n_ret_supp == 1 given this supplier returned,
    and numwait == that sole returner's n_ret_rows (there is exactly one
    such supplier per qualifying order, so the sum over pairs equals the
    old count over returned lines). The only shuffles left are the pair
    aggregate and the pair-sized window/orders-semi re-key on orderkey;
    supplier broadcasts. The previous shape re-scanned lineitem for the
    returned lines and shuffled them a second time — at 100 TB that was
    the dominant exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    pairs = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_returnflag") == "R").cast("int").alias("__r"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("__r").alias("n_ret_rows"))
    )
    w = Window.partitionBy("l_orderkey")
    sole = (
        pairs.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_ret_supp", F.sum((F.col("n_ret_rows") > 0).cast("int")).over(w))
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("n_ret_supp") == 1)
            & (F.col("n_ret_rows") > 0)
        )
    )
    return (
        sole.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_ret_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of supply revenue per order year —
    conditional aggregation producing a PER-GROUP ratio (q14's ratio is
    global). The share stays a single deterministic double expression over
    exact integer sums.

    Scale: lineitem⋈orders and lineitem⋈supplier shuffle on natural keys;
    nation is a fixed broadcast; the per-year agg collapses map-side
    (|years| groups)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("rev_e4", _cents("l_extendedprice") * (100 - _pct("l_discount")))
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("n_name") == "NATION_5", F.col("rev_e4"))
                  .otherwise(F.lit(0))).alias("nation_e4"),
            F.sum("rev_e4").alias("total_e4"),
        )
    )
    # hash-stability: exact integer ppm (DESIGN.md "integer micro-units")
    return agg.withColumn(
        "mkt_share_ppm",
        F.expr(
            "CAST((CAST(nation_e4 AS DECIMAL(38,0)) * 1000000)"
            " div total_e4 AS LONG)"
        ),
    )


Q8_SQL = f"""
SELECT o_year,
       CAST(sum(CASE WHEN n_name = 'NATION_5' THEN rev_e4 ELSE 0 END) AS BIGINT) AS nation_e4,
       CAST(sum(rev_e4) AS BIGINT) AS total_e4,
       CAST((sum(CASE WHEN n_name = 'NATION_5' THEN rev_e4 ELSE 0 END) * 1000000)
             // sum(rev_e4) AS BIGINT) AS mkt_share_ppm
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, n_name, {_REV_E4} AS rev_e4
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
GROUP BY o_year
"""


SPECS = [
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
              "per-group ratio via conditional aggregation"),
    QuerySpec("q7_nation_volume", q7_nation_volume, Q7_SQL,
              "same-dim double-alias join (supp vs cust nation)"),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              "wide-key grouped revenue + top-20"),
    QuerySpec("q16_supplier_count", q16_supplier_count, Q16_SQL,
              "distinct agg + NOT IN denylist anti join"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL,
              "HAVING aggregate consumed as semi join"),
    QuerySpec("q19_disjunctive", q19_disjunctive, Q19_SQL,
              "OR-of-ANDs predicate over a part join"),
    QuerySpec("q21_sole_returner", q21_sole_returner, Q21_SQL,
              "double-correlated EXISTS/NOT-EXISTS as semi+anti self-joins"),
]
