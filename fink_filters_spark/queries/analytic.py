"""Analytic-SQL surface: the generic-engine shapes the reference never
needs itself (SURVEY §2.E note: "no grouping sets / cube / rollup /
distinct-agg anywhere in the reference; Spark provides them natively") but
that a user of a general query engine expects, each with a DuckDB oracle:

- NTILE decile bucketing over a total order (dimension-sized input);
- CUBE with all-subtotal planes;
- PIVOT (conditional-aggregation form on both sides);
- correlation / regression slope from exact integer sum-statistics
  (the parity-safe form of corr()/regr_slope(): float accumulation is
  order-dependent across engines, Σ-statistics over quantized integers
  are not — same trick as functions/arrays.linfit_slope);
- ordered string aggregation (sorted distinct concat);
- RANGE event-time frame (30-day moving sum per key — the frame-spec
  dual of w_lag_delta's ROWS frame);
- salted two-phase aggregation surfaced as a query (operators/skew.py),
  oracle = the plain GROUP BY it must be exactly equivalent to.

Scale notes (100 TB): NTILE needs a total order -> single-partition
window; it is only declared over the customer *dimension* (15k rows at
sf0.1), never a fact table. The RANGE frame partitions by user_id, so
state per task is one user's 30-day slice. The salted aggregation is the
explicit fallback for power-law keys that AQE cannot split (a running
grouped aggregate is already partial-aggregated map-side; salting matters
for the non-algebraic cases — the query pins exact equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.rank import grid_rank, ntile_from_rank
from ..operators.skew import salted_group_count
from ..tables import load_events, load_table
from . import QuerySpec, e6

US_30D = 30 * 86_400 * 1_000_000


def w_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile customers by account balance (ties broken by key so the
    total order — and therefore every bucket boundary — is deterministic),
    then aggregate per decile.

    NOT ``ntile(10) OVER (ORDER BY ...)``: an unpartitioned window is a
    single-partition WindowExec — every customer row moves to ONE task.
    The distributed form (operators/rank.grid_rank): bal_cents has a
    bounded value DOMAIN (the ±$10k cents grid, ~2M values regardless of
    row count), so the global rank is domain-table cumulative counts plus
    a within-value window partitioned by bal_cents, and the decile falls
    out of the exact ntile size formula (rank.ntile_from_rank). One
    corpus hash shuffle + a 10-group aggregate; oracle unchanged."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    ranked = grid_rank(
        cust, "bal_cents", ["c_custkey"], rank_col="__gr", total_col="__n"
    )
    return (
        ranked.withColumn(
            "decile", ntile_from_rank(F.col("__gr"), F.col("__n"), 10)
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("bal_cents").alias("sum_bal_cents"),
            F.min("bal_cents").alias("min_bal_cents"),
            F.max("bal_cents").alias("max_bal_cents"),
        )
    )


NTILE_SQL = """
SELECT decile, count(*) AS n,
       CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents,
       CAST(min(bal_cents) AS BIGINT) AS min_bal_cents,
       CAST(max(bal_cents) AS BIGINT) AS max_bal_cents
FROM (
  SELECT ntile(10) OVER (ORDER BY bal_cents, c_custkey) AS decile, bal_cents
  FROM (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
        FROM customer)
)
GROUP BY decile
"""


def q_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping planes, subtotal
    rows labeled 'ALL' (the columns are non-null by construction, so the
    coalesce labeling is unambiguous)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price_cents").alias("sum_price_cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "sum_price_cents",
        )
    )


CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_pivot_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order-priority counts per status. Spark side uses the real
    ``pivot()`` API with explicit values (explicit values = no extra
    distinct-collection job, a fixed output schema, and map-side partial
    aggregation — the at-scale form); oracle is the conditional-agg
    equivalent."""
    orders = load_table(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out_names = ["urgent", "high", "medium", "notspec", "low"]
    df = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    renamed = df.select(
        F.col("o_orderstatus").alias("status"),
        *[F.col(f"`{p}`").alias(n) for p, n in zip(prios, out_names)],
    )
    return renamed


PIVOT_SQL = """
SELECT o_orderstatus AS status,
       count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
       count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
       count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec,
       count(*) FILTER (o_orderpriority = '5-LOW') AS low
FROM orders
GROUP BY o_orderstatus
"""


def q_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag correlation and regression slope of extended price
    (whole dollars) against quantity, computed from exact integer
    Σ-statistics (n, Σx, Σy, Σx², Σy², Σxy) with ONE final double
    expression — the cross-engine-deterministic form of
    corr()/regr_slope()/stddev_samp(), whose native float accumulation is
    summation-order-dependent and therefore un-oracle-able bit-exactly.

    Scale: the Σ-statistics are algebraic partial aggregates (map-side
    combine), so this is one shuffle of 6 longs per group regardless of
    fact-table size."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    dxy = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    dxx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    dyy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        "l_returnflag",
        "n",
        # hash-stability: e6 integer micro-units (queries/__init__.e6)
        e6(dxy / F.sqrt(dxx * dyy), "corr_e6"),
        e6(dxy / dxx, "slope_e6"),
    )


STAT_SQL = """
SELECT l_returnflag, n,
       CAST(round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             / sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                    * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)) * 1e6) AS BIGINT)
           AS corr_e6,
       CAST(round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * 1e6) AS BIGINT)
           AS slope_e6
FROM (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
         CAST(sum(x*y) AS BIGINT) AS sxy
  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice) AS BIGINT) AS y
        FROM lineitem)
  GROUP BY l_returnflag
)
"""


def q_string_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: per nation, the sorted distinct market
    segments joined with ','. collect_set -> array_sort -> array_join makes
    the concat order deterministic (a bare collect_list is not)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
    )


STRAGG_SQL = """
SELECT c_nationkey AS nationkey, count(*) AS n_customers,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
FROM customer
GROUP BY c_nationkey
"""


def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing 30-day moving sum/count over event time with a
    RANGE frame (peers by value, not row position — the event-time dual of
    w_lag_delta's ROWS frame). Ordering column is integer microseconds, so
    the frame bound is exact on both engines."""
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts_us",
        F.round(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-US_30D, 0)
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("v_milli").over(w).alias("mov30_sum_milli"),
        F.count(F.lit(1)).over(w).alias("mov30_n"),
    )


RANGE_SQL = f"""
SELECT user_id, event_id, ts_us,
       CAST(sum(v_milli) OVER w AS BIGINT) AS mov30_sum_milli,
       count(*) OVER w AS mov30_n
FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(round(value*1000) AS BIGINT) AS v_milli
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {US_30D} PRECEDING AND CURRENT ROW)
"""


def skew_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 event-producing users via the salted two-phase aggregation
    (operators/skew.salted_group_count). The oracle is the plain GROUP BY —
    the salted plan must be *exactly* equivalent; salting only flattens the
    per-task load on power-law keys."""
    ev = load_events(spark, sf_dir)
    counts = salted_group_count(ev, "user_id", salt=16)
    return counts.orderBy(F.desc("n"), "user_id").limit(100)


SKEW_SQL = """
SELECT user_id, count(*) AS n
FROM events
GROUP BY user_id
ORDER BY n DESC, user_id
LIMIT 100
"""


def w_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-function surface in one query: dense_rank,
    percent_rank, cume_dist, and nth_value over a per-nation balance
    ordering (deterministic: ties broken by key). Top-3 per nation keeps
    the output small while every function still exercises ties."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("bal_cents"), F.asc("c_custkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        "c_custkey",
        "bal_cents",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w).alias("drank"),
        e6(F.percent_rank().over(w), "prank_e6"),
        e6(F.cume_dist().over(w), "cdist_e6"),
        F.nth_value("bal_cents", 2).over(wf).alias("second_bal_cents"),
    )
    return ranked.filter(F.col("rn") <= 3).drop("rn")


RANKF_SQL = """
SELECT nationkey, c_custkey, bal_cents, drank, prank_e6, cdist_e6, second_bal_cents
FROM (
  SELECT c_nationkey AS nationkey, c_custkey, bal_cents,
         row_number() OVER w AS rn,
         dense_rank() OVER w AS drank,
         CAST(round(percent_rank() OVER w * 1e6) AS BIGINT) AS prank_e6,
         CAST(round(cume_dist() OVER w * 1e6) AS BIGINT) AS cdist_e6,
         nth_value(bal_cents, 2) OVER (PARTITION BY c_nationkey
             ORDER BY bal_cents DESC, c_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_bal_cents
  FROM (SELECT c_nationkey, c_custkey,
               CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
        FROM customer)
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_cents DESC, c_custkey ASC)
)
WHERE rn <= 3
"""


def w_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active DAYS per user.
    island id = day - dense_rank(day) (constant within a consecutive run),
    then max run length per user. The classic streak/sessionation shape that
    needs two window passes and a double aggregation."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr("ts_us div 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (
        ev.withColumn("island", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
runs AS (
  SELECT user_id, day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
),
per_run AS (
  SELECT user_id, island, count(*) AS run_len FROM runs GROUP BY user_id, island
)
SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest_streak,
       count(*) AS n_streaks
FROM per_run GROUP BY user_id
"""


SPECS = [
    QuerySpec("w_ntile_deciles", w_ntile_deciles, NTILE_SQL,
              "NTILE decile bucketing over a deterministic total order"),
    QuerySpec("q_cube_grouping", q_cube_grouping, CUBE_SQL,
              "CUBE subtotal planes (§2.E generic surface)"),
    QuerySpec("q_pivot_priority", q_pivot_priority, PIVOT_SQL,
              "PIVOT with explicit values = fixed schema, no distinct job"),
    QuerySpec("q_stat_moments", q_stat_moments, STAT_SQL,
              "corr/regr_slope from exact integer sum-statistics"),
    QuerySpec("q_string_agg_segments", q_string_agg_segments, STRAGG_SQL,
              "ordered distinct string aggregation"),
    QuerySpec("w_range_frame", w_range_frame, RANGE_SQL,
              "RANGE event-time frame: trailing 30-day moving aggregate"),
    QuerySpec("skew_hot_users", skew_hot_users, SKEW_SQL,
              "salted two-phase aggregation == plain GROUP BY (skew surface)"),
    QuerySpec("w_rank_functions", w_rank_functions, RANKF_SQL,
              "dense_rank/percent_rank/cume_dist/nth_value surface"),
    QuerySpec("w_streaks", w_streaks, STREAKS_SQL,
              "gaps-and-islands longest consecutive-day streaks"),
]
