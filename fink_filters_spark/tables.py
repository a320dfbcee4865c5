"""Loaders for the synthetic test tables (see TESTDATA.md).

Numeric-parity conventions shared by every query and its DuckDB oracle —
the point is that Spark and DuckDB must produce BIT-IDENTICAL values, so all
order-sensitive float accumulation is replaced by exact integer arithmetic:

- money/measure columns are quantized to integer units before aggregation
  (``cents(col)`` = round(col*100) as bigint); integer sums are associative,
  so partial aggregation order cannot change the result;
- event timestamps: parquet TIMESTAMP(NANOS) -> long nanos (Spark) and the
  oracle uses ``epoch_us(ts)``; we expose microseconds (``ts div 1000``);
- final derived doubles are produced by a SINGLE deterministic expression
  tree over exact integers (casts below 2^53 are exact, IEEE ops on equal
  operands are bit-equal across engines), then defensively ``round(x, 6)``.

CAVEAT on the defensive round: ``round(x, 6)`` of a BIT-IDENTICAL double can
STILL differ across engines when x's shortest decimal repr lands exactly on
the half boundary — Spark rounds the shortest repr (BigDecimal.valueOf,
HALF_UP) while DuckDB rounds the binary value, so a double printing as
"0.0032135" but binarily below it rounds up in Spark and down in DuckDB
(observed once in ~60k rounded cells at sf0.1). Where a rounded MEAN of an
integer sum is emitted, make the tie decision in integer arithmetic instead:
``sign(s) * ((2*abs(s) + n) div (2*n))`` (see queries/similarity.py
centroid). The residual risk for other rounded outputs is ~1e-5 per cell and
only at boundaries; accept it for ratio-like outputs, but prefer integer
forms when the value is sum/count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import apply_dynamic_conf

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_dynamic_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scan_floor(df: DataFrame) -> DataFrame:
    """Guarded scan-parallelism floor: repartition ``df`` to the cluster's
    default parallelism ONLY when its scan plans fewer partitions — a
    single-row-group file scans as one task, serializing every expensive
    projection pipelined on it (quality scoring, vector math, hashing)
    on one core regardless of cluster size. A production table that
    already scans at or above the cluster's parallelism keeps its layout
    and pays nothing. Round-robin repartition here is deterministic
    (sortBeforeRepartition, on by default) and row-order-free consumers
    only."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def ts_us_expr(ts_type: str):
    """The ``ts`` -> microseconds-since-epoch expression, dispatched on the
    column's dtype string — THE single definition (load_events for batch,
    queries/streamq._events_stream for the file stream), so a new testdata
    physical type is fixed in one place for both surfaces."""
    if ts_type in ("bigint", "long"):
        # int64 nanoseconds since epoch. FLOOR division, not `div` alone:
        # div truncates toward zero, so a pre-epoch instant would land one
        # microsecond off the timestamp path's unix_micros (and DuckDB's
        # epoch_us), both of which floor. pmod-subtract keeps it exact in
        # int64 (a double division would round past 2^53 ns ~ 1970+104d).
        return F.expr("(ts - pmod(ts, 1000)) div 1000")
    # timestamp / timestamp_ntz: session tz is pinned to UTC, so the
    # cast-to-timestamp interprets naive values as UTC instants.
    return F.unix_micros(F.col("ts").cast("timestamp"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (bigint microseconds since epoch) added.

    Oracle equivalent of ``ts_us`` is ``epoch_us(ts)``. The physical type of
    ``ts`` has varied across testdata builds — INT64 TIMESTAMP(NANOS) (read
    as long via nanosAsLong) vs TIMESTAMP(MICROS) NTZ — so adapt by dtype.
    """
    df = load_table(spark, sf_dir, "events")
    ts_us = ts_us_expr(dict(df.dtypes)["ts"])
    return df.withColumn("ts_us", ts_us.cast("long"))


def cents(col):
    """Exact integer cents for a 2-decimal money column (parity helper)."""
    return F.round(F.col(col) * 100).cast("long")


def milli(col):
    """Exact integer milli-units (x1000) for a float measure column."""
    return F.round(F.col(col) * 1000).cast("long")
