"""Structured Streaming queries in the ORACLE-CHECKED surface (SURVEY §2.J).

The rest of §2.J is pytest-verified (``streaming/``, ``tests/test_streaming*``);
these seven entries run the REAL streaming machinery — file-stream source;
event-time tumbling, sliding, and session window aggregation; append-mode
watermark finalization; stateful ``dropDuplicates`` (including the chunk-hash dedup ledger); and a watermarked
stream-stream time-range self join — inside the driver's correctness gate: the collected memory-sink output hash-matches a
batch DuckDB oracle. Reference precedent: every fink filter runs under
``readStream`` in production (``fink_filters/tester.py`` drives them with
a streaming harness); here the streaming result itself is the checked value,
not a batch re-expression.

Determinism: the aggregation/distinct queries end in operators whose
results are independent of file-split order and trigger batching; the
stream-stream join additionally relies on the single-file gate source
(one micro-batch, see its docstring) — every entry's output is stable
row-set-wise (the driver's compare is order-insensitive).

Scale note (100 TB): the windowed agg carries partial state per
(window, key) group — bounded by key cardinality, not input rows; the
dedup carries one state-store entry per distinct key. Both are the
standard Spark state-store shapes; with a watermark (exercised in
``streaming/__init__.py``) the state is also bounded in event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..tables import load_table
from . import QuerySpec

US_PER_HOUR = 3_600_000_000


def _stream_dir(sf_dir: str, table: str = "events") -> str:
    """FileStreamSource requires a DIRECTORY source; the testdata tables are
    single files. Stage a per-sf symlink directory under /tmp (in production
    the stream watches the landing directory directly)."""
    import hashlib
    import os

    d = f"/tmp/fink_stream_src_{hashlib.md5((sf_dir + table).encode()).hexdigest()[:12]}"
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    # abspath: a RELATIVE sf_dir would be stored relative to the /tmp dir
    # and dangle (batch queries resolve against cwd, every streaming query
    # would silently read zero rows); lexists: a dangling link must be
    # re-staged, not crash os.symlink with FileExistsError
    target = os.path.abspath(os.path.join(sf_dir, f"{table}.parquet"))
    if not os.path.lexists(link):
        os.symlink(target, link)
    elif os.path.realpath(link) != os.path.realpath(target):
        os.remove(link)
        os.symlink(target, link)
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events table with ``ts_us`` normalized, matching
    ``tables.load_events`` (TIMESTAMP(NANOS)-as-long vs NTZ drift)."""
    from ..tables import ts_us_expr

    batch = load_table(spark, sf_dir, "events")  # also applies nanos conf
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_stream_dir(sf_dir))
    )
    ts_us = ts_us_expr(dict(batch.dtypes)["ts"])
    return stream.withColumn("ts_us", ts_us.cast("long"))


def _run_to_memory(
    out: DataFrame,
    name: str,
    mode: str,
    partitions: int = 8,
    no_data_batch: bool = True,
) -> None:
    """Run a bounded streaming query to a memory sink. State-store partition
    count is pinned low for these bounded gate runs (each of the N shuffle
    partitions opens its own state-store provider — pure fixed overhead at
    gate scale; a real deployment sizes it to key cardinality instead).

    ``no_data_batch=False`` skips the trailing empty micro-batch. That batch
    exists to advance the watermark so APPEND-mode aggregations can flush
    finalized windows (``stream_hourly_append`` requires it) and so join
    state can be evicted — but an INNER stream-stream join emits every
    result row during the data batch itself, so for a bounded availableNow
    run the no-data batch only re-commits all state stores and changes no
    output. Profiled round 9 (tools/stream_profile.py): the stream-stream
    join's no-data batch alone cost ~7s (one full commit cycle across
    partitions x 4 join state stores) with byte-identical results.

    Round 11 extends the same reasoning to every UNWATERMARKED query:
    a complete-mode aggregation re-emits its full state each batch
    regardless, and an unwatermarked ``dropDuplicates`` emits new keys
    during the data batch and can never evict — in both cases the no-data
    batch advances no watermark and changes no output; it only re-commits
    every state store once more. Only ``stream_hourly_append`` (the one
    query whose OUTPUT depends on the final watermark position) keeps it.

    The session confs are snapshotted and restored — no conf leak."""
    spark = out.sparkSession
    keys = {
        "spark.sql.shuffle.partitions": str(partitions),
        "spark.sql.streaming.noDataMicroBatches.enabled": str(no_data_batch).lower(),
    }
    before = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            # availableNow terminates on its own; the bound is a safety net
            # so a wedged stream can never hang the caller's gate
            if not q.awaitTermination(300):
                raise TimeoutError(f"streaming query {name} did not finish in 300s")
        finally:
            q.stop()
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)


def stream_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation under readStream: 1-hour
    ``F.window`` over the event timestamp, grouped with a derived key,
    complete-mode memory sink. The streaming dual of ``sess_hourly``."""
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.withColumn("evt", F.timestamp_micros(F.col("ts_us")))
        .withColumn("user_mod", F.col("user_id") % 10)
        .withColumn("v", F.round(F.col("value") * 1000).cast("long"))
        .groupBy(F.window("evt", "1 hour").alias("w"), F.col("user_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_start_us"),
            "user_mod",
            "n",
            "sum_v",
        )
    )
    _run_to_memory(
        out, "stream_hourly_stats_sink", "complete", no_data_batch=False
    )
    return spark.table("stream_hourly_stats_sink")


STREAM_HOURLY_SQL = f"""
SELECT (epoch_us(ts) // {US_PER_HOUR}) * {US_PER_HOUR} AS hour_start_us,
       user_id % 10 AS user_mod,
       count(*) AS n,
       CAST(sum(CAST(round(value*1000) AS BIGINT)) AS BIGINT) AS sum_v
FROM events
GROUP BY 1, 2
"""


def stream_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: ``dropDuplicates`` over a derived key with
    the HDFS-backed state store doing the cross-batch memory (one entry per
    distinct key), append-mode memory sink. Single-column rows, so the kept
    row is deterministic."""
    ev = _events_stream(spark, sf_dir)
    out = ev.select((F.col("user_id") % 100).alias("user_bucket")).dropDuplicates(
        ["user_bucket"]
    )
    _run_to_memory(
        out, "stream_distinct_keys_sink", "append", no_data_batch=False
    )
    return spark.table("stream_distinct_keys_sink")


STREAM_DISTINCT_SQL = "SELECT DISTINCT user_id % 100 AS user_bucket FROM events"


US_PER_30M = 1_800_000_000


def stream_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SLIDING-window aggregation under readStream: 1-hour
    windows every 30 minutes, so each event contributes to exactly two
    overlapping windows — the overlap semantics (trend smoothing, rate
    monitoring) a tumbling window cannot express. State is per
    (window, key) as usual, just 2x the tumbling cardinality; the oracle
    replays the window assignment arithmetic (start = each 30-min
    boundary in (ts - 1h, ts]) in batch SQL."""
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.withColumn("evt", F.timestamp_micros(F.col("ts_us")))
        .withColumn("user_mod", F.col("user_id") % 10)
        .withColumn("v", F.round(F.col("value") * 1000).cast("long"))
        .groupBy(
            F.window("evt", "1 hour", "30 minutes").alias("w"), F.col("user_mod")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "user_mod",
            "n",
            "sum_v",
        )
    )
    _run_to_memory(
        out, "stream_sliding_stats_sink", "complete", no_data_batch=False
    )
    return spark.table("stream_sliding_stats_sink")


STREAM_SLIDING_SQL = f"""
SELECT win_start_us, user_mod, count(*) AS n,
       CAST(sum(v) AS BIGINT) AS sum_v
FROM (
  SELECT unnest([
           (epoch_us(ts) // {US_PER_30M}) * {US_PER_30M},
           (epoch_us(ts) // {US_PER_30M}) * {US_PER_30M} - {US_PER_30M}
         ]) AS win_start_us,
         user_id % 10 AS user_mod,
         CAST(round(value*1000) AS BIGINT) AS v
  FROM events
)
GROUP BY win_start_us, user_mod
"""


def stream_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM self join under readStream: each event joins every
    LATER event of the same user within one hour — state lives on BOTH
    sides (each side buffers rows until the other side's watermark passes
    the join range), the capability that separates stream-stream joins
    from stream-static enrichment. Users are sampled (id % 10 == 0) so
    the pair set stays result-set-sized; the time-range predicate plus
    both watermarks lets Spark evict state instead of buffering the whole
    stream. Batch equality holds here because the gate source stages ONE
    file (see ``_stream_dir``), so all rows share a micro-batch and no
    watermark eviction can precede a late row; a production multi-file
    landing directory with out-of-order files keeps the same semantics
    only for rows inside the watermark delay — pairs older than the
    2-hour watermark are dropped, by design.

    Round-9 bench fix (VERDICT r8 'What's wrong #1'): per-batch profiling
    showed the 13.7s driver-bench number was state-store COMMIT overhead,
    not the join — a symmetric hash join opens 4 state stores per shuffle
    partition (left/right key-to-count + key-with-index-to-value), so 8
    partitions = 32 store commits per batch, plus a trailing no-data batch
    re-committing all 32 for zero output (inner joins emit during the data
    batch). Pinning 2 partitions (8 stores) and skipping the no-data batch
    cut the measured wall 8.5s -> 1.6s with identical output. At production
    scale the partition count is sized to key cardinality instead — the
    state per partition, not the store count, is then the binding cost."""
    ev = _events_stream(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    a = (
        ev.select(
            F.col("user_id").alias("ua"),
            F.timestamp_micros(F.col("ts_us")).alias("ta"),
        )
        .withWatermark("ta", "2 hours")
    )
    b = (
        ev.select(
            F.col("user_id").alias("ub"),
            F.timestamp_micros(F.col("ts_us")).alias("tb"),
        )
        .withWatermark("tb", "2 hours")
    )
    joined = a.join(
        b,
        (F.col("ua") == F.col("ub"))
        & (F.col("tb") > F.col("ta"))
        & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("ua").alias("user_id"),
        F.unix_micros("ta").alias("ts_a_us"),
        F.unix_micros("tb").alias("ts_b_us"),
    )
    _run_to_memory(
        joined, "stream_event_pairs_sink", "append", partitions=2, no_data_batch=False
    )
    return spark.table("stream_event_pairs_sink")


STREAM_PAIRS_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus FROM events WHERE user_id % 10 = 0
)
SELECT a.user_id AS user_id, a.tus AS ts_a_us, b.tus AS ts_b_us
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.tus > a.tus
 AND b.tus <= a.tus + {US_PER_HOUR}
"""


def stream_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SESSION windows under readStream: variable-length
    windows that grow while events keep arriving within a 30-minute gap —
    the state store merges overlapping session fragments per key (a
    dedicated stateful-operator path, unlike fixed windows). The batch
    dual is ``q_sessionize``; here the per-(user, session) rows
    themselves are the checked value, with the oracle replaying
    gaps-and-islands sessionization in SQL."""
    ev = _events_stream(spark, sf_dir).filter(F.col("user_id") % 10 == 0)
    out = (
        ev.withColumn("evt", F.timestamp_micros(F.col("ts_us")))
        .groupBy(F.session_window("evt", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.unix_micros(F.col("w.start")).alias("sess_start_us"),
            "n_events",
        )
    )
    _run_to_memory(
        out, "stream_session_stats_sink", "complete", no_data_batch=False
    )
    return spark.table("stream_session_stats_sink")


def _stream_session_sql() -> str:
    from .extras import sessionize_islands_cte

    return f"""
WITH {sessionize_islands_cte(where="WHERE user_id % 10 = 0")}
SELECT user_id, min(t) AS sess_start_us, count(*) AS n_events
FROM s
GROUP BY user_id, session_id
"""


def stream_hourly_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed aggregation with a real watermark: a window row
    is emitted exactly once, when the watermark (max event time seen minus
    the 1-hour delay) passes its end — the late-data finalization contract
    production pipelines rely on (complete mode re-emits everything;
    append emits finalized windows only). Windows still open at
    end-of-stream are NOT emitted, so the oracle replays the same cutoff:
    batch aggregation restricted to windows whose end <= max(ts) - delay.
    The trailing no-data micro-batch (on by default) is what lets the
    final watermark advance and flush the last finalized windows."""
    ev = _events_stream(spark, sf_dir)
    out = (
        ev.withColumn("evt", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("evt", "1 hour")
        .withColumn("user_mod", F.col("user_id") % 10)
        .groupBy(F.window("evt", "1 hour").alias("w"), F.col("user_mod"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_start_us"),
            "user_mod",
            "n",
        )
    )
    _run_to_memory(out, "stream_hourly_append_sink", "append")
    return spark.table("stream_hourly_append_sink")


STREAM_HOURLY_APPEND_SQL = f"""
WITH cutoff AS (SELECT max(epoch_us(ts)) - {US_PER_HOUR} AS wm FROM events)
SELECT (epoch_us(ts) // {US_PER_HOUR}) * {US_PER_HOUR} AS hour_start_us,
       user_id % 10 AS user_mod,
       count(*) AS n
FROM events, cutoff
GROUP BY 1, 2, cutoff.wm
HAVING hour_start_us + {US_PER_HOUR} <= cutoff.wm
"""



def stream_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion dedup at CHUNK granularity: the documents table
    arrives as a file stream, every micro-batch is content-defined-chunked
    by the same narrow kernel the batch pipeline uses
    (operators/chunking.chunk_cdc — HOFs only, fully stream-safe), and a
    stateful ``dropDuplicates`` on the chunk hash admits each distinct
    chunk exactly once across batches — the arrival-order-independent
    dedup ledger an incremental corpus build maintains. Emits the chunk
    hash only, so the append-mode output is set-deterministic regardless
    of file arrival order. State is one entry per distinct chunk
    (unwatermarked by design here: a corpus ledger never expires; a
    deployment bounding state would add a watermark on an ingest-time
    column)."""
    from ..operators.chunking import chunk_cdc

    batch = load_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_stream_dir(sf_dir, "documents"))
    )
    out = chunk_cdc(stream, "doc_id", "text").select("chunk_md5").dropDuplicates(
        ["chunk_md5"]
    )
    _run_to_memory(
        out, "stream_chunk_dedup_sink", "append", no_data_batch=False
    )
    return spark.table("stream_chunk_dedup_sink")


def _stream_chunk_sql() -> str:
    from .layout import CHUNK_CDC_SQL

    return f"SELECT DISTINCT chunk_md5 FROM ({CHUNK_CDC_SQL})"


SPECS = [
    QuerySpec(
        "stream_chunk_dedup",
        stream_chunk_dedup,
        _stream_chunk_sql(),
        "§2.J + LLM-pipeline: stateful chunk-hash dedup ledger under readStream",
    ),
    QuerySpec(
        "stream_hourly_stats",
        stream_hourly_stats,
        STREAM_HOURLY_SQL,
        "§2.J: real streaming windowed agg, memory sink vs batch oracle",
    ),
    QuerySpec(
        "stream_distinct_keys",
        stream_distinct_keys,
        STREAM_DISTINCT_SQL,
        "§2.J: real streaming stateful dedup vs batch DISTINCT oracle",
    ),
    QuerySpec(
        "stream_sliding_stats",
        stream_sliding_stats,
        STREAM_SLIDING_SQL,
        "§2.J: real streaming sliding-window agg (1h / 30min overlap)",
    ),
    QuerySpec(
        "stream_event_pairs",
        stream_event_pairs,
        STREAM_PAIRS_SQL,
        "§2.J: real stream-stream time-range self join vs batch oracle",
    ),
    QuerySpec(
        "stream_session_stats",
        stream_session_stats,
        _stream_session_sql(),
        "§2.J: real streaming session windows (merging state) vs islands oracle",
    ),
    QuerySpec(
        "stream_hourly_append",
        stream_hourly_append,
        STREAM_HOURLY_APPEND_SQL,
        "§2.J: append-mode watermark finalization vs cutoff-replay oracle",
    ),
]
