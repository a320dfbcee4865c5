"""Data sinks: partitioned / bucketed storage writers.

The reference writes nothing itself (the broker owns storage), but a
complete engine needs the storage layout story, because at 100 TB the write
layout IS the read performance:

- ``write_partitioned`` — nightly/hourly directory partitioning: partition
  pruning turns "last night's alerts" into a targeted scan (SURVEY §4
  'partition pruning' row). Also compacts to a bounded file count per
  partition so a 1000-executor read isn't a small-file storm.
- ``write_bucketed`` — pre-shuffled, co-located layout on a join/group key:
  repeated equi-joins and aggregations on the bucket key skip their shuffle
  entirely (SortMergeJoin without Exchange). The right call for tables
  joined every night on the same key (objectId, orderkey, ...).
- ``kafka_writer`` — streaming egress to the broker's downstream topics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols``, compacted to at most
    ``files_per_partition`` files per partition (repartition on the
    partition key so each task writes whole partitions, not slivers)."""
    (
        df.repartition(files_per_partition, *[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) table (external when
    ``path`` is given, else managed in the warehouse).

    Readers joining/grouping on ``bucket_col`` with a co-bucketed table get
    shuffle-free plans; sorting within buckets additionally removes the sort
    of a SortMergeJoin.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Range-cluster on ``cluster_col`` before writing: repartitionByRange
    gives each output file a disjoint value range, and the within-file sort
    tightens every parquet row-group's min/max stats — so a range predicate
    on the cluster column (jd window, time slice, id range) skips whole
    files and row groups at scan time instead of filtering rows.

    This is the single-column form of data clustering (what Z-ordering
    generalizes to multi-column); for the time-windowed reads this engine
    serves (per-night slices, as-of lookups), one range key is the layout
    that matters.
    """
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode(mode)
        .parquet(path)
    )


def kafka_encode(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """The Kafka wire frame: every row serialized to a JSON ``value``
    (the whole row as one struct) with an optional string ``key`` — exactly
    what the kafka format sink consumes. Split out of ``kafka_writer`` so
    the encoding is testable broker-free: round-tripping through
    ``sources.kafka_decode`` with the source schema must reproduce the
    rows (pinned by tests/test_streaming.py)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    cols = [payload]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def kafka_writer(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
):
    """Streaming egress: selected alerts -> JSON -> Kafka topic (the broker's
    per-topic output streams). Returns the started StreamingQuery.
    Requires the spark-sql-kafka package at runtime (not in this container).
    """
    return (
        kafka_encode(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def zorder_key(x, y, x_min: float, x_max: float, y_min: float, y_max: float,
               bits: int = 12):
    """Native Z-order (Morton) key for two numeric columns: each value is
    quantized to ``bits`` bits over its [min, max) range, then the bits are
    interleaved. Pure integer Column arithmetic — no UDF — so the key
    computation rides inside codegen on a 100 TB rewrite.

    12 bits/dim = 4096 cells/dim = 16M Z-cells: finer than any realistic
    file count, coarse enough that the bit-interleave expression stays
    small (24 shift-or terms).
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    n = F.lit(1 << bits)
    qx = F.least(
        F.lit((1 << bits) - 1),
        F.floor((xc - x_min) / (x_max - x_min) * n),
    ).cast("long")
    qy = F.least(
        F.lit((1 << bits) - 1),
        F.floor((yc - y_min) / (y_max - y_min) * n),
    ).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    n_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional clustering: range-partition + sort on the Z-order key
    so every output file covers a compact rectangle-ish region of (x, y) —
    footer min/max stats become selective on BOTH columns at once, and a
    box predicate (the sky-region scan of SURVEY §2.D, a (user, time) slice)
    skips most files. The 1-D ``write_clustered`` cannot do this: sorting
    by x alone leaves each file's y-range spanning the whole domain.
    """
    zk = zorder_key(x, y, x_range[0], x_range[1], y_range[0], y_range[1], bits)
    (
        df.withColumn("__z", zk)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    n_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """``write_zordered``'s locality-preserving sibling: quantize (x, y)
    to the same ``bits``-per-dim grid, key by the HILBERT index
    (``operators.chunking.hilbert_index`` — chained codegen projections),
    then range-partition + sort. Consecutive Hilbert cells are always
    grid neighbors, so the range-partition boundaries — which fall at
    arbitrary (unaligned) key values — cut tighter per-file bounding
    boxes than the Z curve's bit-boundary jumps allow; the measured
    claim is pinned in tests (test_chunking / test_sinks_storage).
    Prefer this writer when files per dataset ≫ aligned power-of-4
    bucket counts; keep Z-order when key-computation cost matters more
    than box tightness (2·bits shift-adds vs bits chained projections).
    """
    from ..operators.chunking import hilbert_index

    xc, yc = F.col(x), F.col(y)
    n = F.lit(1 << bits)
    qx = F.least(
        F.lit((1 << bits) - 1),
        F.floor((xc - x_range[0]) / (x_range[1] - x_range[0]) * n),
    ).cast("long")
    qy = F.least(
        F.lit((1 << bits) - 1),
        F.floor((yc - y_range[0]) / (y_range[1] - y_range[0]) * n),
    ).cast("long")
    keyed = hilbert_index(
        df.withColumn("__qx", qx).withColumn("__qy", qy),
        "__qx", "__qy", bits, out="__h",
    )
    (
        keyed.repartitionByRange(n_files, F.col("__h"))
        .sortWithinPartitions("__h")
        .drop("__qx", "__qy", "__h")
        .write.mode(mode)
        .parquet(path)
    )


def compact_partitions(
    spark,
    path: str,
    partition_cols: list[str],
    out_path: str,
    max_records_per_file: int = 1_000_000,
    partition_filter=None,
) -> None:
    """Small-file compaction for a partitioned parquet dataset — the
    maintenance pass every long-running ingest needs at scale (streaming
    micro-batches and nightly appends leave thousands of sliver files;
    a 1000-executor read then pays a task per sliver).

    One distributed job: read, optionally prune to the partitions being
    compacted (``partition_filter`` is a Column — partition pruning keeps
    untouched partitions unread), repartition on the partition key so each
    task writes whole partitions, and rewrite with ``maxRecordsPerFile``
    bounding file size. Writing to ``out_path`` + swap keeps the pass
    crash-safe (compaction is a rewrite, not an in-place mutation; an
    atomic swap is the caller's rename).
    """
    df = spark.read.parquet(path)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(out_path)
    )
