"""Sources (SURVEY §2.B B1-B5).

- Parquet/CSV batch + parquet file-stream readers (B1/B2).
- Catalog loader for the packaged reference catalogs (B2): loaded ONCE and
  marked broadcast — the reference re-reads its catalogs inside the pandas
  UDF on every micro-batch (``ztf/livestream/filter_early_kn_candidates/
  filter.py:70-77``), an anti-pattern this module exists to kill.
- Kafka stream source builder (the production alert transport of the
  broker this library serves).
- REST snapshot source (B3/B4/B5): remote lookups become periodically
  refreshed *tables* joined via broadcast, never per-row RPCs inside UDFs
  (SURVEY §2.B D5 note). The HTTP fetch itself is pluggable and stubbed in
  this offline environment.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def read_alerts(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """B1: batch parquet scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def stream_alerts(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """B1 (streaming): file-source stream — the test-friendly stand-in for
    the Kafka source; identical downstream plan."""
    return spark.readStream.schema(schema).parquet(path)


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka alert source: value is Avro/JSON payload; this builder assumes
    JSON (use spark-avro's from_avro for the production Avro payloads).

    ``maxOffsetsPerTrigger`` bounds micro-batch size — the back-pressure
    control that keeps 100 TB nights from producing unbounded batches.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return kafka_decode(raw, schema).select("alert.*", "kafka_timestamp")


def kafka_decode(raw: DataFrame, schema: StructType) -> DataFrame:
    """Parse the Kafka wire frame back to typed rows: ``value`` (JSON bytes
    or string) -> ``alert`` struct via ``from_json``, Kafka's ingest
    ``timestamp`` surfaced as ``kafka_timestamp`` when present. The inverse
    of ``sinks.storage.kafka_encode`` — their round trip is pinned
    broker-free by tests/test_streaming.py."""
    cols = [F.from_json(F.col("value").cast("string"), schema).alias("alert")]
    if "timestamp" in raw.columns:
        cols.append(F.col("timestamp").alias("kafka_timestamp"))
    return raw.select(*cols)


def load_catalog(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    **options,
) -> DataFrame:
    """B2: packaged reference catalog (csv/parquet/tsv/fwf), loaded once,
    cached, and broadcast-hinted for the crossmatch join."""
    if fmt == "csv":
        df = spark.read.options(header=True, inferSchema=True, **options).csv(path)
    elif fmt == "tsv":
        df = spark.read.options(
            header=True, inferSchema=True, sep="\t", **options
        ).csv(path)
    else:
        df = spark.read.options(**options).parquet(path)
    return F.broadcast(df.cache())


def rest_snapshot(
    spark: SparkSession,
    fetch: Callable[[], list[dict]],
    schema: StructType,
) -> DataFrame:
    """B3/B4/B5: materialize a REST-backed table (TNS, Fink portal, SNAD)
    as a broadcastable snapshot DataFrame.

    ``fetch`` runs on the DRIVER once per refresh — replacing the
    reference's per-row astroquery/requests calls inside executors
    (``ztf/livestream/filter_early_kn_candidates/filter.py:138-164``).
    In this offline environment pass a stub fetch.
    """
    rows = fetch()
    return F.broadcast(spark.createDataFrame(rows, schema).cache())


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """JSON-lines corpus reader (the interchange format of LLM-pipeline
    corpora). ALWAYS pass a schema in production: schema inference scans
    the whole input once before the real read — at 100 TB that is a full
    extra pass. Multiline JSON is deliberately unsupported (one doc per
    line keeps the format splittable, so a 1 GB file still fans out over
    HDFS-block-sized tasks)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSON-lines writer for corpus export. Gzip is fine for archive
    export; prefer parquet for anything Spark reads back (columnar pruning,
    predicate pushdown, and gzip json files are NOT splittable)."""
    df.write.mode("overwrite").option("compression", compression).json(path)
