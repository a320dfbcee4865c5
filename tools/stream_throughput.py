"""Alert-stream throughput evidence: alerts/sec through the topic registry.

The reference is a stream filter library, so the domain-relevant headline is
filtering throughput. Two measurements over synthetic ZTF-shaped alerts
(tests/conftest.make_ztf_pdf schema, amplified JVM-side):

1. BATCH: every registered ZTF topic evaluated in ONE pass — a single
   select computing one boolean flag column per topic plus a global sum
   aggregation (forces every predicate). This is the broker's nightly
   "apply all topics" shape; because every predicate is a native Column
   expression the whole pass is one WholeStageCodegen over the scan.
2. STREAMING: file-source micro-batches through StreamPipeline with a
   representative topic (noop sink), availableNow trigger — end-to-end
   Structured Streaming wall-clock including micro-batch scheduling.

Writes THROUGHPUT.md. Run: python tools/stream_throughput.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

N_BASE = 100_000
AMPLIFY = 10  # JVM-side replication -> 1M alerts


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from conftest import make_ztf_pdf
    from fink_filters_spark.filters.registry import filter_catalog, get_filter
    from fink_filters_spark.session import get_session
    import fink_filters_spark.filters.ztf  # noqa: F401 (register topics)

    from fink_filters_spark.filters.classification import extract_fink_classification

    spark = get_session("throughput")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="alerts_tp_")
    pdf = make_ztf_pdf(N_BASE)
    # write through Spark so map columns keep their MapType
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{tmp}/alerts")

    base = spark.read.parquet(f"{tmp}/alerts")
    big = extract_fink_classification(
        base.withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))))
        .withColumn("candid", F.col("candid") * AMPLIFY + F.col("__k"))
        .drop("__k")
    )
    n_alerts = big.count()  # materializes parquet read path once (warm)

    ztf_topics = [i.name for i in filter_catalog() if i.survey == "ztf"]
    flags, kept = [], []
    for name in ztf_topics:
        try:
            c = get_filter(name).builder(big).cast("int").alias(name.replace(".", "_"))
            big.select(c).schema  # force analysis per topic
            flags.append(c)
            kept.append(name)
        except Exception:  # topics needing enrichments this frame lacks
            print(f"# skipped {name}", file=sys.stderr)
    agg = big.select(*flags).agg(
        *[F.sum(n.replace(".", "_")).alias(n) for n in kept]
    )

    best = first = None
    for i in range(3):
        t0 = time.perf_counter()
        counts = agg.collect()[0]
        dt = time.perf_counter() - t0
        first = dt if i == 0 else first
        best = dt if best is None else min(best, dt)
    batch_rate = n_alerts / best

    # Rubin: same one-codegen-pass measurement over the real flattened
    # packet layout (conftest.make_rubin_pdf mirrors
    # datatest/rubin_test_data_10_0.parquet column names incl. NaN holes)
    from conftest import make_rubin_pdf

    import fink_filters_spark.filters.rubin  # noqa: F401 (register topics)

    rpdf = make_rubin_pdf(N_BASE)
    spark.createDataFrame(rpdf).write.mode("overwrite").parquet(f"{tmp}/rubin")
    rbig = (
        spark.read.parquet(f"{tmp}/rubin")
        .withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))))
        .withColumn("diaSourceId", F.col("diaSourceId") * AMPLIFY + F.col("__k"))
        .drop("__k")
    )
    n_rubin = rbig.count()
    rubin_topics = [i.name for i in filter_catalog() if i.survey == "rubin"]
    rflags, rkept = [], []
    for name in rubin_topics:
        try:
            c = get_filter(name).builder(rbig).cast("int").alias(
                name.replace(".", "_")
            )
            rbig.select(c).schema
            rflags.append(c)
            rkept.append(name)
        except Exception:
            print(f"# skipped {name}", file=sys.stderr)
    ragg = rbig.select(*rflags).agg(
        *[F.sum(n.replace(".", "_")).alias(n) for n in rkept]
    )
    rbest = rfirst = None
    for i in range(3):
        t0 = time.perf_counter()
        ragg.collect()
        dt = time.perf_counter() - t0
        rfirst = dt if i == 0 else rfirst
        rbest = dt if rbest is None else min(rbest, dt)
    rubin_rate = n_rubin / rbest

    # streaming: 10 micro-batches via maxFilesPerTrigger (simple stable
    # types only for the file stream -> drop the map columns)
    big.drop("mangrove", "blazar_stats").repartition(10).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/stream_src")
    from fink_filters_spark.streaming import StreamPipeline

    schema = spark.read.parquet(f"{tmp}/stream_src").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/stream_src")
    )
    pipe = StreamPipeline(stream).topic("ztf.sn_candidates")
    t0 = time.perf_counter()
    q = pipe.start(checkpoint=f"{tmp}/ck", once=True)
    q.awaitTermination(600)
    stream_dt = time.perf_counter() - t0
    stream_rate = n_alerts / stream_dt

    # Kafka wire consume: alerts/sec through the kafka_lite DataSource —
    # RecordBatch v2 decode + JSON parse + one topic predicate, end to end
    # over loopback TCP (sources/kafka_wire.py). Smaller N: both endpoints
    # are pure Python by design (the contract under test is the wire).
    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.sinks.storage import kafka_encode
    from fink_filters_spark.sources import kafka_decode
    from fink_filters_spark.sources.kafka_wire import StubKafkaBroker, register

    n_kafka = N_BASE
    broker = StubKafkaBroker()
    wire_rows = kafka_encode(base, key_col="objectId").collect()
    for i, r in enumerate(wire_rows):
        broker.produce(
            "alerts", i % 8,
            r.key.encode() if r.key is not None else None,
            r.value.encode(), 1700000000000 + i,
        )
    register(spark)
    raw = (
        spark.read.format("kafka_lite")
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "alerts").load()
    )
    kdf = apply_named_filter(
        kafka_decode(raw, base.schema).select("alert.*"), "ztf.sn_candidates"
    )
    kbest = None
    for _ in range(3):
        t0 = time.perf_counter()
        kdf.count()
        dt = time.perf_counter() - t0
        kbest = dt if kbest is None else min(kbest, dt)
    kafka_rate = n_kafka / kbest
    broker.close()

    # Avro decode: alerts/sec through kafka_decode(value_format="avro") —
    # one-record object container files (the production ZTF message shape)
    # decoded executor-side by the pure-Python codec. Encode once to
    # parquet so the measurement isolates the DECODE path.
    import json as _json

    from fink_filters_spark.sources.avro_codec import encode_container

    avro_schema = _json.dumps({
        "type": "record", "name": "alert", "namespace": "ztf",
        "fields": [
            {"name": "objectId", "type": "string"},
            {"name": "candid", "type": "long"},
            {"name": "magpsf", "type": ["null", "double"]},
            {"name": "cdsxmatch", "type": "string"},
            {"name": "jd", "type": "double"},
        ],
    })

    def _enc(batches):
        import pandas as _pd

        for p in batches:
            yield _pd.DataFrame({
                "value": [
                    encode_container(
                        [{"objectId": o, "candid": int(c),
                          "magpsf": float(m), "cdsxmatch": x,
                          "jd": float(j)}],
                        avro_schema,
                    )
                    for o, c, m, x, j in zip(
                        p["objectId"], p["candid"], p["magpsf"],
                        p["cdsxmatch"], p["jd"],
                    )
                ]
            })

    base.select("objectId", "candid", "magpsf", "cdsxmatch", "jd").mapInPandas(
        _enc, "value binary"
    ).write.mode("overwrite").parquet(f"{tmp}/avro_msgs")
    amsgs = spark.read.parquet(f"{tmp}/avro_msgs")
    adf = kafka_decode(
        amsgs, value_format="avro", avro_schema=avro_schema
    ).select("alert.*").filter(F.col("cdsxmatch") == "SN candidate")
    abest = None
    for _ in range(3):
        t0 = time.perf_counter()
        adf.count()
        dt = time.perf_counter() - t0
        abest = dt if abest is None else min(abest, dt)
    avro_rate = N_BASE / abest

    n_selected = sum(v for v in counts.asDict().values() if v is not None)
    lines = [
        "# THROUGHPUT — alerts/sec through the topic registry",
        "",
        f"{n_alerts:,} synthetic ZTF-shaped + {n_rubin:,} Rubin-layout alerts"
        " (real flattened packet column names), local[32], min-of-3 (batch).",
        "",
        "| mode | topics | wall | alerts/sec |",
        "|---|---|---|---|",
        f"| batch, all ZTF topics in one codegen pass | {len(flags)} | {best:.2f}s"
        f" (cold {first:.2f}s) | {batch_rate:,.0f} |",
        f"| batch, all Rubin topics in one codegen pass | {len(rflags)} |"
        f" {rbest:.2f}s (cold {rfirst:.2f}s) | {rubin_rate:,.0f} |",
        f"| Structured Streaming, 10 micro-batches | 1 | {stream_dt:.2f}s |"
        f" {stream_rate:,.0f} |",
        f"| Kafka wire consume (kafka_lite: RecordBatch v2 + CRC32C +"
        f" JSON decode, {n_kafka:,} alerts, 8 partitions) | 1 |"
        f" {kbest:.2f}s | {kafka_rate:,.0f} |",
        f"| Avro decode (one-record object container files, pure-Python"
        f" codec in mapInPandas, {N_BASE:,} messages) | 1 |"
        f" {abest:.2f}s | {avro_rate:,.0f} |",
        "",
        f"The batch pass evaluates {len(flags)} topic predicates per alert"
        f" ({len(flags) * n_alerts:,} predicate evaluations; {n_selected:,}"
        " total selections) in one scan — native Column expressions keep"
        " every topic inside WholeStageCodegen, so adding topics costs"
        " almost nothing. The reference evaluates each topic as its own"
        " pandas-UDF pass with an Arrow hop per batch.",
        "",
        "The Kafka row measures the engine's PURE-PYTHON test transport"
        " (sources/kafka_wire.py — stub broker AND consumer both in"
        " Python; CRC32C is the lane-parallel numpy kernel): it exists to"
        " pin the wire contract, not to compete with the JVM"
        " spark-sql-kafka connector a production deployment swaps in"
        " (format name is the only change).",
    ]
    with open("THROUGHPUT.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[4:]))
    spark.stop()


if __name__ == "__main__":
    main()
