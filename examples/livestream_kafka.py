"""Livestream over Kafka, end to end and fully offline.

Run: python examples/livestream_kafka.py

The production shape is `spark.readStream.format("kafka")` against the
survey broker; this container has neither a broker nor the JVM connector
jar, so the example runs the SAME pipeline over the engine's wire-protocol
test transport (sources/kafka_wire.py): an in-process stub broker speaking
real RecordBatch v2 / Metadata / ListOffsets / Fetch / Produce bytes, and
the `kafka_lite` DataSource exposing the JVM source's schema. Swapping in
a real cluster changes ONLY the format name and options.

Flow: produce alerts into `ztf-in` THROUGH the wire -> readStream ->
kafka_decode -> registry topic `ztf.example` -> publish survivors to
`ztf-out` (executor-side per-partition producers) -> consume `ztf-out`
back and print.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    from pyspark.sql.types import _parse_datatype_string

    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.session import get_session
    from fink_filters_spark.sinks.storage import kafka_encode
    from fink_filters_spark.sources import kafka_decode
    from fink_filters_spark.sources.kafka_wire import (
        EARLIEST,
        MiniKafkaConsumer,
        MiniKafkaProducer,
        StubKafkaBroker,
        kafka_lite_writer,
        register,
    )

    spark = get_session("livestream-kafka-example")
    register(spark)
    broker = StubKafkaBroker()
    print(f"stub broker on {broker.host}:{broker.port}")

    schema_ddl = "candid long, objectId string, cdsxmatch string, magpsf double"
    alerts = [
        (1, "ZTF25aaa", "Unknown", 21.0),
        (2, "ZTF25aab", "SN", 21.2),
        (3, "ZTF25aac", "SN", 19.0),
        (4, "ZTF25aad", "Star", 20.9),
        (5, "ZTF25aae", "Galaxy_x", 22.0),
    ]
    wire = kafka_encode(
        spark.createDataFrame(alerts, schema_ddl), key_col="objectId"
    ).collect()
    producer = MiniKafkaProducer(broker.host, broker.port)
    producer.send(
        "ztf-in", 0,
        [(r.key.encode(), r.value.encode(), 1_700_000_000_000 + i)
         for i, r in enumerate(wire)],
    )
    producer.close()
    print(f"produced {len(wire)} alerts to ztf-in")

    raw = (
        spark.readStream.format("kafka_lite")
        .option("host", broker.host)
        .option("port", broker.port)
        .option("topic", "ztf-in")
        .load()
    )
    decoded = kafka_decode(raw, _parse_datatype_string(schema_ddl)).select(
        "alert.*"
    )
    selected = apply_named_filter(decoded, "ztf.example")
    with tempfile.TemporaryDirectory(prefix="ck_kafka_") as ck:
        q = kafka_lite_writer(
            selected, broker.host, broker.port, "ztf-out",
            checkpoint=ck, key_col="objectId",
        )
        q.awaitTermination(120)

    consumer = MiniKafkaConsumer(broker.host, broker.port)
    out = consumer.fetch("ztf-out", 0, consumer.list_offset("ztf-out", 0, EARLIEST))
    consumer.close()
    print(f"ztf-out holds {len(out)} selected alerts:")
    for offset, key, value, _ts in out:
        print(f"  offset {offset}  key={key.decode()}  "
              f"magpsf={json.loads(value.decode())['magpsf']}")

    # ---- Avro leg: the PRODUCTION payload shape ---------------------------
    # A real ZTF Kafka message value is an Avro object container file (the
    # writer schema rides in every message). The engine's pure-Python codec
    # (sources/avro_codec.py) decodes it executor-side; on a cluster with
    # the spark-avro jar, from_avro is the drop-in JVM equivalent.
    from pyspark.sql import functions as F

    from fink_filters_spark.sources.avro_codec import encode_container

    avro_schema = json.dumps({
        "type": "record", "name": "alert", "namespace": "ztf",
        "fields": [
            {"name": "objectId", "type": "string"},
            {"name": "candid", "type": "long"},
            {"name": "candidate", "type": {
                "type": "record", "name": "candidate", "fields": [
                    {"name": "magpsf", "type": ["null", "float"]},
                    {"name": "cdsxmatch", "type": "string"},
                ]}},
        ],
    })
    producer = MiniKafkaProducer(broker.host, broker.port)
    producer.send(
        "ztf-avro", 0,
        [(oid.encode(),
          encode_container(
              [{"objectId": oid, "candid": c,
                "candidate": {"magpsf": m, "cdsxmatch": x}}],
              avro_schema),
          1_700_000_000_000 + c)
         for c, oid, x, m in alerts],
    )
    producer.close()
    raw_avro = (
        spark.readStream.format("kafka_lite")
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "ztf-avro")
        .option("startingOffsets", "earliest")
        .load()
    )
    sn = kafka_decode(
        raw_avro, value_format="avro", avro_schema=avro_schema
    ).select("alert.*").filter(F.col("candidate.cdsxmatch") == "SN")
    with tempfile.TemporaryDirectory(prefix="ck_avro_") as ck:
        q = (sn.writeStream.format("memory").queryName("avro_sn")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
    got = spark.table("avro_sn").collect()
    print(f"avro leg: {len(got)} SN alerts decoded from container payloads:")
    for r in got:
        print(f"  {r.objectId}  magpsf={r.candidate.magpsf}")

    broker.close()
    spark.stop()


if __name__ == "__main__":
    main()
