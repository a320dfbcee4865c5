"""Kafka connector smoke over real wire bytes (VERDICT missing #3).

No broker and no spark-sql-kafka jar ship in this container, so the
livestream connector is exercised through the engine's own minimal
public-protocol implementation (sources/kafka_wire.py): RecordBatch v2
framing with CRC32C, Metadata/ListOffsets/Fetch over loopback TCP, and a
Spark Python DataSource ("kafka_lite") with the SAME output schema as the
JVM Kafka source. The byte-golden below fails if the framing drifts; the
e2e tests fail if the consume path (offsets, batching, decode) drifts.
"""

from __future__ import annotations

import pytest


def test_crc32c_rfc_vector_and_corruption_detection():
    from fink_filters_spark.sources.kafka_wire import (
        crc32c, decode_record_batches, encode_record_batch,
    )

    # RFC 3720 §B.4 check value — distinguishes Castagnoli from zlib CRC32
    assert crc32c(b"123456789") == 0xE3069283
    import zlib

    assert crc32c(b"123456789") != zlib.crc32(b"123456789")

    batch = bytearray(encode_record_batch(0, [(b"k", b"v", 1000)]))
    batch[-1] ^= 0x01  # flip a bit in the record payload
    with pytest.raises(ValueError, match="CRC32C"):
        decode_record_batches(bytes(batch))


# Pinned bytes of one RecordBatch v2: baseOffset=7, records
# [(b"key", b"value", 1690000000000), (None, b"w", 1690000000005)].
# Regenerating this hex is a CONSCIOUS act — it means the wire framing
# changed and real Kafka clients would disagree with the engine.
RECORD_BATCH_GOLDEN = (
    "000000000000000700000048000000000299520b95000000000001000001897b"
    "d98400000001897bd98405ffffffffffffffffffffffffffff000000021c0000"
    "00066b65790a76616c7565000e000a0201027700"
)


def test_record_batch_byte_golden():
    from fink_filters_spark.sources.kafka_wire import (
        decode_record_batches, encode_record_batch,
    )

    recs = [(b"key", b"value", 1690000000000), (None, b"w", 1690000000005)]
    enc = encode_record_batch(7, recs)
    assert enc.hex() == RECORD_BATCH_GOLDEN, enc.hex()
    assert decode_record_batches(enc) == [
        (7, b"key", b"value", 1690000000000),
        (8, None, b"w", 1690000000005),
    ]


def test_record_batch_null_fields_and_concatenation():
    from fink_filters_spark.sources.kafka_wire import (
        decode_record_batches, encode_record_batch,
    )

    b1 = encode_record_batch(0, [(None, None, 1), (b"", b"", 2)])
    b2 = encode_record_batch(2, [(b"k", b"v" * 1000, 3)])
    got = decode_record_batches(b1 + b2)
    assert got == [(0, None, None, 1), (1, b"", b"", 2),
                   (2, b"k", b"v" * 1000, 3)]


@pytest.fixture()
def broker():
    from fink_filters_spark.sources.kafka_wire import StubKafkaBroker

    br = StubKafkaBroker()
    yield br
    br.close()


def test_consumer_protocol_against_stub(broker):
    from fink_filters_spark.sources.kafka_wire import (
        EARLIEST, LATEST, MiniKafkaConsumer,
    )

    for p in (0, 1):
        for i in range(4):
            broker.produce("t", p, f"k{p}{i}".encode(), f"v{p}{i}".encode(),
                           1700000000000 + i)
    c = MiniKafkaConsumer(broker.host, broker.port)
    try:
        assert set(c.api_versions()) == {0, 1, 2, 3, 18}
        assert c.metadata("t") == [0, 1]
        assert c.list_offset("t", 0, EARLIEST) == 0
        assert c.list_offset("t", 1, LATEST) == 4
        recs = c.fetch("t", 1, 2)
        assert [(r[0], r[1]) for r in recs] == [(2, b"k12"), (3, b"k13")]
    finally:
        c.close()


def _produce_alerts(broker, topic: str, spark, rows, schema) -> None:
    """Seed the stub log with the engine's OWN egress frame
    (sinks.storage.kafka_encode: whole row as JSON value, string key) —
    the produce side of the round trip."""
    from fink_filters_spark.sinks.storage import kafka_encode

    df = spark.createDataFrame(rows, schema)
    wire = kafka_encode(df, key_col="objectId").collect()
    for i, r in enumerate(wire):
        broker.produce(
            topic, 0,
            r.key.encode() if r.key is not None else None,
            r.value.encode(),
            1700000000000 + i,
        )


_ALERT_SCHEMA = (
    "candid long, objectId string, cdsxmatch string, magpsf double"
)
_ALERTS = [
    (1, "ZTFa", "Unknown", 21.0),     # vetoed: known-SIMBAD Unknown
    (2, "ZTFb", "SN", 21.2),          # selected
    (3, "ZTFc", "SN", 19.0),          # vetoed: bright
    (4, "ZTFd", "Star", 20.9),        # selected
    (5, "ZTFe", "Galaxy_x", 22.0),    # vetoed: Galaxy prefix
]


def test_kafka_lite_batch_read_decode_filter(broker, spark):
    """Batch consume e2e: stub log -> wire Fetch -> kafka_lite DataFrame
    (JVM-source schema) -> kafka_decode -> registry topic filter. The
    expected survivors come from applying the same topic to the original
    rows directly — any drift in framing, offsets or decode breaks it."""
    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.sources import kafka_decode
    from fink_filters_spark.sources.kafka_wire import register

    _produce_alerts(broker, "ztf-alerts", spark, _ALERTS, _ALERT_SCHEMA)
    register(spark)
    raw = (
        spark.read.format("kafka_lite")
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "ztf-alerts")
        .load()
    )
    assert set(raw.columns) == {
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    }
    assert [r.offset for r in raw.orderBy("offset").collect()] == [0, 1, 2, 3, 4]

    from pyspark.sql.types import _parse_datatype_string

    alerts = kafka_decode(raw, _parse_datatype_string(_ALERT_SCHEMA)).select(
        "alert.*"
    )
    got = {r.objectId for r in
           apply_named_filter(alerts, "ztf.example").collect()}
    want = {r.objectId for r in
            apply_named_filter(
                spark.createDataFrame(_ALERTS, _ALERT_SCHEMA),
                "ztf.example").collect()}
    assert got == want == {"ZTFb", "ZTFd"}


def test_kafka_lite_streaming_topic_roundtrip(broker, spark, tmp_path):
    """Streaming consume e2e with checkpoint recovery: readStream over the
    wire -> decode -> topic filter -> foreachBatch sink; a SECOND run
    from the same checkpoint delivers ONLY the alerts produced in
    between (per-partition offset tracking, no re-delivery)."""
    from pyspark.sql.types import _parse_datatype_string

    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.sources import kafka_decode
    from fink_filters_spark.sources.kafka_wire import register

    register(spark)
    _produce_alerts(broker, "live", spark, _ALERTS, _ALERT_SCHEMA)

    got: list[str] = []

    def run_once() -> None:
        raw = (
            spark.readStream.format("kafka_lite")
            .option("host", broker.host).option("port", broker.port)
            .option("topic", "live")
            .load()
        )
        alerts = kafka_decode(
            raw, _parse_datatype_string(_ALERT_SCHEMA)
        ).select("alert.*")
        selected = apply_named_filter(alerts, "ztf.example")
        q = (
            selected.writeStream
            .foreachBatch(lambda bdf, bid: got.extend(
                r.objectId for r in bdf.select("objectId").collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(got) == ["ZTFb", "ZTFd"]

    # produce two more (one passing) and resume from the checkpoint
    _produce_alerts(
        broker, "live", spark,
        [(6, "ZTFf", "SN", 20.8), (7, "ZTFg", "Unknown", 21.0)],
        _ALERT_SCHEMA,
    )
    got.clear()
    run_once()
    assert got == ["ZTFf"]  # only the NEW qualifying alert; no re-delivery


def test_produce_api_and_full_livestream_loop(broker, spark, tmp_path):
    """The COMPLETE livestream loop over wire bytes: produce alerts into an
    IN topic (Produce v3 — the broker CRC-verifies the shipped
    RecordBatch), readStream them back (kafka_lite), apply a registry
    topic, and publish survivors to an OUT topic via kafka_lite_writer
    (executor-side per-partition producers). Consuming OUT must yield
    exactly the topic's survivors, value-parseable back to alerts."""
    import json

    from pyspark.sql.types import _parse_datatype_string

    from fink_filters_spark.filters.registry import apply_named_filter
    from fink_filters_spark.sources import kafka_decode
    from fink_filters_spark.sources.kafka_wire import (
        EARLIEST, MiniKafkaConsumer, MiniKafkaProducer, kafka_lite_writer,
        register,
    )

    register(spark)
    # produce the IN topic THROUGH the wire (not server-side seeding)
    from fink_filters_spark.sinks.storage import kafka_encode

    wire_rows = kafka_encode(
        spark.createDataFrame(_ALERTS, _ALERT_SCHEMA), key_col="objectId"
    ).collect()
    prod = MiniKafkaProducer(broker.host, broker.port)
    try:
        base = prod.send("in", 0, [
            (r.key.encode(), r.value.encode(), 1700000000000 + i)
            for i, r in enumerate(wire_rows)
        ])
    finally:
        prod.close()
    assert base == 0

    raw = (
        spark.readStream.format("kafka_lite")
        .option("host", broker.host).option("port", broker.port)
        .option("topic", "in")
        .load()
    )
    alerts = kafka_decode(raw, _parse_datatype_string(_ALERT_SCHEMA)).select(
        "alert.*"
    )
    selected = apply_named_filter(alerts, "ztf.example")
    q = kafka_lite_writer(
        selected, broker.host, broker.port, "out",
        checkpoint=str(tmp_path / "ck_loop"), key_col="objectId",
    )
    q.awaitTermination(120)

    c = MiniKafkaConsumer(broker.host, broker.port)
    try:
        out = c.fetch("out", 0, c.list_offset("out", 0, EARLIEST))
    finally:
        c.close()
    got = {json.loads(v.decode())["objectId"] for (_o, _k, v, _t) in out}
    keys = {k.decode() for (_o, k, _v, _t) in out}
    assert got == keys == {"ZTFb", "ZTFd"}


def test_crc32c_vectorized_matches_scalar_reference():
    """The lane-parallel numpy CRC (used for MB-size RecordBatches) must be
    bit-identical to the byte-at-a-time reference at every size class:
    below/at/above the dispatch threshold, lane boundaries, remainders."""
    import random

    from fink_filters_spark.sources.kafka_wire import (
        _crc32c_numpy, crc32c, crc32c_scalar,
    )

    rng = random.Random(23)
    sizes = [0, 1, 255, 256, 257, 2047, 2048, 2049, 4096, 65537,
             rng.randrange(100_000, 300_000)]
    for n in sizes:
        data = rng.randbytes(n)
        want = crc32c_scalar(data)
        assert crc32c(data) == want, n
        if n >= 2048:
            assert _crc32c_numpy(data) == want, n


def test_max_records_per_trigger_bounds_micro_batches(broker, spark, tmp_path):
    """The backpressure knob (the JVM source's maxOffsetsPerTrigger): with
    a backlog of 5 alerts and maxRecordsPerTrigger=2, each run from the
    shared checkpoint takes AT MOST 2 rows (the Python
    SimpleDataSourceStreamReader prefetches one window per availableNow
    run), so the backlog drains 2+2+1 across three runs — every offset
    exactly once, in order, surviving restarts."""
    from fink_filters_spark.sources.kafka_wire import register

    register(spark)
    _produce_alerts(broker, "paced", spark, _ALERTS, _ALERT_SCHEMA)

    batches: list[list[int]] = []

    def run_once() -> None:
        raw = (
            spark.readStream.format("kafka_lite")
            .option("host", broker.host).option("port", broker.port)
            .option("topic", "paced")
            .option("maxRecordsPerTrigger", "2")
            .load()
        )
        q = (
            raw.writeStream
            .foreachBatch(lambda bdf, bid: batches.append(
                sorted(r.offset for r in bdf.select("offset").collect())))
            .option("checkpointLocation", str(tmp_path / "ck_paced"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for _ in range(3):
        run_once()
    nonempty = [b for b in batches if b]
    assert all(len(b) <= 2 for b in nonempty), nonempty
    assert [o for b in nonempty for o in b] == [0, 1, 2, 3, 4]


def test_murmur2_partitioner_properties_and_pins():
    """murmur2 follows Kafka's published DefaultPartitioner algorithm
    (seed 0x9747b28c, LE 4-byte mixing, 3/2/1 tail, 13/15 avalanche).
    Structural checks plus pinned values guarding the implementation
    against silent drift; partition_for_key maps keys deterministically
    into range and null keys to the caller's round-robin fallback."""
    from fink_filters_spark.sources.kafka_wire import (
        murmur2, partition_for_key,
    )

    # deterministic, 32-bit domain, tail-length sensitive
    for data in [b"", b"a", b"ab", b"abc", b"abcd", b"abcde", b"x" * 1000]:
        h = murmur2(data)
        assert 0 <= h < 2**32
        assert h == murmur2(data)
    assert len({murmur2(bytes([i])) for i in range(256)}) == 256
    # Kafka's own published reference vectors (UtilsTest#testMurmur2,
    # signed int32 domain) — any constant drift breaks these
    def signed(h: int) -> int:
        return h - (1 << 32) if h >= (1 << 31) else h

    assert signed(murmur2(b"21")) == -973932308
    assert signed(murmur2(b"foobar")) == -790332482
    assert signed(murmur2(b"abc")) == 479470107
    # placement: in range, stable, null -> fallback
    for n in (1, 3, 8):
        for key in (b"ZTF25aaa", b"ZTF25aab", b"k"):
            assert 0 <= partition_for_key(key, n) < n
    assert partition_for_key(None, 4, fallback=6) == 2
    assert partition_for_key(b"k", 1) == 0


def test_writer_scatters_by_key_hash_across_partitions(broker, spark, tmp_path):
    """ADVICE r8: the writer must place records like the JVM sink's
    DefaultPartitioner, not all on partition 0. Pre-create 3 partitions,
    write keyed records through kafka_lite_writer, and check every record
    landed on exactly murmur2(key) % 3."""
    from fink_filters_spark.sources.kafka_wire import (
        EARLIEST, MiniKafkaConsumer, kafka_lite_writer, partition_for_key,
        register,
    )

    register(spark)
    for tp in (0, 1, 2):  # pre-create the partitions broker-side
        broker.produce("scatter-out", tp, b"seed", None, 0)

    src_dir = tmp_path / "scatter_src"
    keys = [f"ZTF25a{i:05d}" for i in range(20)]
    spark.createDataFrame(
        [(k, float(i)) for i, k in enumerate(keys)], "objectId string, v double"
    ).write.parquet(str(src_dir))
    stream = spark.readStream.schema("objectId string, v double").parquet(
        str(src_dir)
    )
    q = kafka_lite_writer(
        stream, broker.host, broker.port, "scatter-out",
        checkpoint=str(tmp_path / "ck_scatter"), key_col="objectId",
    )
    q.awaitTermination(120)

    c = MiniKafkaConsumer(broker.host, broker.port)
    try:
        placed = {}
        for tp in (0, 1, 2):
            for off, key, value, _ts in c.fetch(
                "scatter-out", tp, c.list_offset("scatter-out", tp, EARLIEST)
            ):
                if value is None:  # the seed rows
                    continue
                placed[key.decode()] = tp
    finally:
        c.close()
    assert set(placed) == set(keys)
    for k, tp in placed.items():
        assert tp == partition_for_key(k.encode(), 3), (k, tp)
    # actually scattered (20 murmur2-hashed keys never all collide)
    assert len(set(placed.values())) > 1


def test_stream_reader_discovers_new_partitions(broker, spark, tmp_path):
    """ADVICE r8: a partition added AFTER the stream starts must be seeded
    at EARLIEST and consumed, like the JVM source's per-batch discovery."""
    from fink_filters_spark.sources.kafka_wire import register

    register(spark)
    broker.produce("growing", 0, b"k0", b"v0", 1_700_000_000_000)

    got: list[tuple[int, int]] = []

    def run_once() -> None:
        raw = (
            spark.readStream.format("kafka_lite")
            .option("host", broker.host).option("port", broker.port)
            .option("topic", "growing")
            .load()
        )
        q = (
            raw.writeStream
            .foreachBatch(lambda bdf, bid: got.extend(
                (r.partition, r.offset)
                for r in bdf.select("partition", "offset").collect()))
            .option("checkpointLocation", str(tmp_path / "ck_grow"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert got == [(0, 0)]
    # partition 1 appears between runs; the checkpointed offsets know
    # nothing about it — discovery must seed it at EARLIEST
    broker.produce("growing", 1, b"k1", b"v1", 1_700_000_000_001)
    broker.produce("growing", 0, b"k2", b"v2", 1_700_000_000_002)
    run_once()
    assert sorted(got) == [(0, 0), (0, 1), (1, 0)]


def test_truncated_varint_and_closed_connection_errors(broker):
    """ADVICE r8: protocol-edge failures surface as typed errors, not
    IndexError/TypeError."""
    import io

    import pytest

    from fink_filters_spark.sources.kafka_wire import (
        MiniKafkaConsumer, read_varint, write_varint,
    )

    with pytest.raises(ValueError, match="truncated varint"):
        read_varint(io.BytesIO(b"\x80"))  # continuation bit, no next byte
    with pytest.raises(ValueError, match="truncated varint"):
        read_varint(io.BytesIO(b""))
    assert read_varint(io.BytesIO(write_varint(-12345))) == -12345

    c = MiniKafkaConsumer(broker.host, broker.port)
    broker.close()  # broker gone mid-conversation
    try:
        with pytest.raises((ConnectionError, OSError)):
            c.metadata("any-topic")
    finally:
        c.close()
    # (broker fixture is function-scoped; double-close in teardown is a no-op)


def test_kafka_timestamps_tz_aware_any_session_zone(spark):
    """ADVICE r8: _to_row must hand Spark a tz-AWARE datetime so a
    non-UTC session does not shift Kafka timestamps."""
    import datetime

    from fink_filters_spark.sources.kafka_wire import (
        KAFKA_SCHEMA, StubKafkaBroker, _to_row, register,
    )

    row = _to_row("t", 0, (0, None, b"v", 1_700_000_000_000))
    assert row[5].tzinfo is not None  # aware

    br = StubKafkaBroker()
    try:
        register(spark)
        br.produce("tztopic", 0, b"k", b"v", 1_700_000_000_000)
        before = spark.conf.get("spark.sql.session.timeZone")
        try:
            spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
            ts = (
                spark.read.format("kafka_lite")
                .option("host", br.host).option("port", br.port)
                .option("topic", "tztopic")
                .load()
                .selectExpr("unix_millis(timestamp) AS ms")
                .collect()[0]["ms"]
            )
            assert ts == 1_700_000_000_000
        finally:
            spark.conf.set("spark.sql.session.timeZone", before)
    finally:
        br.close()


def test_replay_includes_partitions_discovered_mid_stream(broker):
    """Crash-recovery contract: readBetweenOffsets must deliver the SAME
    window read() returned — including a partition that was first
    discovered (and seeded at EARLIEST) during that batch, which the
    committed start offsets know nothing about."""
    from pyspark.sql.types import _parse_datatype_string

    from fink_filters_spark.sources.kafka_wire import (
        KAFKA_SCHEMA, KafkaLiteStreamReader,
    )

    broker.produce("replay", 0, b"k0", b"v0", 1_700_000_000_000)
    reader = KafkaLiteStreamReader(
        _parse_datatype_string(KAFKA_SCHEMA),
        {"host": broker.host, "port": str(broker.port), "topic": "replay"},
    )
    start = reader.initialOffset()
    assert set(start) == {"0"}
    # partition 1 appears AFTER the stream committed `start`
    broker.produce("replay", 1, b"k1", b"v1", 1_700_000_000_001)
    rows, end = reader.read(start)
    live = sorted((r[3], r[4]) for r in rows)  # (partition, offset)
    assert live == [(0, 0), (1, 0)] and set(end) == {"0", "1"}
    # the replay of that exact window (start WITHOUT p1, end WITH it)
    replayed = sorted(
        (r[3], r[4]) for r in reader.readBetweenOffsets(start, end)
    )
    assert replayed == live
