"""Unit tests for the vendored minimal protobuf runtime
(fink_filters_spark/vendor/protoshim) — the piece that lets Spark 4's
transformWithStateInPandas typed-state client run without the protobuf
wheel. The end-to-end proof is test_streaming.py::
test_streaming_object_stats_tws_matches_batch; these pin the wire codec."""

from __future__ import annotations

import pytest

from fink_filters_spark.vendor import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402
from fink_filters_spark.vendor.protoshim.google.protobuf._mini import (  # noqa: E402
    iter_records,
    read_varint,
    write_varint,
)


def test_varint_roundtrip_against_known_vectors():
    # canonical vectors from the protobuf encoding docs
    assert write_varint(1) == b"\x01"
    assert write_varint(150) == b"\x96\x01"
    assert write_varint(300) == b"\xac\x02"
    # negatives use 10-byte two's complement
    assert len(write_varint(-1)) == 10
    for v in [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**63)]:
        got, pos = read_varint(write_varint(v), 0)
        assert pos == len(write_varint(v))
        assert got == (v & ((1 << 64) - 1))


def test_known_serialization_bytes():
    """Field 1 varint=2, field 2 submessage — byte-exact against protoc
    output computed by hand from the encoding spec."""
    shs = sm.SetHandleState(state=sm.CREATED)
    call = sm.StatefulProcessorCall(setHandleState=shs)
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    # 08 02        field1(varint)=2
    # 12 04        field2(len)=4
    #   0a 02      field1(len)=2
    #     08 01    field1(varint)=1  (CREATED)
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")


def test_message_roundtrip_all_shapes():
    resp = sm.StateResponseWithListGet(
        statusCode=-7,
        errorMessage="boom é",
        value=[b"", b"xy"],
        requireNextFetch=True,
    )
    r = sm.StateResponseWithListGet()
    r.ParseFromString(resp.SerializeToString())
    assert r.statusCode == -7
    assert r.errorMessage == "boom é"
    assert list(r.value) == [b"", b"xy"]
    assert r.requireNextFetch is True

    kv = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
    )
    r2 = sm.StateResponseWithMapIterator()
    r2.ParseFromString(kv.SerializeToString())
    assert [(p.key, p.value) for p in r2.kvPair] == [(b"k1", b"v1"), (b"k2", b"v2")]

    lng = sm.StateResponseWithLongTypeVal(value=-5_000_000_000)
    r3 = sm.StateResponseWithLongTypeVal()
    r3.ParseFromString(lng.SerializeToString())
    assert r3.value == -5_000_000_000


def test_oneof_presence_semantics():
    """Set-but-empty oneof members must still hit the wire (the JVM server
    dispatches on which request variant is present)."""
    call = sm.ListStateCall(stateName="s", exists=sm.Exists())
    data = call.SerializeToString()
    r = sm.ListStateCall()
    r.ParseFromString(data)
    assert r.HasField("exists")
    assert not r.HasField("listStateGet")
    # empty submessage still encoded as (tag, len=0)
    assert bytes.fromhex("1200") in data


def test_defaults_and_unknown_fields():
    r = sm.StateResponse()
    assert r.statusCode == 0 and r.errorMessage == "" and r.value == b""
    # unknown field numbers are skipped, known ones still land
    payload = write_varint((99 << 3) | 0) + write_varint(5) + bytes.fromhex("0803")
    r.ParseFromString(payload)
    assert r.statusCode == 3
    with pytest.raises(AttributeError):
        sm.StateResponse(nonexistent=1)


def test_enum_constants_and_wrapper():
    assert sm.PRE_INIT == 0 and sm.CREATED == 1 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == 2
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"


def test_iter_records_fixed_width():
    # wire types 1 (64-bit) and 5 (32-bit) parse positionally
    data = bytes.fromhex("09" + "00" * 8 + "15" + "00" * 4)
    recs = list(iter_records(data))
    assert recs[0][0] == 1 and recs[0][1] == 1 and len(recs[0][2]) == 8
    assert recs[1][0] == 2 and recs[1][1] == 5 and len(recs[1][2]) == 4
