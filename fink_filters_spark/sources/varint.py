"""Zigzag + LEB128 signed varint — the wire primitive BOTH Kafka record
framing (``kafka_wire``) and Avro binary encoding (``avro_codec``) use,
kept in one place so the truncation/length guards cannot drift apart.
No Spark imports: safe for executor-side kernels and plain unit tests.
"""

from __future__ import annotations

import io

__all__ = ["read_varint", "write_varint"]


def write_varint(n: int) -> bytes:
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint (input ended mid-value)")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1)
        shift += 7
        if shift > 70:
            raise ValueError("varint longer than 10 bytes (corrupt frame)")
