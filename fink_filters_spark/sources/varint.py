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
            # a 64-bit value occupies at most 10 LEB128 bytes; mask so a
            # corrupt frame with junk high bits in byte 10 decodes to the
            # same 64-bit value write_varint would have produced, never an
            # out-of-range Python int
            acc &= 0xFFFFFFFFFFFFFFFF
            return (acc >> 1) ^ -(acc & 1)
        shift += 7
        if shift >= 70:
            # shift 63 is the last byte that can carry payload bits; a
            # continuation bit on the 10th byte (shift -> 70) means an
            # 11th byte would follow, which no 64-bit value produces
            raise ValueError("varint longer than 10 bytes (corrupt frame)")
