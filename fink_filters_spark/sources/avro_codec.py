"""Pure-Python Avro binary codec + Spark decode integration.

Production alert streams are Avro-encoded: every ZTF Kafka message value
is a full Avro OBJECT CONTAINER FILE (magic ``Obj\\x01``, embedded writer
schema, one alert record per message), and the reference depends on the
``spark-avro`` package to consume them (``fink_filters/tester.py:50-76``
— ``--packages org.apache.spark:spark-avro_...``). That jar is absent in
this container, so — following the repo's xgb_ubj/FITS precedent of
schema-driven pure-Python decoders for binary formats — this module
implements the Avro 1.11 BINARY ENCODING from the public specification
(https://avro.apache.org/docs/1.11.1/specification/): primitives
(null/boolean/int/long/float/double/bytes/string), records, enums,
arrays, maps, unions, and fixed, plus the object container file framing
(null and deflate codecs) and the Confluent wire framing (magic 0x00 +
4-byte schema id + datum) used by schema-registry deployments, and the
spec's LOGICAL TYPES that real Rubin/ZTF schemas annotate with —
decimal (bytes/fixed), uuid, date, timestamp-millis/micros and their
local- variants — converted to/from Python date/datetime/Decimal on
decode/encode and mapped to Date/Timestamp/TimestampNTZ/DecimalType in
``avro_to_spark_type`` (the same mapping spark-avro applies); unknown or
invalid annotations are ignored per the spec and fall back to the
underlying type.

``from_avro`` (spark-avro) remains the documented real-cluster path; the
``kafka_decode(..., value_format="avro")`` integration in
``sources/__init__.py`` gives the identical pipeline shape offline.

Scale: decoding runs executor-side inside an Arrow-batched kernel (one
Python call per batch, not per message); the driver never sees payload
bytes. Schemas are parsed once and captured in the task closure.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

__all__ = [
    "SchemaError",
    "avro_to_spark_type",
    "decode_confluent",
    "decode_container",
    "decode_datum",
    "decode_resolved",
    "encode_confluent",
    "encode_container",
    "encode_datum",
    "parse_schema",
]

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class SchemaError(ValueError):
    """Malformed Avro schema or datum/schema mismatch."""


# ---------------------------------------------------------------------------
# schema parsing: JSON -> normalized dict tree with named-type references
# resolved (the spec allows referring to a previously defined record/enum/
# fixed by full name; we inline the definition so encode/decode walk plain
# dicts with no registry lookups in the hot path)
# ---------------------------------------------------------------------------

def parse_schema(schema: str | dict | list) -> dict | str | list:
    """Normalize a schema given as JSON text or parsed JSON. Named types
    (record/enum/fixed) may be referenced by name after definition; the
    reference is replaced by the shared definition object."""
    if isinstance(schema, str) and schema.lstrip()[:1] in "[{\"":
        schema = json.loads(schema)
    names: dict[str, dict] = {}
    return _resolve(schema, names, enclosing_ns=None, memo={})


import functools  # noqa: E402  (placed with its single user)


@functools.lru_cache(maxsize=64)
def _parse_schema_cached(schema_text: str):
    """``parse_schema`` memoized on the raw schema TEXT — the container
    decode path calls this once per message with an identical embedded
    writer schema."""
    return parse_schema(schema_text)


def _full_name(d: dict, enclosing_ns: str | None) -> str:
    name = d["name"]
    if "." in name:
        return name
    ns = d.get("namespace", enclosing_ns)
    return f"{ns}.{name}" if ns else name


# logical types (spec §Logical Types) that this codec CONVERTS; any other
# annotation rides along unconverted (the spec: an unknown or invalid
# logicalType must be ignored and the underlying type used). time-millis/
# time-micros are deliberately passthrough ints — that is also what
# spark-avro produces for them (Spark has no time-of-day column type here).
_LOGICAL_BASES = {
    "decimal": ("bytes", "fixed"),
    "uuid": ("string",),
    "date": ("int",),
    "timestamp-millis": ("long",),
    "timestamp-micros": ("long",),
    "local-timestamp-millis": ("long",),
    "local-timestamp-micros": ("long",),
}


def _logical_annotation(s: dict, base: str) -> dict | None:
    """Validated {"logicalType": ..., [precision/scale]} attrs for a schema
    node, or None when absent/unknown/invalid (spec: ignore and fall back
    to the underlying type)."""
    lt = s.get("logicalType")
    if lt not in _LOGICAL_BASES or base not in _LOGICAL_BASES[lt]:
        return None
    if lt != "decimal":
        return {"logicalType": lt}
    try:
        precision = int(s["precision"])
        scale = int(s.get("scale", 0))
    except (KeyError, TypeError, ValueError):
        return None
    if precision <= 0 or scale < 0 or scale > precision:
        return None
    if base == "fixed":
        size = int(s["size"])
        # max precision representable in size bytes (two's complement)
        if precision > len(str(2 ** (8 * size - 1) - 1)):
            return None
    return {"logicalType": "decimal", "precision": precision, "scale": scale}


def _resolve(s, names: dict, enclosing_ns: str | None, memo: dict | None = None):
    # memo (by object identity): re-parsing an ALREADY-normalized tree —
    # which may be cyclic for a recursive record — must return the node
    # being built instead of re-walking it forever
    if memo is None:
        memo = {}
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return s
        full = s if "." in s else (f"{enclosing_ns}.{s}" if enclosing_ns else s)
        if full in names:
            return names[full]
        if s in names:
            return names[s]
        raise SchemaError(f"unknown type reference: {s!r}")
    if isinstance(s, list):  # union
        return [_resolve(b, names, enclosing_ns, memo) for b in s]
    if not isinstance(s, dict):
        raise SchemaError(f"invalid schema node: {s!r}")
    if id(s) in memo:
        return memo[id(s)]
    t = s.get("type")
    if t in ("record", "error"):
        full = _full_name(s, enclosing_ns)
        out = {"type": "record", "name": full, "fields": []}
        names[full] = out
        memo[id(s)] = out
        ns = full.rsplit(".", 1)[0] if "." in full else enclosing_ns
        for f in s["fields"]:
            fld = {"name": f["name"], "type": _resolve(f["type"], names, ns, memo)}
            if "default" in f:  # carried for reader-side schema resolution
                fld["default"] = f["default"]
            if "aliases" in f:
                fld["aliases"] = list(f["aliases"])
            out["fields"].append(fld)
        return out
    if t == "enum":
        full = _full_name(s, enclosing_ns)
        out = {"type": "enum", "name": full, "symbols": list(s["symbols"])}
        if "default" in s:  # reader-side resolution fallback symbol
            out["default"] = s["default"]
        names[full] = out
        return out
    if t == "fixed":
        full = _full_name(s, enclosing_ns)
        out = {"type": "fixed", "name": full, "size": int(s["size"])}
        ann = _logical_annotation(s, "fixed")
        if ann:
            out.update(ann)
        names[full] = out
        return out
    if t == "array":
        return {"type": "array", "items": _resolve(s["items"], names, enclosing_ns, memo)}
    if t == "map":
        return {"type": "map", "values": _resolve(s["values"], names, enclosing_ns, memo)}
    if t in _PRIMITIVES:  # {"type": "string"} wrapper form
        ann = _logical_annotation(s, t)
        if ann:  # keep the annotation: {"type": "long", "logicalType": ...}
            return {"type": t, **ann}
        return t
    if isinstance(t, (dict, list)):  # {"type": {...}} nesting
        return _resolve(t, names, enclosing_ns, memo)
    raise SchemaError(f"unsupported schema type: {t!r}")


# ---------------------------------------------------------------------------
# datum encoding (spec: binary encoding)
# ---------------------------------------------------------------------------

def _write_long(out: io.BytesIO, n: int) -> None:
    # shared zigzag-LEB128 primitive (sources/varint.py — same codec as
    # the Kafka record framing, one implementation for both wire formats)
    from .varint import write_varint

    out.write(write_varint(n))


def _read_long(buf: io.BytesIO) -> int:
    from .varint import read_varint

    try:
        return read_varint(buf)
    except ValueError as e:  # surface as this module's typed error
        raise SchemaError(str(e)) from None


def encode_datum(datum, schema) -> bytes:
    out = io.BytesIO()
    _encode(out, datum, schema)
    return out.getvalue()


# --- logical-type value conversions (spec §Logical Types) -------------------

import datetime as _dt  # noqa: E402
import decimal as _decimal  # noqa: E402
import uuid as _uuid  # noqa: E402

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)
_US = _dt.timedelta(microseconds=1)


def _int_to_logical(v: int, lt: str):
    # a well-formed long can still be outside Python's date range
    # (year 1..9999); surface the module's typed error, not the bare
    # OverflowError, so kafka_decode callers honoring the documented
    # error contract catch it instead of losing an executor task
    try:
        if lt == "date":
            return _EPOCH_DATE + _dt.timedelta(days=v)
        if lt == "timestamp-millis":
            return _EPOCH_UTC + _dt.timedelta(milliseconds=v)
        if lt == "timestamp-micros":
            return _EPOCH_UTC + _dt.timedelta(microseconds=v)
        if lt == "local-timestamp-millis":
            return _EPOCH_NAIVE + _dt.timedelta(milliseconds=v)
        if lt == "local-timestamp-micros":
            return _EPOCH_NAIVE + _dt.timedelta(microseconds=v)
    except (OverflowError, OSError) as e:
        raise SchemaError(f"{lt} value {v} outside representable range: {e}") from None
    return v


def _logical_to_int(datum, lt: str) -> int:
    if isinstance(datum, int) and not isinstance(datum, bool):
        return datum  # raw base value passes through unchanged
    if lt == "date":
        if isinstance(datum, _dt.datetime):
            raise SchemaError("date logical type takes a date, not datetime")
        if isinstance(datum, _dt.date):
            return (datum - _EPOCH_DATE).days
    elif isinstance(datum, _dt.datetime):
        epoch = _EPOCH_NAIVE if datum.tzinfo is None else _EPOCH_UTC
        us = (datum - epoch) // _US
        return us // 1000 if lt.endswith("millis") else us
    raise SchemaError(f"cannot encode {type(datum).__name__} as {lt}")


def _unscaled_to_decimal(b: bytes, schema: dict) -> _decimal.Decimal:
    u = int.from_bytes(b, "big", signed=True)
    # tuple construction is context-free (exact for any digit count)
    digits = tuple(int(c) for c in str(abs(u)))
    return _decimal.Decimal((0 if u >= 0 else 1, digits, -schema.get("scale", 0)))


def _decimal_to_unscaled(datum, schema: dict) -> bytes:
    if isinstance(datum, (bytes, bytearray)):
        return bytes(datum)  # raw base value passes through unchanged
    scale = schema.get("scale", 0)
    if isinstance(datum, int) and not isinstance(datum, bool):
        u = datum * 10 ** scale
    elif isinstance(datum, _decimal.Decimal):
        t = datum.as_tuple()
        if not isinstance(t.exponent, int):  # NaN / Infinity
            raise SchemaError(f"non-finite decimal {datum!r}")
        shift = t.exponent + scale
        u = int("".join(map(str, t.digits)) or "0")
        if shift >= 0:
            u *= 10 ** shift
        else:
            q, r = divmod(u, 10 ** -shift)
            if r:
                raise SchemaError(f"decimal {datum} does not fit scale {scale}")
            u = q
        if t.sign:
            u = -u
    else:
        raise SchemaError(f"cannot encode {type(datum).__name__} as decimal")
    if schema["type"] == "fixed":
        try:
            return u.to_bytes(schema["size"], "big", signed=True)
        except OverflowError:
            raise SchemaError(
                f"decimal unscaled value {u} overflows fixed({schema['size']})"
            ) from None
    nbytes = max(1, (u.bit_length() + 8) // 8)  # minimal two's complement
    return u.to_bytes(nbytes, "big", signed=True)


def _strip_logical(schema):
    """The schema node with its logical annotation removed (decode the raw
    base value). Annotated nodes are dicts; primitives strip to the bare
    type name, fixed to a size-only node."""
    if isinstance(schema, dict) and "logicalType" in schema:
        if schema["type"] == "fixed":
            return {"type": "fixed", "size": schema["size"]}
        return schema["type"]
    return schema


def _union_index(datum, branches: list) -> int:
    """Pick the union branch for a Python datum (the common alert-schema
    unions are ["null", X]; richer unions match on Python type)."""
    def tname(b):
        return b if isinstance(b, str) else b["type"]

    for i, b in enumerate(branches):
        t = tname(b)
        if datum is None and t == "null":
            return i
    for i, b in enumerate(branches):
        t = tname(b)
        if datum is None:
            continue
        if isinstance(datum, bool):
            if t == "boolean":
                return i
        elif isinstance(datum, int) and t in ("int", "long"):
            return i
        elif isinstance(datum, float) and t in ("float", "double"):
            return i
        elif isinstance(datum, str) and t in ("string", "enum"):
            return i
        elif isinstance(datum, (bytes, bytearray)) and t in ("bytes", "fixed"):
            return i
        elif isinstance(datum, dict) and t in ("record", "map"):
            return i
        elif isinstance(datum, (list, tuple)) and t == "array":
            return i
        elif isinstance(datum, int) and t in ("float", "double"):
            return i
    # logical-type Python values match the branch carrying the annotation
    # — ["null", annotated-long] is the standard nullable alert-field
    # shape, so a datetime/date/Decimal datum must find its branch here
    for i, b in enumerate(branches):
        if not isinstance(b, dict):
            continue
        lt = b.get("logicalType")
        if lt is None:
            continue
        t = b["type"]
        if (
            isinstance(datum, _dt.datetime)
            and t == "long"
            and lt
            in (
                "timestamp-millis",
                "timestamp-micros",
                "local-timestamp-millis",
                "local-timestamp-micros",
            )
        ):
            return i
        if (
            isinstance(datum, _dt.date)
            and not isinstance(datum, _dt.datetime)
            and t == "int"
            and lt == "date"
        ):
            return i
        if isinstance(datum, _decimal.Decimal) and lt == "decimal":
            return i
        if isinstance(datum, _uuid.UUID) and t == "string" and lt == "uuid":
            return i
    raise SchemaError(f"no union branch for {type(datum).__name__}")


def _encode(out: io.BytesIO, datum, schema) -> None:
    if isinstance(schema, list):  # union
        i = _union_index(datum, schema)
        _write_long(out, i)
        _encode(out, datum, schema[i])
        return
    t = schema if isinstance(schema, str) else schema["type"]
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        if datum is not None:
            raise SchemaError("non-None datum for null schema")
        return
    if t == "boolean":
        out.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, _logical_to_int(datum, lt) if lt else int(datum))
    elif t == "float":
        out.write(struct.pack("<f", float(datum)))
    elif t == "double":
        out.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        b = _decimal_to_unscaled(datum, schema) if lt == "decimal" else bytes(datum)
        _write_long(out, len(b))
        out.write(b)
    elif t == "string":
        b = str(datum).encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            try:
                _encode(out, datum[f["name"]], f["type"])
            except KeyError:
                raise SchemaError(f"record missing field {f['name']!r}") from None
    elif t == "enum":
        try:
            _write_long(out, schema["symbols"].index(datum))
        except ValueError:
            raise SchemaError(f"{datum!r} not in enum symbols") from None
    elif t == "fixed":
        b = _decimal_to_unscaled(datum, schema) if lt == "decimal" else bytes(datum)
        if len(b) != schema["size"]:
            raise SchemaError(f"fixed size {schema['size']} != {len(b)}")
        out.write(b)
    elif t == "array":
        if datum:
            _write_long(out, len(datum))
            for item in datum:
                _encode(out, item, schema["items"])
        _write_long(out, 0)
    elif t == "map":
        if datum:
            _write_long(out, len(datum))
            for k, v in datum.items():
                _encode(out, k, "string")
                _encode(out, v, schema["values"])
        _write_long(out, 0)
    else:
        raise SchemaError(f"unsupported type: {t!r}")


# ---------------------------------------------------------------------------
# datum decoding
# ---------------------------------------------------------------------------

def decode_datum(data: bytes | io.BytesIO, schema):
    buf = data if isinstance(data, io.BytesIO) else io.BytesIO(data)
    return _decode(buf, schema)


def _decode(buf: io.BytesIO, schema):
    if isinstance(schema, list):  # union
        i = _read_long(buf)
        if not 0 <= i < len(schema):
            raise SchemaError(f"union index {i} out of range")
        return _decode(buf, schema[i])
    t = schema if isinstance(schema, str) else schema["type"]
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise SchemaError("truncated boolean")
        return b != b"\x00"
    if t in ("int", "long"):
        v = _read_long(buf)
        return _int_to_logical(v, lt) if lt else v
    if t == "float":
        return struct.unpack("<f", _exact(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _exact(buf, 8))[0]
    if t == "bytes":
        b = _exact(buf, _read_long(buf))
        return _unscaled_to_decimal(b, schema) if lt == "decimal" else b
    if t == "string":
        return _exact(buf, _read_long(buf)).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "enum":
        i = _read_long(buf)
        try:
            return schema["symbols"][i]
        except IndexError:
            raise SchemaError(f"enum index {i} out of range") from None
    if t == "fixed":
        b = _exact(buf, schema["size"])
        return _unscaled_to_decimal(b, schema) if lt == "decimal" else b
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix (skippable form)
                n = -n
                _read_long(buf)  # block byte size — not needed sequentially
            for _ in range(n):
                out.append(_decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _exact(buf, _read_long(buf)).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
    raise SchemaError(f"unsupported type: {t!r}")


def _exact(buf: io.BytesIO, n: int) -> bytes:
    if n < 0:
        raise SchemaError(f"negative length {n}")
    b = buf.read(n)
    if len(b) != n:
        raise SchemaError(f"truncated: wanted {n} bytes, got {len(b)}")
    return b


# ---------------------------------------------------------------------------
# schema resolution (spec "Schema Resolution"): decode data written with the
# WRITER schema into the shape the READER schema expects — the mechanism
# that lets a consumer pinned to alert schema version N read a stream that
# upgraded to N+1 (ZTF bumped its alert schema repeatedly; the embedded
# container schema is the writer, the pipeline's is the reader).
# ---------------------------------------------------------------------------


def _type_name(s) -> str:
    return s if isinstance(s, str) else s["type"]


_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def _resolvable(writer, reader) -> bool:
    """Cheap structural match check used to pick union branches."""
    if isinstance(reader, list):
        return any(_resolvable(writer, b) for b in reader)
    if isinstance(writer, list):
        return True  # per-datum branch is checked at decode time
    wt, rt = _type_name(writer), _type_name(reader)
    if wt in _PROMOTIONS:
        return rt in _PROMOTIONS[wt]
    if wt != rt:
        return False
    if wt in ("record", "enum", "fixed"):
        # unqualified-name match (spec: names or aliases; namespaces often
        # differ between copies of the same alert schema)
        return writer["name"].split(".")[-1] == reader["name"].split(".")[-1]
    return True


def _default_value(schema, default):
    """JSON default -> Python datum (spec: bytes/fixed defaults are
    ISO-8859-1 strings; union defaults use the FIRST branch's type)."""
    if isinstance(schema, list):
        return _default_value(schema[0], default)
    t = _type_name(schema)
    if t == "null":
        return None
    if t in ("bytes", "fixed"):
        return default.encode("iso-8859-1") if isinstance(default, str) else default
    if t == "record":
        return {
            f["name"]: _default_value(f["type"], f.get("default"))
            for f in schema["fields"]
        } if default is None else {
            f["name"]: _default_value(f["type"], default.get(f["name"], f.get("default")))
            for f in schema["fields"]
        }
    if t == "float" or t == "double":
        return float(default)
    return default


def decode_resolved(data: bytes | io.BytesIO, writer, reader):
    """Decode a datum written with ``writer`` into ``reader``'s shape:
    record fields matched by name (reader aliases honored), writer-only
    fields skipped, reader-only fields filled from their defaults,
    numeric/string-bytes promotions applied, unions re-matched branch by
    branch. Raises SchemaError where the spec says resolution fails (no
    default for a missing field, enum symbol unknown to the reader with
    no reader default, incompatible types)."""
    buf = data if isinstance(data, io.BytesIO) else io.BytesIO(data)
    return _decode_res(buf, writer, reader)


def _decode_res(buf: io.BytesIO, writer, reader):
    if isinstance(writer, list):
        i = _read_long(buf)
        if not 0 <= i < len(writer):
            raise SchemaError(f"union index {i} out of range")
        return _decode_res(buf, writer[i], reader)
    if isinstance(reader, list):
        for branch in reader:
            if _resolvable(writer, branch):
                return _decode_res(buf, writer, branch)
        raise SchemaError(
            f"writer type {_type_name(writer)!r} matches no reader union branch"
        )
    wt, rt = _type_name(writer), _type_name(reader)
    if wt in _PROMOTIONS and rt in _PROMOTIONS[wt] and wt != rt:
        v = _decode(buf, writer)
        if rt in ("float", "double"):
            return float(v)
        if rt == "long":
            v = int(v)
            # reader-annotation-wins (spec §Logical Types: annotations
            # attach to the reader's view) must hold on the promotion
            # path too — an int writer promoted to an annotated long
            # otherwise yields raw ints while a long writer yields
            # datetimes, and the consumer gets a mixed column
            rlt = reader.get("logicalType") if isinstance(reader, dict) else None
            return _int_to_logical(v, rlt) if rlt else v
        if rt == "bytes":
            return v.encode("utf-8")
        if rt == "string":
            return v.decode("utf-8")
        return v
    if not _resolvable(writer, reader):
        raise SchemaError(f"cannot resolve writer {wt!r} to reader {rt!r}")
    if wt == "record":
        out = {}
        rfields = {f["name"]: f for f in reader["fields"]}
        for f in reader["fields"]:
            for alias in f.get("aliases", ()):
                rfields.setdefault(alias, f)
        consumed = set()
        for wf in writer["fields"]:
            rf = rfields.get(wf["name"])
            if rf is None:
                _decode(buf, wf["type"])  # writer-only field: decode + drop
            else:
                out[rf["name"]] = _decode_res(buf, wf["type"], rf["type"])
                consumed.add(rf["name"])
        for rf in reader["fields"]:
            if rf["name"] in consumed:
                continue
            if "default" not in rf:
                raise SchemaError(
                    f"reader field {rf['name']!r} missing from writer and "
                    "has no default"
                )
            out[rf["name"]] = _default_value(rf["type"], rf["default"])
        return out
    if wt == "enum":
        sym = _decode(buf, writer)
        if sym in reader["symbols"]:
            return sym
        if "default" in reader:
            return reader["default"]
        raise SchemaError(f"enum symbol {sym!r} unknown to reader")
    if wt == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode_res(buf, writer["items"], reader["items"]))
    if wt == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _exact(buf, _read_long(buf)).decode("utf-8")
                out[k] = _decode_res(buf, writer["values"], reader["values"])
    if wt == "fixed" and writer["size"] != reader["size"]:
        raise SchemaError("fixed size mismatch")
    # identical base primitive/fixed: decode the RAW base value, then apply
    # the READER's logical annotation (the consumer's declared semantics) —
    # so a reader pinned to timestamp-micros gets datetimes whether or not
    # the writer schema carried the annotation, and an unannotated reader
    # gets the plain base value
    v = _decode(buf, _strip_logical(writer))
    rlt = reader.get("logicalType") if isinstance(reader, dict) else None
    if rlt == "decimal":
        return _unscaled_to_decimal(v, reader)
    if rlt:
        return _int_to_logical(v, rlt)
    return v


# ---------------------------------------------------------------------------
# object container file (the ZTF alert packet framing): magic, metadata map
# (avro.schema / avro.codec), 16-byte sync marker, blocks of
# (record count, byte size, payload, sync)
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}
_DEFAULT_SYNC = bytes(range(16))  # deterministic (no RNG in library code)


def _schema_json(schema, seen: set) -> object:
    """Normalized schema tree -> JSON-serializable schema with named types
    emitted by REFERENCE after their first definition (the spec's rule for
    schema JSON: a name may be defined once; later uses refer to it). A
    plain ``json.dumps`` of the normalized tree re-inlines every shared
    definition — invalid for spec-strict external readers — and recurses
    forever on a recursive record."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return [_schema_json(b, seen) for b in schema]
    t = schema["type"]
    if t in ("record", "enum", "fixed"):
        name = schema["name"]
        if name in seen:
            return name
        seen.add(name)
        if t == "record":
            return {
                "type": "record",
                "name": name,
                "fields": [
                    {
                        k: (_schema_json(f["type"], seen) if k == "type" else f[k])
                        for k in f
                    }
                    for f in schema["fields"]
                ],
            }
        return dict(schema)  # enum / fixed: all attributes are JSON-safe
    if t == "array":
        return {"type": "array", "items": _schema_json(schema["items"], seen)}
    if t == "map":
        return {"type": "map", "values": _schema_json(schema["values"], seen)}
    return dict(schema)  # logically-annotated primitive


def encode_container(
    records: list,
    schema: str | dict | list,
    codec: str = "null",
    sync: bytes = _DEFAULT_SYNC,
) -> bytes:
    """One-block object container file holding ``records`` (the ZTF alert
    stream sends one record per message, but any count round-trips)."""
    parsed = parse_schema(schema)
    # JSON text is embedded verbatim; a dict/parsed schema is serialized
    # with named types by reference (see _schema_json)
    schema_json = (
        schema if isinstance(schema, str)
        else json.dumps(_schema_json(parsed, set()))
    )
    if len(sync) != 16:
        raise SchemaError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate"):
        raise SchemaError(f"unsupported codec {codec!r}")
    out = io.BytesIO()
    out.write(_MAGIC)
    _encode(
        out,
        {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()},
        _META_SCHEMA,
    )
    out.write(sync)
    body = io.BytesIO()
    for r in records:
        _encode(body, r, parsed)
    payload = body.getvalue()
    if codec == "deflate":  # spec: raw deflate, no zlib header/checksum
        payload = zlib.compress(payload)[2:-4]
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()


def decode_container(
    data: bytes, reader_schema=None
) -> tuple[dict | str | list, list]:
    """(writer schema, records) from an object container file. The schema
    travels IN the file — no reader-side registry needed (exactly why ZTF
    chose this framing for alert packets). With ``reader_schema`` (parsed
    or raw), records are schema-RESOLVED into the reader's shape
    (``decode_resolved``) — the consumer stays pinned to its own schema
    version while the stream's writer schema evolves underneath it."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise SchemaError("not an Avro object container file (bad magic)")
    meta = _decode(buf, _META_SCHEMA)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise SchemaError(f"unsupported codec {codec!r}")
    # memoized: every message of a stream carries the SAME embedded writer
    # schema (tens of KB of JSON for a real alert schema) — re-parsing it
    # per message would rival the datum decode itself at stream rates
    schema = _parse_schema_cached(meta["avro.schema"].decode())
    if reader_schema is not None and not isinstance(reader_schema, (dict, list)):
        reader_schema = parse_schema(reader_schema)
    sync = _exact(buf, 16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = _exact(buf, size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        block = io.BytesIO(payload)
        for _ in range(n):
            if reader_schema is None:
                records.append(_decode(block, schema))
            else:
                records.append(_decode_res(block, schema, reader_schema))
        if _exact(buf, 16) != sync:
            raise SchemaError("sync marker mismatch (corrupt block)")
    return schema, records


# ---------------------------------------------------------------------------
# Confluent schema-registry wire framing: 0x00 + big-endian 4-byte schema id
# + bare datum (Rubin-style deployments with a registry)
# ---------------------------------------------------------------------------

def encode_confluent(datum, schema, schema_id: int) -> bytes:
    return b"\x00" + struct.pack(">I", schema_id) + encode_datum(
        datum, parse_schema(schema) if isinstance(schema, (str,)) else schema
    )


def decode_confluent(data: bytes, schema) -> tuple[int, object]:
    """(schema_id, datum). The registry lookup itself is deployment infra;
    the caller maps id -> schema (tests pass the schema directly).
    Accepts the schema in any form ``encode_confluent`` does (JSON text,
    dict, or pre-parsed) — symmetric call patterns must round-trip."""
    if not data or data[0] != 0:
        raise SchemaError("not Confluent-framed (magic byte != 0)")
    if len(data) < 5:
        raise SchemaError(
            "truncated Confluent frame (need magic + 4-byte schema id, got "
            f"{len(data)} bytes)"
        )
    schema_id = struct.unpack(">I", data[1:5])[0]
    if isinstance(schema, str):
        schema = _parse_schema_cached(schema)
    return schema_id, decode_datum(data[5:], schema)


# ---------------------------------------------------------------------------
# Avro schema -> Spark DataType (for kafka_decode's value_format="avro")
# ---------------------------------------------------------------------------

def avro_to_spark_type(schema):
    """Map a parsed Avro schema to the Spark type spark-avro would produce:
    unions of [null, X] become nullable X; other unions are unsupported
    (spark-avro represents them as structs — outside the alert schemas'
    shapes); enum -> string, fixed -> binary, map -> map<string, V>."""
    from pyspark.sql import types as T

    if isinstance(schema, list):
        non_null = [b for b in schema if b != "null"]
        if len(non_null) != 1:
            raise SchemaError(
                "only [null, X] unions map to a Spark type; got "
                f"{len(non_null)} non-null branches"
            )
        return avro_to_spark_type(non_null[0])
    t = schema if isinstance(schema, str) else schema["type"]
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if lt is not None:  # same mapping spark-avro applies to annotated types
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        if lt in ("local-timestamp-millis", "local-timestamp-micros"):
            return T.TimestampNTZType()
        if lt == "decimal":
            return T.DecimalType(schema["precision"], schema.get("scale", 0))
        if lt == "uuid":
            return T.StringType()
    prim = {
        "boolean": T.BooleanType,
        "int": T.IntegerType,
        "long": T.LongType,
        "float": T.FloatType,
        "double": T.DoubleType,
        "bytes": T.BinaryType,
        "string": T.StringType,
        "null": T.NullType,
        "enum": T.StringType,
        "fixed": T.BinaryType,
    }
    if t in prim:
        return prim[t]()
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"],
                    avro_to_spark_type(f["type"]),
                    nullable=_nullable(f["type"]),
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(
            avro_to_spark_type(schema["items"]), containsNull=_nullable(schema["items"])
        )
    if t == "map":
        return T.MapType(
            T.StringType(),
            avro_to_spark_type(schema["values"]),
            valueContainsNull=_nullable(schema["values"]),
        )
    raise SchemaError(f"unsupported type: {t!r}")


def _nullable(schema) -> bool:
    return isinstance(schema, list) and "null" in schema
