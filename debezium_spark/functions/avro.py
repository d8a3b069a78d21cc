"""Avro binary converter — Debezium's default wire format, from scratch.

The reference ships envelopes through Kafka Connect converters; the fork's
README documents Avro as the default (``README.md:393``). No Avro library
exists in this environment, so this module implements the **Avro binary
datum encoding** directly from the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/ — "Binary encoding"):

- int/long: zigzag + variable-length base-128 varint
- string/bytes: long length prefix + raw bytes
- float/double: 4/8-byte little-endian IEEE
- boolean: one byte; null: zero bytes
- union ``["null", T]``: long branch index (0=null, 1=value) then the value
- record: fields concatenated in schema order

Framing follows the Confluent wire format the reference's converter emits
(magic byte ``0x00`` + 4-byte big-endian schema id + datum); the schema id
here is a deterministic hash of the generated Avro schema JSON, and
``avro_schema_json`` emits that writer schema so any standard Avro reader
can decode the frames.

Spark shape: the codec runs as an **Arrow-batched ``mapInPandas``** (the
same vectorized-codec exception as ``sources/wire.py`` — SURVEY §2.1); the
per-type encoder chain is built ONCE on the driver from the DataFrame's
StructType and closed over, so the hot loop does no type dispatch.
Round-trip is exact (``avro_envelope_roundtrip`` in the extras registry,
plus ``tests/test_avro.py`` which checks emitted bytes against hand-encoded
spec vectors).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import struct
from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MAGIC = b"\x00"  # Confluent wire-format magic byte


# ---- primitive codecs (Avro spec, binary encoding) -------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, off: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[off]
        off += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), off


# ---- schema-driven codec builders ------------------------------------------


#: epoch anchor for the Avro ``date`` logical type (days since 1970-01-01)
_EPOCH_DATE = datetime.date(1970, 1, 1)

#: sentinel marking a named record whose fields are still being parsed in
#: ``_json_decoder`` — a reference to it is recursion (see there)
_OPEN_RECORD = object()


def _unscaled_bytes(unscaled: int) -> bytes:
    """Minimal two's-complement big-endian bytes — the Avro ``decimal``
    logical type's representation over ``bytes`` (Avro 1.11 spec,
    "Decimal"). Byte-identical to Java ``BigInteger.toByteArray`` —
    negative exact powers of two take their tight length (-128 → 0x80,
    one byte, not sign-extended 0xFF80; review r5)."""
    bits = (
        unscaled.bit_length() + 1
        if unscaled >= 0
        else (~unscaled).bit_length() + 1
    )
    return unscaled.to_bytes((bits + 7) // 8, "big", signed=True)


def _exact_unscaled(d: Decimal, scale: int) -> int:
    """``d`` as an unscaled int at ``scale``, context-free and exact at any
    precision (``Decimal.scaleb`` silently ROUNDS past the default 28-digit
    context — review r5: a decimal(38,0) value came back perturbed).
    Raises if ``d`` carries more fractional digits than ``scale`` (a
    typed Spark decimal column never does)."""
    if not d.is_finite():
        raise ValueError(f"avro decimal: non-finite value {d}")
    sign, digits, exp = d.as_tuple()
    unscaled = int("".join(map(str, digits))) if digits else 0
    shift = exp + scale
    if shift >= 0:
        unscaled *= 10**shift
    else:
        q, r = divmod(unscaled, 10**-shift)
        if r:
            raise ValueError(
                f"avro decimal: {d} does not fit scale {scale} exactly"
            )
        unscaled = q
    return -unscaled if sign else unscaled


def _exact_decimal(unscaled: int, scale: int) -> Decimal:
    """Unscaled int + scale → exact ``Decimal`` at any precision,
    context-free (the tuple constructor never consults the thread
    context, unlike ``scaleb`` — review r5)."""
    sign = 1 if unscaled < 0 else 0
    return Decimal((sign, tuple(int(c) for c in str(abs(unscaled))), -scale))


def _enc_for(dt: DataType):
    """Encoder closure for one (non-null) Spark type → bytes appender.

    Logical types (Avro 1.11 spec, "Logical Types" — the reference gets
    these from the Confluent Avro converter, fork ``README.md:393``):
    DecimalType → ``bytes``+``decimal`` (two's-complement unscaled int),
    TimestampType → ``long``+``timestamp-micros`` (the value arrives as a
    STRING of UTC epoch micros — ``to_avro`` transports timestamps via
    ``unix_micros`` at every nesting depth, so encoding is session-timezone
    independent), DateType → ``int``+``date`` (epoch days; ``datetime.date``
    has no timezone, so it rides the object path exactly)."""
    if isinstance(dt, (LongType, IntegerType, TimestampType)):
        return lambda v, out: out.extend(_zigzag_encode(int(v)))
    if isinstance(dt, DecimalType):
        scale = dt.scale

        def enc_decimal(v, out):
            unscaled = _exact_unscaled(Decimal(v), scale)
            b = _unscaled_bytes(unscaled)
            out.extend(_zigzag_encode(len(b)))
            out.extend(b)
        return enc_decimal
    if isinstance(dt, DateType):
        return lambda v, out: out.extend(
            _zigzag_encode((v - _EPOCH_DATE).days)
        )
    if isinstance(dt, StringType):
        def enc_str(v, out):
            b = str(v).encode("utf-8")
            out.extend(_zigzag_encode(len(b)))
            out.extend(b)
        return enc_str
    if isinstance(dt, BinaryType):
        def enc_bytes(v, out):
            b = bytes(v)
            out.extend(_zigzag_encode(len(b)))
            out.extend(b)
        return enc_bytes
    if isinstance(dt, DoubleType):
        return lambda v, out: out.extend(struct.pack("<d", float(v)))
    if isinstance(dt, FloatType):
        return lambda v, out: out.extend(struct.pack("<f", float(v)))
    if isinstance(dt, BooleanType):
        return lambda v, out: out.append(1 if v else 0)
    if isinstance(dt, StructType):
        fields = [(f.name, _enc_for(f.dataType)) for f in dt.fields]

        def enc_rec(v, out):
            # v: dict-like (row asDict) — every field optional (union null)
            for name, fe in fields:
                fv = v.get(name) if isinstance(v, dict) else v[name]
                if fv is None:
                    out.extend(_zigzag_encode(0))
                else:
                    out.extend(_zigzag_encode(1))
                    fe(fv, out)
        return enc_rec
    if isinstance(dt, ArrayType):
        ee = _enc_for(dt.elementType)

        def enc_arr(v, out):
            # one block of len(v) nullable-union items, then the 0
            # terminator (Avro 1.11 "Arrays")
            items = list(v)
            if items:
                out.extend(_zigzag_encode(len(items)))
                for it in items:
                    if it is None:
                        out.extend(_zigzag_encode(0))
                    else:
                        out.extend(_zigzag_encode(1))
                        ee(it, out)
            out.extend(_zigzag_encode(0))
        return enc_arr
    if isinstance(dt, MapType):
        ve = _enc_for(dt.valueType)

        def enc_map(v, out):
            # Arrow hands map cells over as key/value pair lists; dicts
            # also accepted (Avro 1.11 "Maps": blocks of string key +
            # nullable-union value, 0-terminated)
            pairs = list(v.items()) if isinstance(v, dict) else [tuple(p) for p in v]
            if pairs:
                out.extend(_zigzag_encode(len(pairs)))
                for k, mv in pairs:
                    kb = str(k).encode("utf-8")
                    out.extend(_zigzag_encode(len(kb)))
                    out.extend(kb)
                    if mv is None:
                        out.extend(_zigzag_encode(0))
                    else:
                        out.extend(_zigzag_encode(1))
                        ve(mv, out)
            out.extend(_zigzag_encode(0))
        return enc_map
    raise ValueError(f"avro converter: unsupported Spark type {dt.simpleString()}")


def _dec_for(dt: DataType):
    """Decoder closure: (buf, off) -> (value, off).

    Logical types mirror ``_enc_for``: decimal → ``Decimal`` (exact, rides
    the object path into Arrow's decimal128), timestamp-micros → the raw
    micros long (transported back as a string and rebuilt JVM-side with
    ``timestamp_micros`` — session-timezone independent), date →
    ``datetime.date``."""
    if isinstance(dt, (LongType, IntegerType, TimestampType)):
        return _zigzag_decode
    if isinstance(dt, DecimalType):
        scale = dt.scale

        def dec_decimal(buf, off):
            n, off = _zigzag_decode(buf, off)
            unscaled = int.from_bytes(buf[off:off + n], "big", signed=True)
            return _exact_decimal(unscaled, scale), off + n
        return dec_decimal
    if isinstance(dt, DateType):
        def dec_date(buf, off):
            days, off = _zigzag_decode(buf, off)
            try:
                return _EPOCH_DATE + datetime.timedelta(days=days), off
            except OverflowError:
                # same loud posture as a schema-id mismatch: a date frame
                # outside [0001-01-01, 9999-12-31] is corrupt, not data
                raise ValueError(
                    f"bad avro frame: date value {days} epoch-days is "
                    "outside the representable date range"
                ) from None
        return dec_date
    if isinstance(dt, StringType):
        def dec_str(buf, off):
            n, off = _zigzag_decode(buf, off)
            return buf[off:off + n].decode("utf-8"), off + n
        return dec_str
    if isinstance(dt, BinaryType):
        def dec_bytes(buf, off):
            n, off = _zigzag_decode(buf, off)
            return bytes(buf[off:off + n]), off + n
        return dec_bytes
    if isinstance(dt, DoubleType):
        return lambda buf, off: (struct.unpack_from("<d", buf, off)[0], off + 8)
    if isinstance(dt, FloatType):
        return lambda buf, off: (struct.unpack_from("<f", buf, off)[0], off + 4)
    if isinstance(dt, BooleanType):
        return lambda buf, off: (bool(buf[off]), off + 1)
    if isinstance(dt, StructType):
        fields = [(f.name, _dec_for(f.dataType)) for f in dt.fields]

        def dec_rec(buf, off):
            out = {}
            for name, fd in fields:
                branch, off = _zigzag_decode(buf, off)
                if branch == 0:
                    out[name] = None
                else:
                    out[name], off = fd(buf, off)
            return out, off
        return dec_rec
    if isinstance(dt, ArrayType):
        ed = _dec_for(dt.elementType)

        def dec_arr(buf, off):
            # spec block loop: a NEGATIVE count means abs(count) items
            # preceded by the block's byte size (skippable fast-path other
            # writers may emit; we read through it)
            out = []
            while True:
                n, off = _zigzag_decode(buf, off)
                if n == 0:
                    return out, off
                if n < 0:
                    n = -n
                    _, off = _zigzag_decode(buf, off)  # block byte size
                for _ in range(n):
                    branch, off = _zigzag_decode(buf, off)
                    if branch == 0:
                        out.append(None)
                    else:
                        v, off = ed(buf, off)
                        out.append(v)
        return dec_arr
    if isinstance(dt, MapType):
        vd = _dec_for(dt.valueType)

        def dec_map(buf, off):
            # a dict: the shape PySpark's pandas→Arrow conversion expects
            # for a map column on the way back (it calls .items())
            out = {}
            while True:
                n, off = _zigzag_decode(buf, off)
                if n == 0:
                    return out, off
                if n < 0:
                    n = -n
                    _, off = _zigzag_decode(buf, off)
                for _ in range(n):
                    kl, off = _zigzag_decode(buf, off)
                    k = buf[off:off + kl].decode("utf-8")
                    off += kl
                    branch, off = _zigzag_decode(buf, off)
                    if branch == 0:
                        out[k] = None
                    else:
                        out[k], off = vd(buf, off)
        return dec_map
    raise ValueError(f"avro converter: unsupported Spark type {dt.simpleString()}")


# ---- Avro schema JSON (writer schema for external readers) -----------------

_AVRO_PRIM = {
    "bigint": "long", "int": "int", "string": "string", "binary": "bytes",
    "double": "double", "float": "float", "boolean": "boolean",
}


def avro_schema_json(schema: StructType, name: str = "Envelope") -> str:
    """The writer schema for the frames this module emits: a record of
    nullable-union fields, nested records for struct fields."""
    def field_type(dt: DataType, path: str):
        if isinstance(dt, StructType):
            return {
                "type": "record",
                "name": path,
                "fields": [
                    # "default": null makes the implicit null-union default
                    # EXPLICIT, as the spec's schema-resolution rules
                    # require for reader-added fields (a reader field with
                    # no default is a resolution error under the spec)
                    {"name": f.name,
                     "type": ["null", field_type(f.dataType, f"{path}_{f.name}")],
                     "default": None}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, ArrayType):
            # items are nullable unions, matching the module's
            # everything-nullable field convention
            return {"type": "array",
                    "items": ["null", field_type(dt.elementType, f"{path}_item")]}
        if isinstance(dt, MapType):
            if not isinstance(dt.keyType, StringType):
                raise ValueError(
                    "avro converter: map keys must be strings (Avro 1.11 "
                    f"'Maps'), got {dt.keyType.simpleString()}"
                )
            return {"type": "map",
                    "values": ["null", field_type(dt.valueType, f"{path}_value")]}
        if isinstance(dt, DecimalType):
            # logical types annotate the underlying primitive; the id
            # canonical form keeps logicalType+scale (value interpretation)
            # and strips precision (never on the wire) — see _PCF_ATTRS
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": dt.precision, "scale": dt.scale}
        if isinstance(dt, TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, DateType):
            return {"type": "int", "logicalType": "date"}
        t = _AVRO_PRIM.get(dt.simpleString())
        if t is None:
            raise ValueError(f"avro converter: unsupported type {dt.simpleString()}")
        return t

    return json.dumps(field_type(schema, name), sort_keys=True)


#: Parsing Canonical Form attribute whitelist + order (Avro 1.11 spec,
#: "Transforming into Parsing Canonical Form": STRIP then ORDER) — PLUS
#: the logical-type annotations that change how decoded bytes are
#: INTERPRETED (``logicalType`` and decimal ``scale``). Spec PCF strips
#: those because it canonicalizes parse-equivalence only; our id doubles
#: as the decode-dispatch key, and a decimal scale change (or
#: long→timestamp-micros) alters every value without altering the wire
#: shape — under strict PCF both schemas hashed to the SAME id, so frames
#: at rest silently decoded at the wrong scale (review r5). ``precision``
#: stays stripped: it never reaches the wire or the value.
_PCF_ATTRS = (
    "name", "type", "fields", "symbols", "items", "values", "size",
    "logicalType", "scale",
)


def _pcf(node):
    """Schema JSON → Parsing Canonical Form structure (extended — see
    ``_PCF_ATTRS``): only parsing- or value-interpretation-relevant
    attributes survive, in a fixed order, and a primitive left holding
    only ``type`` collapses to its bare string (the spec's [PRIMITIVES]
    rule). ``default``/``doc``/``precision``/aliases are stripped — two
    schemas that parse AND interpret the same data identically
    canonicalize identically, so cosmetic/metadata edits never orphan
    frames at rest."""
    if isinstance(node, list):
        return [_pcf(v) for v in node]
    if isinstance(node, dict):
        out = {k: _pcf(node[k]) for k in _PCF_ATTRS if k in node}
        if set(out) == {"type"} and isinstance(out["type"], str):
            return out["type"]
        return out
    return node


def schema_id(schema: StructType) -> int:
    """Deterministic 4-byte id for the Confluent-style frame header (a real
    deployment swaps in the registry-assigned id — see ``from_avro``'s
    ``(schema, id)`` writer registration for decoding such frames).

    Hashed over the spec's Parsing Canonical Form, NOT the raw schema JSON
    (review r5 finding): fingerprinting the raw JSON meant any
    cosmetic/metadata change — e.g. making the implicit ``"default":
    null`` explicit — silently changed every id and orphaned all frames at
    rest. PCF strips exactly the attributes that don't affect parsing, so
    ids move only when the wire shape does."""
    canonical = json.dumps(
        _pcf(json.loads(avro_schema_json(schema))), separators=(",", ":")
    )
    return int.from_bytes(hashlib.sha256(canonical.encode()).digest()[:4], "big")


# ---- DataFrame-level converter ---------------------------------------------


def to_avro(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Rows → one Avro binary frame per row (column ``avro``): magic byte +
    schema id + datum. All input columns become nullable-union fields of
    the record, struct columns nest."""
    cols = cols or df.columns
    sub = df.select(*cols)
    rec_schema = StructType([f for f in sub.schema.fields])
    enc = _enc_for(rec_schema)
    header = MAGIC + schema_id(rec_schema).to_bytes(4, "big")
    # Value exactness across the Arrow/pandas boundary — ship top-level
    # numeric columns as STRINGS:
    # - int64: Spark's Arrow->pandas turns a nullable long column into
    #   float64, silently rounding values above 2^53 before the encoder
    #   ever sees them; the encoder's int() parses the string exactly.
    # - float/double (ADVICE r3 #4): in a float64 pandas column a genuine
    #   IEEE NaN payload value is indistinguishable from a null, so the
    #   notna normalization below used to ship NaN down the union's null
    #   branch — a silent value change the spec encoding represents
    #   exactly. As strings, null stays None and NaN becomes "NaN", which
    #   the encoder's float() parses back to the IEEE value (Spark's
    #   float->string cast is shortest-roundtrip, so finite values are
    #   bit-exact too).
    # Struct columns arrive as dicts of Python objects and are already
    # exact for both concerns. Timestamps (top-level or nested) ship as
    # unix_micros STRINGS — the Arrow datetime path would hand the codec a
    # session-timezone wall clock; decimals/dates ride the object path
    # exactly (decimal.Decimal / datetime.date).
    transport = [
        F.col(f.name).cast("string").alias(f.name)
        if isinstance(f.dataType, (LongType, IntegerType, FloatType, DoubleType))
        else (
            _to_transport_expr(F.col(f.name), f.dataType).alias(f.name)
            if _transport_type(f.dataType) is not None
            else F.col(f.name)
        )
        for f in rec_schema.fields
    ]
    sub = sub.select(*transport)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # nulls surface as pandas NA — normalize to None so they take
            # the union's null branch (numeric columns are strings here, so
            # no real NaN value can be mistaken for a null)
            pdf = pdf.astype(object).where(pdf.notna(), None)
            frames = []
            for row in pdf.to_dict("records"):
                out = bytearray(header)
                enc(row, out)
                frames.append(bytes(out))
            yield pd.DataFrame({"avro": frames})

    # struct columns arrive in pandas as dicts already (Arrow conversion)
    return sub.mapInPandas(encode, schema="avro binary")


def _fstr(v):
    """Canonical string for an IEEE value — Spark's string→double cast
    accepts NaN/Infinity/-Infinity, and repr() is shortest-roundtrip."""
    if v is None:
        return None
    if v != v:  # NaN
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    return repr(float(v))


def _transport_type(dt: DataType) -> DataType | None:
    """The Arrow-transport type for ``dt`` with every float/double field
    (NaN≠null exactness) and every timestamp field (session-timezone
    independence: the wire value is UTC epoch micros, never a wall-clock
    datetime) — at ANY nesting depth — replaced by string, or None if
    unchanged. Decimal and date fields ride the object path exactly and
    need no transport."""
    if isinstance(dt, (FloatType, DoubleType, TimestampType)):
        return StringType()
    if isinstance(dt, StructType):
        changed = False
        fields = []
        for f in dt.fields:
            t = _transport_type(f.dataType)
            changed = changed or t is not None
            fields.append(StructField(f.name, t or f.dataType, True))
        return StructType(fields) if changed else None
    if isinstance(dt, ArrayType):
        # primitive numeric elements ALSO transport as strings: Arrow's
        # list→numpy conversion collapses a null element and a NaN into
        # the same float64 NaN and rounds int64 above 2^53 when any null
        # forces the float64 dtype — the list-level twin of the module's
        # top-level long/float rule
        et = (
            StringType()
            if isinstance(dt.elementType, (LongType, IntegerType))
            else _transport_type(dt.elementType)
        )
        return ArrayType(et, True) if et is not None else None
    if isinstance(dt, MapType):
        vt = (
            StringType()
            if isinstance(dt.valueType, (LongType, IntegerType))
            else _transport_type(dt.valueType)
        )
        return MapType(dt.keyType, vt, True) if vt is not None else None
    return None


def _transport_value(v, dt: DataType):
    """Decoded Python value → transport value (floats → canonical strings,
    timestamp micros → decimal strings, recursively through nested record
    dicts)."""
    if v is None:
        return None
    if isinstance(dt, (FloatType, DoubleType)):
        return _fstr(v)
    if isinstance(dt, (TimestampType, LongType, IntegerType)):
        # long/int only reach here as array/map ELEMENTS (see
        # _transport_type) — exact decimal strings either way
        return str(int(v))
    if isinstance(dt, StructType):
        for f in dt.fields:
            if _transport_type(f.dataType) is not None:
                v[f.name] = _transport_value(v.get(f.name), f.dataType)
        return v
    if isinstance(dt, ArrayType):
        return [_transport_value(x, dt.elementType) for x in v]
    if isinstance(dt, MapType):
        return {k: _transport_value(x, dt.valueType) for k, x in v.items()}
    return v


def _to_transport_expr(c: Column, dt: DataType) -> Column:
    """Column expression mapping ``dt`` to its transport shape on the way
    INTO the Arrow codec: timestamps → ``unix_micros`` strings (UTC,
    session-timezone independent), structs rebuilt field-wise (floats stay
    native here — nested dict floats are exact, and ``to_avro`` handles
    top-level float columns with its own string cast)."""
    if isinstance(dt, TimestampType):
        return F.unix_micros(c).cast("string")
    if isinstance(dt, StructType):
        rebuilt = F.struct(*[
            _to_transport_expr(c[f.name], f.dataType).alias(f.name)
            for f in dt.fields
        ])
        # a null struct must stay null, not become a struct of nulls
        return F.when(c.isNotNull(), rebuilt)
    if isinstance(dt, ArrayType):
        et = dt.elementType
        if isinstance(et, (LongType, IntegerType, FloatType, DoubleType)):
            # element-level string transport (see _transport_type); Spark's
            # numeric→string cast is shortest-roundtrip and spells
            # NaN/Infinity the way the codec's float() parses
            return F.transform(c, lambda x: x.cast("string"))
        return F.transform(c, lambda x: _to_transport_expr(x, et))
    if isinstance(dt, MapType):
        vt = dt.valueType
        if isinstance(vt, (LongType, IntegerType, FloatType, DoubleType)):
            return F.transform_values(c, lambda _, x: x.cast("string"))
        return F.transform_values(c, lambda _, x: _to_transport_expr(x, vt))
    return c


def _restore_expr(c: Column, dt: DataType) -> Column:
    """Column expression restoring a transported field to ``dt`` on the
    way OUT of the Arrow codec: float/double strings cast back (Spark's
    string→double accepts NaN/Infinity), timestamp micro-strings rebuild
    via ``timestamp_micros`` (never a wall-clock parse), structs rebuilt
    field-wise."""
    if isinstance(dt, (FloatType, DoubleType, LongType, IntegerType)):
        return c.cast(dt)
    if isinstance(dt, TimestampType):
        return F.timestamp_micros(c.cast("long"))
    if isinstance(dt, StructType):
        rebuilt = F.struct(*[
            (
                _restore_expr(c[f.name], f.dataType)
                if _transport_type(f.dataType) is not None
                else c[f.name]
            ).alias(f.name)
            for f in dt.fields
        ])
        return F.when(c.isNotNull(), rebuilt)
    if isinstance(dt, ArrayType):
        return F.transform(c, lambda x: _restore_expr(x, dt.elementType))
    if isinstance(dt, MapType):
        return F.transform_values(
            c, lambda _, x: _restore_expr(x, dt.valueType)
        )
    return c


# ---- external (Avro JSON) writer schemas ------------------------------------
#
# ``from_avro`` below also accepts writer schemas as **Avro JSON strings** —
# the form a Confluent registry hands back for frames produced by OTHER
# writers. Such schemas use the spec's full surface, not just this module's
# own everything-is-a-nullable-union convention: plain (non-union) fields,
# ``enum`` (→ symbol string), ``fixed`` (→ binary), named-type references,
# and the millis-precision logical types. The parser builds a binary decoder
# straight from the JSON (same closure style as ``_dec_for``) plus the
# equivalent Spark type, so ``_resolution_map`` resolves external datums to
# the reader schema with the same spec rules as internal ones.


def _json_decoder(node, names: dict | None = None):
    """Avro JSON schema node → ``(decoder, spark_type)``.

    ``decoder(buf, off) -> (value, off)`` decodes exactly what the schema
    declares (no implicit union wrapper). ``spark_type`` is the Spark
    equivalent used for schema resolution: enum → string, fixed → binary,
    ``["null", T]`` union → T; decimal/date/timestamp logical types map to
    their typed Spark forms with the decoder normalizing values (millis →
    micros, unscaled bytes → exact Decimal) so downstream code sees one
    canonical shape. Unions with more than one non-null branch follow the
    public Spark Avro connector's mapping: ``[int, long]`` collapses to
    long and ``[float, double]`` to double (with or without a null
    branch); any other mix surfaces as a ``member0``/``member1``/…
    struct, one nullable field per non-null branch in declaration order,
    with exactly the selected branch's field set per datum."""
    names = {} if names is None else names
    if isinstance(node, str):
        if node in names:
            if names[node] is _OPEN_RECORD:
                # a self-reference while the record's own fields are still
                # being parsed = a recursive schema. Spec-legal Avro, but
                # Spark's type system has no recursive StructType, so the
                # frame could never surface as a DataFrame column — reject
                # with the real reason, not "unknown type reference"
                # (final sweep r5)
                raise ValueError(
                    f"avro json schema: record {node!r} references itself; "
                    "recursive schemas cannot map to Spark's (non-recursive)"
                    " struct types"
                )
            return names[node]
        prim = {
            "null": (lambda buf, off: (None, off), None),
            "boolean": (lambda buf, off: (bool(buf[off]), off + 1), BooleanType()),
            "int": (_zigzag_decode, IntegerType()),
            "long": (_zigzag_decode, LongType()),
            "float": (
                lambda buf, off: (struct.unpack_from("<f", buf, off)[0], off + 4),
                FloatType(),
            ),
            "double": (
                lambda buf, off: (struct.unpack_from("<d", buf, off)[0], off + 8),
                DoubleType(),
            ),
            "bytes": (_dec_for(BinaryType()), BinaryType()),
            "string": (_dec_for(StringType()), StringType()),
        }
        if node in prim:
            return prim[node]
        raise ValueError(f"avro json schema: unknown type reference {node!r}")
    if isinstance(node, list):  # union
        branches = [_json_decoder(b, names) for b in node]
        non_null = [(i, d, t) for i, (d, t) in enumerate(branches) if t is not None]
        decs = [d for d, _ in branches]

        def dec_union(buf, off):
            ix, off = _zigzag_decode(buf, off)
            return decs[ix](buf, off)

        if len(non_null) == 0:
            raise ValueError("avro json schema: union has no non-null branch")
        if len(non_null) == 1:
            return dec_union, non_null[0][2]
        # multi-branch unions, per the public Spark Avro connector's
        # mapping: the numeric-widening pairs collapse to the wider type
        # (every branch's decoded Python value is already valid there);
        # everything else becomes a memberN struct
        kinds = sorted(t.simpleString() for _, _, t in non_null)
        if kinds == ["bigint", "int"]:
            return dec_union, LongType()
        if kinds == ["double", "float"]:
            return dec_union, DoubleType()
        members = [
            (f"member{k}", i, t) for k, (i, _, t) in enumerate(non_null)
        ]
        stype = StructType(
            [StructField(name, t, True) for name, _, t in members]
        )
        field_of = {i: name for name, i, _ in members}
        mnames = [name for name, _, _ in members]

        def dec_union_struct(buf, off):
            ix, off = _zigzag_decode(buf, off)
            v, off = decs[ix](buf, off)
            sel = field_of.get(ix)
            if sel is None:  # the null branch: the whole union is null
                return None, off
            return {name: (v if name == sel else None) for name in mnames}, off

        return dec_union_struct, stype
    t = node["type"]
    logical = node.get("logicalType")
    if logical == "decimal" and t in ("bytes", "fixed"):
        scale = node.get("scale", 0)
        precision = node.get("precision", 38)
        if t == "fixed":
            size = node["size"]

            def dec_dec_fixed(buf, off):
                unscaled = int.from_bytes(buf[off:off + size], "big", signed=True)
                return _exact_decimal(unscaled, scale), off + size

            dec = dec_dec_fixed
        else:
            dec = _dec_for(DecimalType(precision, scale))
        return dec, DecimalType(precision, scale)
    if logical == "date" and t == "int":
        return _dec_for(DateType()), DateType()
    if logical in ("timestamp-micros", "timestamp-millis") and t == "long":
        if logical == "timestamp-millis":
            def dec_ts_ms(buf, off):
                v, off = _zigzag_decode(buf, off)
                return v * 1000, off  # canonical transport is UTC micros
            return dec_ts_ms, TimestampType()
        return _zigzag_decode, TimestampType()
    if logical == "time-millis" and t == "int":
        # no dedicated Spark type: times ride as longs, but normalized to
        # the module's canonical micros-past-midnight (``typeconv.
        # time_micros``) so a millis writer and a micros reader agree
        def dec_time_ms(buf, off):
            v, off = _zigzag_decode(buf, off)
            return v * 1000, off

        return dec_time_ms, LongType()
    if logical in ("time-micros", "uuid"):
        # time-micros already matches the canonical unit; uuid rides as
        # its string
        base, st = _json_decoder(t, names)
        return base, st
    if t == "record":
        # mark the name OPEN before parsing fields so a self-reference is
        # diagnosed as recursion (see the string branch) instead of falling
        # through to "unknown type reference"
        open_names = [node.get("name")]
        if node.get("name") and node.get("namespace"):
            open_names.append(f"{node['namespace']}.{node['name']}")
        for rn in open_names:
            if rn:
                names[rn] = _OPEN_RECORD
        fdecs = [
            (f["name"], _json_decoder(f["type"], names))
            for f in node["fields"]
        ]
        stype = StructType(
            [StructField(n, st, True) for n, (_, st) in fdecs]
        )

        def dec_rec(buf, off):
            out = {}
            for name, (fd, _) in fdecs:
                out[name], off = fd(buf, off)
            return out, off

        pair = (dec_rec, stype)
        if node.get("name"):
            names[node["name"]] = pair
            if node.get("namespace"):
                names[f"{node['namespace']}.{node['name']}"] = pair
        return pair
    if t == "enum":
        symbols = list(node["symbols"])

        def dec_enum(buf, off):
            ix, off = _zigzag_decode(buf, off)
            return symbols[ix], off

        pair = (dec_enum, StringType())
        if node.get("name"):
            names[node["name"]] = pair
        return pair
    if t == "fixed":
        size = node["size"]

        def dec_fixed(buf, off):
            return bytes(buf[off:off + size]), off + size

        pair = (dec_fixed, BinaryType())
        if node.get("name"):
            names[node["name"]] = pair
        return pair
    if t == "array":
        ed, et = _json_decoder(node["items"], names)

        def dec_arr(buf, off):
            out = []
            while True:
                n, off = _zigzag_decode(buf, off)
                if n == 0:
                    return out, off
                if n < 0:
                    n = -n
                    _, off = _zigzag_decode(buf, off)
                for _ in range(n):
                    v, off = ed(buf, off)
                    out.append(v)

        return dec_arr, ArrayType(et, True)
    if t == "map":
        vd, vt = _json_decoder(node["values"], names)

        def dec_map(buf, off):
            out = {}
            while True:
                n, off = _zigzag_decode(buf, off)
                if n == 0:
                    return out, off
                if n < 0:
                    n = -n
                    _, off = _zigzag_decode(buf, off)
                for _ in range(n):
                    kl, off = _zigzag_decode(buf, off)
                    k = buf[off:off + kl].decode("utf-8")
                    off += kl
                    out[k], off = vd(buf, off)

        return dec_map, MapType(StringType(), vt, True)
    # {"type": <str|list|dict>} wrapper form — includes the spec rule that
    # an UNKNOWN logicalType annotation is ignored and the base type used
    return _json_decoder(t, names)


def schema_id_of_json(schema_json: str) -> int:
    """Deterministic id for an EXTERNAL Avro JSON schema — the same
    extended-PCF fingerprint ``schema_id`` computes for internal
    StructTypes, so a registry-less deployment gets consistent ids across
    both forms. Frames carrying a registry-assigned id register with an
    explicit ``(schema_json, id)`` pair instead."""
    canonical = json.dumps(
        _pcf(json.loads(schema_json)), separators=(",", ":")
    )
    return int.from_bytes(hashlib.sha256(canonical.encode()).digest()[:4], "big")


#: writer-type → reader-type promotions the Avro spec's schema-resolution
#: rules allow ("Schema Resolution" in the 1.11 spec), with the Python-side
#: value mapping for each (None = the decoded value is already right)
_PROMOTIONS = {
    ("int", "bigint"): None,
    ("int", "float"): float,
    ("int", "double"): float,
    ("bigint", "float"): float,
    ("bigint", "double"): float,
    ("float", "double"): None,
    ("string", "binary"): lambda v: v.encode("utf-8"),
    ("binary", "string"): lambda v: v.decode("utf-8"),
    # logical-type (re-)annotation over the same underlying type: Avro 1.11
    # resolution proceeds on the UNDERLYING types (logical annotations are
    # ignored), so annotating an existing long column as timestamp-micros —
    # the exact evolution the extended-PCF id doc calls out — must decode
    # old frames under the registered writer (final sweep r5). Timestamps
    # transport as raw micros longs (identity); dates decode to
    # ``datetime.date`` so the int↔date pairs shift at the epoch.
    ("bigint", "timestamp"): None,
    ("timestamp", "bigint"): None,
    ("int", "timestamp"): None,  # int→long promotion + annotation
    ("int", "date"): lambda v: _EPOCH_DATE + datetime.timedelta(days=v),
    ("date", "int"): lambda v: (v - _EPOCH_DATE).days,
    ("date", "bigint"): lambda v: (v - _EPOCH_DATE).days,
}


def _resolution_map(writer: DataType, reader: DataType,
                    aliases: dict | None = None):
    """Value remapper taking a datum decoded under ``writer`` into the
    shape ``reader`` expects, per the public spec's schema-resolution rules
    (Avro 1.11, "Schema Resolution"):

    - record fields match by NAME, so reordering is free;
    - a reader field with no same-name writer field matches a writer field
      named by one of its ``aliases`` (the spec's rename rule; here the
      alias sets ride in as ``{reader_field: [old_names, ...]}`` because
      the reader schema is a Spark StructType, which has no alias slot —
      the engine's manifest rename ledger has exactly this shape);
    - writer-only fields are discarded (the spec's "skipped");
    - reader-only fields take their default — every field this module emits
      is a ``["null", T]`` union with an explicit ``"default": null``
      (see ``avro_schema_json``), so the fill is null;
    - primitive promotions per ``_PROMOTIONS``.

    ``aliases`` applies at every record nesting depth (a per-path form
    would mirror the spec exactly, but rename ledgers are per-table flat
    name maps and payload fields only nest under before/after, where the
    same names recur by construction).

    Returns None when the decoded value is already reader-shaped (identity
    — the common no-evolution case costs nothing), a value callable
    otherwise. Raises on unresolvable writer/reader type pairs, like the
    spec requires."""
    if isinstance(reader, StructType) and isinstance(writer, StructType):
        wmap = {f.name: f for f in writer.fields}
        plan = []
        identity = [f.name for f in writer.fields] == [f.name for f in reader.fields]
        for rf in reader.fields:
            wf, src = wmap.get(rf.name), rf.name
            if wf is None and aliases:
                # first declared alias present in the writer wins (spec:
                # aliases are an ordered list on the reader field)
                for a in aliases.get(rf.name, ()):
                    if a in wmap:
                        wf, src = wmap[a], a
                        identity = False
                        break
            if wf is None:
                plan.append((rf.name, None, None))
                identity = False
            else:
                m = _resolution_map(wf.dataType, rf.dataType, aliases)
                plan.append((rf.name, src, m))
                identity = identity and m is None
        if identity:
            return None

        def remap(v):
            if v is None:
                return None
            return {
                name: (
                    (m(v[src]) if m is not None and v[src] is not None else v[src])
                    if src is not None
                    else None
                )
                for name, src, m in plan
            }

        return remap
    if isinstance(writer, ArrayType) and isinstance(reader, ArrayType):
        m = _resolution_map(writer.elementType, reader.elementType, aliases)
        if m is None:
            return None
        return lambda v: (
            None if v is None
            else [m(x) if x is not None else None for x in v]
        )
    if isinstance(writer, MapType) and isinstance(reader, MapType):
        m = _resolution_map(writer.valueType, reader.valueType, aliases)
        if m is None:
            return None
        return lambda v: (
            None if v is None
            else {k: m(x) if x is not None else None for k, x in v.items()}
        )
    if isinstance(writer, BinaryType) and isinstance(reader, DecimalType):
        # annotating an existing bytes column as decimal: the wire bytes
        # ARE the two's-complement unscaled int, so interpret them under
        # the reader's scale (the id changes with the annotation — review
        # r5 — and the old frames decode via this writer registration)
        scale = reader.scale
        return lambda v: _exact_decimal(
            int.from_bytes(v, "big", signed=True), scale
        )
    if isinstance(writer, DecimalType) and isinstance(reader, DecimalType):
        # the decoded value is an EXACT self-describing Decimal (writer
        # scale already applied), so any decimal→decimal read is identity:
        # precision widening is free (precision never reaches the wire),
        # and a scale change is handled by the decode, not a remap. Strict
        # simpleString equality wedged decimal(10,2)→decimal(12,2) at
        # registration (review r5). A value exceeding the reader's
        # precision fails loudly at the Arrow conversion.
        return None
    wt, rt = writer.simpleString(), reader.simpleString()
    if wt == rt:
        return None
    try:
        return _PROMOTIONS[(wt, rt)]
    except KeyError:
        raise ValueError(
            f"avro schema resolution: writer type {wt} cannot be read as {rt}"
        ) from None


def from_avro(
    frames: DataFrame,
    schema: StructType,
    col: str = "avro",
    writer_schemas: list[StructType] | None = None,
    aliases: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Avro frames → typed rows under ``schema`` (the reader schema).
    Verifies the frame header (magic + schema id).

    ``writer_schemas``: additional schemas frames in this stream may have
    been WRITTEN with (e.g. the pre-evolution envelope schemas out of the
    schema history). Each entry is a StructType — registered under its
    computed ``schema_id`` — or an **Avro JSON string** (the form a schema
    registry returns for frames produced by external writers: plain
    non-union fields, enum → symbol string, fixed → binary, named-type
    refs, timestamp-millis → micros), or a ``(schema, id)`` pair of either
    form registering an EXPLICIT header id (frames at rest under a
    registry-assigned or legacy-fingerprint id; review r5: without this
    there was no way to decode frames whose embedded id predates an
    id-scheme change). Each
    frame dispatches on its embedded Confluent schema id to the matching
    writer decoder, then resolves to the reader schema per the spec's
    schema-resolution rules (``_resolution_map``: fields match by name,
    reader-added fields take their null default, writer-only fields are
    skipped, primitives promote, renamed fields match through ``aliases``
    = ``{current_name: [old_names, ...]}`` — the spec's reader-field
    aliases, surfaced as an argument because Spark StructTypes carry no
    alias slot) — exactly what the reference delegates to
    the Confluent Avro deserializer's writer-vs-reader resolution (fork
    ``README.md:393``), re-implemented here because the codec is
    from-spec. A frame whose id matches none of the known schemas still
    fails loudly.

    Float/double fields — at EVERY nesting depth, not just top level
    (review r4: the envelope path nests all payload values under
    before/after, where the original top-level-only fix didn't reach) —
    travel back as canonical strings and cast JVM-side: pyarrow's
    object-array conversion treats a Python float('nan') as a NULL, so a
    decoded IEEE NaN would otherwise silently become null on the way back
    into Spark (the mirror image of the to_avro transport rule)."""
    # sid → (writer decoder, writer→reader value remapper) — built ONCE on
    # the driver, closed over into the Arrow codec (no per-row dispatch
    # beyond one dict lookup)
    codecs: dict[int, tuple] = {schema_id(schema): (_dec_for(schema), None)}
    for w in writer_schemas or []:
        w, sid = w if isinstance(w, tuple) else (w, None)
        if isinstance(w, str):  # external Avro JSON writer schema
            dec, stype = _json_decoder(json.loads(w))
            if not isinstance(stype, StructType):
                raise ValueError(
                    "avro json writer schema: top level must be a record"
                )
            codecs.setdefault(
                sid if sid is not None else schema_id_of_json(w),
                (dec, _resolution_map(stype, schema, aliases)),
            )
            continue
        w = StructType(w.fields)
        codecs.setdefault(
            sid if sid is not None else schema_id(w),
            (_dec_for(w), _resolution_map(w, schema, aliases)),
        )
    transports = {
        f.name: _transport_type(f.dataType) for f in schema.fields
    }
    ddl = ", ".join(
        f"`{f.name}` {(transports[f.name] or f.dataType).simpleString()}"
        for f in schema.fields
    )
    touched = [f for f in schema.fields if transports[f.name] is not None]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf[col]:
                buf = bytes(buf)
                if buf[:1] != MAGIC:
                    raise ValueError("bad avro frame: missing magic byte")
                sid = int.from_bytes(buf[1:5], "big")
                pair = codecs.get(sid)
                if pair is None:
                    raise ValueError(
                        f"avro schema id mismatch: frame {sid} is not the "
                        f"reader schema or any declared writer schema "
                        f"({sorted(codecs)})"
                    )
                dec, remap = pair
                rec, _ = dec(buf, 5)
                if remap is not None:
                    rec = remap(rec)
                for f in touched:
                    rec[f.name] = _transport_value(rec.get(f.name), f.dataType)
                rows.append(rec)
            # dtype=object keeps decoded longs as exact Python ints —
            # pandas would otherwise infer float64 for an int column with
            # any None, rounding values above 2^53 in the Arrow cast back
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields], dtype=object
            )

    out = frames.mapInPandas(decode, schema=ddl)
    if touched:
        # field-wise restore: float strings cast back, timestamp
        # micro-strings rebuild via timestamp_micros, structs recurse
        out = out.select(
            *[
                _restore_expr(F.col(f.name), f.dataType).alias(f.name)
                if transports[f.name] is not None else F.col(f.name)
                for f in schema.fields
            ]
        )
    return out


def envelope_to_avro(env: DataFrame) -> DataFrame:
    """Typed CDC envelope → Avro frames (the converter the reference wires
    as its default value.converter). Nested before/after/source/transaction
    records ride as nullable unions."""
    return to_avro(env, ["before", "after", "op", "ts_ms", "source", "transaction"])


def avro_to_envelope(
    frames: DataFrame,
    payload: StructType,
    writer_payloads: list[StructType] | None = None,
    renames: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Avro frames → typed envelope under one table's payload schema.

    ``writer_payloads``: earlier payload schemas this stream's frames may
    have been written with (schema evolution mid-stream) — resolved to the
    current ``payload`` per the Avro schema-resolution rules; the CDC
    schema-evolution story applied to the wire format (VERDICT r4 #3).

    ``renames``: ``{current_column: [former_names, ...]}`` — the lake
    table's manifest rename ledger (``LakeTable`` manifests carry exactly
    this map), forwarded as reader-field aliases so frames written before
    an ``ALTER TABLE ... RENAME COLUMN`` still decode into the renamed
    column instead of null-filling it. The payload fields nest under
    before/after, where ``_resolution_map`` applies aliases at depth."""
    from debezium_spark.schema import envelope_schema

    env_schema = envelope_schema(payload)
    writers = [
        StructType(envelope_schema(p).fields) for p in writer_payloads or []
    ]
    out = from_avro(
        frames, StructType(env_schema.fields), writer_schemas=writers,
        aliases=renames,
    )
    return out.select("before", "after", "op", "ts_ms", "source", "transaction")


__all__ = [
    "avro_schema_json",
    "avro_to_envelope",
    "envelope_to_avro",
    "from_avro",
    "schema_id",
    "schema_id_of_json",
    "to_avro",
]
