"""Binary wire-format codec — the pgoutput/mppdb decoder analog.

The reference decodes PostgreSQL's binary logical-replication wire format in
``debezium-connector-postgres/.../pgoutput/PgOutputMessageDecoder.java``
(777 LoC: tag byte, big-endian ints, length-prefixed tuple data) and the
openGauss mppdb variant. This module implements the same shape for the
engine's envelope: a compact length-prefixed binary frame per change event,
encoded/decoded by **Arrow-batched ``mapInPandas``** — binary codecs are the
one place the SURVEY §2.1 plan allows Python, and the batch-vectorized
loop (bytes in a pandas column, no Spark row objects) keeps it off the
row-at-a-time path. The frames never visit the driver.

Frame layout v2 (big-endian, deliberately pgoutput-like):

    magic  'D'    (1 byte)
    version 0x02  (1 byte; v1 frames carried the op ASCII byte here, which
                   is never 0x02, so both versions decode side by side)
    pos / ts_ms / source.ts_ms /
    tx.total_order / tx.data_collection_order   (5 × i64; i64-min = null)
    op / file / db / table / gtid / snapshot / tx.id
                  (u16 length + UTF-8 each; 0xFFFF = null — null and ''
                   stay DISTINCT so a null file keeps quarantining as
                   null_offset instead of laundering to '' and poisoning
                   the file-major fence; review r5)
    before        (u32 length + UTF-8 JSON, 0xFFFFFFFF = null)
    after         (u32 length + UTF-8 JSON, 0xFFFFFFFF = null)

``op`` is length-prefixed (not one byte) because the fork's op codes
include the two-character ``tc``/``ts`` (schema.py §1.1) and the poison
contract requires an arbitrary malformed op string to ride the wire into
quarantine rather than abort the Arrow task (review r5: ``ord(op)`` wedged
on both). Payload tuples ride as JSON (pgoutput likewise sends tuple data
as typed text); per-table typed parsing happens downstream via
``from_json`` exactly as in the multi-table wire path.

Value exactness: long columns cross the Arrow/pandas boundary as STRINGS
on encode and as object-dtype Python ints on decode — a pandas int64
column holding one null goes float64 and silently rounds values above 2^53
(PG LSN-scale offsets; the same transport rule as ``functions/avro.py``).
A frame that fails to parse (bad magic, truncated tail, invalid UTF-8)
decodes to an all-null poison row — op null ⇒ ``unknown_op`` — so one
corrupt frame reaches quarantine instead of failing the batch, symmetric
with the encoder's sentinel rule.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MAGIC = ord("D")
VERSION = 2
_NULL = 0xFFFFFFFF
_NULL_STR = 0xFFFF
#: sentinel for a null long on the wire — decodes back to NULL so the
#: engine's quarantine validity rules (null offset = poison) see the record
#: intact instead of the encoder aborting the whole Arrow task
_NULL_I64 = -(1 << 63)

#: the long and string fields of a frame, in wire order (after the fixed
#: header); decode emits them under these names plus before/after
_I64_FIELDS = ("pos", "ts_ms", "src_ts_ms", "tx_total_order", "tx_dco")
_STR_FIELDS = ("op", "file", "db", "table", "gtid", "snapshot", "tx_id")
_COLUMNS = list(_I64_FIELDS) + list(_STR_FIELDS) + ["before_json", "after_json"]
_POISON = (None,) * len(_COLUMNS)


#: string slots whose value is metadata, not identity: a ≥64 KiB value here
#: (a GTID set from a many-UUID topology can legitimately blow the u16 cap)
#: drops ONLY that field to null, preserving the event. op/file/db/table
#: are structural — an oversized value there IS corruption and the frame
#: degrades to poison (final review r5: the old contract poisoned the whole
#: frame for any oversized slot, silently losing valid change events).
_DROPPABLE_STR = frozenset({"gtid", "snapshot", "tx_id"})


def _pack_one(longs: tuple, strs: tuple, before: str | None,
              after: str | None) -> bytes:
    """One event → one frame. A structural identifier field (op/file/db/
    table) that exceeds the u16 length cap is upstream corruption and
    encodes as the ALL-NULL poison frame — the row rides into quarantine as
    unknown_op, same as a decode-side corrupt frame; raising here would
    abort the Arrow task and crash-loop the batch on retry. An oversized
    METADATA field (gtid/snapshot/tx_id — see ``_DROPPABLE_STR``) nulls
    only itself: the change event survives intact minus that annotation."""
    out = [struct.pack(
        ">BB5q", MAGIC, VERSION,
        *[_NULL_I64 if v is None else v for v in longs],
    )]
    for name, s in zip(_STR_FIELDS, strs):
        if s is None:
            out.append(struct.pack(">H", _NULL_STR))
            continue
        b = s.encode("utf-8")
        if len(b) >= _NULL_STR:
            if name in _DROPPABLE_STR:
                out.append(struct.pack(">H", _NULL_STR))
                continue
            return _pack_one((None,) * len(_I64_FIELDS),
                             (None,) * len(_STR_FIELDS), None, None)
        out.append(struct.pack(">H", len(b)))
        out.append(b)
    for s in (before, after):
        if s is None:
            out.append(struct.pack(">I", _NULL))
        else:
            b = s.encode("utf-8")
            out.append(struct.pack(">I", len(b)))
            out.append(b)
    return b"".join(out)


def _unpack_one(buf: bytes) -> tuple:
    """One frame → the ``_COLUMNS`` tuple. v2 frames decode in full; v1
    frames (op byte where v2 has its version byte) decode with their
    narrower field set; anything unparseable returns the all-null poison
    tuple (op null ⇒ unknown_op ⇒ quarantine downstream)."""
    try:
        if buf[0] != MAGIC:
            return _POISON
        if buf[1] != VERSION:
            return _unpack_v1(buf)
        longs = [
            None if v == _NULL_I64 else v
            for v in struct.unpack_from(">5q", buf, 2)
        ]
        off = 42
        strs: list[str | None] = []
        for _ in _STR_FIELDS:
            (n,) = struct.unpack_from(">H", buf, off)
            off += 2
            if n == _NULL_STR:
                strs.append(None)
            else:
                strs.append(buf[off:off + n].decode("utf-8"))
                off += n
        jsons: list[str | None] = []
        for _ in range(2):
            (n,) = struct.unpack_from(">I", buf, off)
            off += 4
            if n == _NULL:
                jsons.append(None)
            else:
                jsons.append(buf[off:off + n].decode("utf-8"))
                off += n
        # exact-length gate: a frame truncated MID-STRING doesn't raise
        # (Python slices shorten silently) — it would decode to a silently
        # clipped value. Length prefixes fix the true size, so any surplus
        # or deficit means corruption ⇒ poison, same as a parse failure.
        if off != len(buf):
            return _POISON
        return (*longs, *strs, *jsons)
    except (IndexError, struct.error, UnicodeDecodeError):
        return _POISON


def _unpack_v1(buf: bytes) -> tuple:
    """Legacy v1 frames at rest: magic, op byte (0 = null), pos, ts_ms,
    file/db/table (u16, '' for null), before/after (u32, 0xFFFFFFFF null).
    v1 carried no source.ts_ms/gtid/snapshot/transaction — those decode
    null rather than fabricated (review r5: v1's decoder used to substitute
    the envelope ts_ms into source.ts_ms, silently changing a value)."""
    magic, opb, pos, ts_ms = struct.unpack_from(">BBqq", buf, 0)
    off = 18
    strs = []
    for _ in range(3):
        (n,) = struct.unpack_from(">H", buf, off)
        off += 2
        strs.append(buf[off:off + n].decode("utf-8"))
        off += n
    jsons: list[str | None] = []
    for _ in range(2):
        (n,) = struct.unpack_from(">I", buf, off)
        off += 4
        if n == _NULL:
            jsons.append(None)
        else:
            jsons.append(buf[off:off + n].decode("utf-8"))
            off += n
    if off != len(buf):  # same mid-string truncation gate as v2
        return _POISON
    return (
        None if pos == _NULL_I64 else pos, ts_ms, None, None, None,
        None if opb == 0 else chr(opb), strs[0], strs[1], strs[2],
        None, None, None, jsons[0], jsons[1],
    )


def encode_binary_wire(env: DataFrame) -> DataFrame:
    """Typed envelope → one binary frame per event (column ``frame``),
    via Arrow-batched mapInPandas (the encoder half of the decoder pair).
    Long fields travel to the codec as strings (exactness above 2^53 when
    a sibling null would otherwise force float64 — see module doc)."""
    flat = env.select(
        "op",
        F.col("source.pos").cast("string").alias("pos"),
        F.col("ts_ms").cast("string").alias("ts_ms"),
        F.col("source.ts_ms").cast("string").alias("src_ts_ms"),
        F.col("source.file").alias("file"),
        F.col("source.db").alias("db"),
        F.col("source.table").alias("table"),
        F.col("source.gtid").alias("gtid"),
        F.col("source.snapshot").alias("snapshot"),
        F.col("transaction.id").alias("tx_id"),
        F.col("transaction.total_order").cast("string").alias("tx_total_order"),
        F.col("transaction.data_collection_order").cast("string").alias("tx_dco"),
        F.when(F.col("before").isNotNull(), F.to_json("before")).alias("before_json"),
        F.when(F.col("after").isNotNull(), F.to_json("after")).alias("after_json"),
    )

    def _i(v):
        return None if v is None or (isinstance(v, float) and pd.isna(v)) else int(v)

    def _s(v):
        return None if v is None or (isinstance(v, float) and pd.isna(v)) else v

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null op/pos/ts arrive as None in object columns: sentinel-
            # encode instead of aborting the task — one malformed envelope
            # must reach the sink-side quarantine, not fail the batch (same
            # poison-record contract as operators/quarantine.validity_reason)
            frames = [
                _pack_one(
                    (_i(r.pos), _i(r.ts_ms), _i(r.src_ts_ms),
                     _i(r.tx_total_order), _i(r.tx_dco)),
                    (_s(r.op), _s(r.file), _s(r.db), _s(r.table),
                     _s(r.gtid), _s(r.snapshot), _s(r.tx_id)),
                    _s(r.before_json), _s(r.after_json),
                )
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame({"frame": frames})

    return flat.mapInPandas(enc, schema="frame binary")


def decode_binary_wire(frames: DataFrame, payload: StructType) -> DataFrame:
    """Binary frames → typed envelope under ``payload``. The Python half
    only splits the frame (struct unpack, vectorized per Arrow batch); the
    typed payload parse stays JVM-side (``from_json``). Unparseable frames
    become all-null poison rows (module doc), never a task failure."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_unpack_one(bytes(b)) for b in pdf["frame"]]
            # dtype=object keeps decoded longs exact Python ints: pandas
            # would infer float64 for an int column holding any None,
            # rounding offsets above 2^53 in the Arrow cast back
            yield pd.DataFrame(rows, columns=_COLUMNS, dtype=object)

    wire = frames.mapInPandas(
        dec,
        schema="pos long, ts_ms long, src_ts_ms long, tx_total_order long,"
               " tx_dco long, op string, file string, db string, table string,"
               " gtid string, snapshot string, tx_id string,"
               " before_json string, after_json string",
    )
    return wire.select(
        F.from_json("before_json", payload).alias("before"),
        F.from_json("after_json", payload).alias("after"),
        "op",
        "ts_ms",
        F.struct(
            F.col("file"),
            F.col("pos"),
            F.col("gtid"),
            F.col("snapshot"),
            F.col("db"),
            F.col("table"),
            F.col("src_ts_ms").alias("ts_ms"),
        ).alias("source"),
        # a null transaction struct stays null, not a struct of nulls
        F.when(
            F.col("tx_id").isNotNull()
            | F.col("tx_total_order").isNotNull()
            | F.col("tx_dco").isNotNull(),
            F.struct(
                F.col("tx_id").alias("id"),
                F.col("tx_total_order").alias("total_order"),
                F.col("tx_dco").alias("data_collection_order"),
            ),
        ).alias("transaction"),
    )
