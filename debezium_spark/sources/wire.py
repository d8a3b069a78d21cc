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

Frame layout (big-endian, deliberately pgoutput-like):

    magic  'D'  (1 byte)
    op          (1 byte ASCII: r/c/u/d/t/l)
    pos         (8 bytes)
    ts_ms       (8 bytes)
    file        (u16 length + UTF-8)
    db          (u16 length + UTF-8)
    table       (u16 length + UTF-8)
    before      (u32 length + UTF-8 JSON, 0xFFFFFFFF = null)
    after       (u32 length + UTF-8 JSON, 0xFFFFFFFF = null)

Payload tuples ride as JSON (pgoutput likewise sends tuple data as typed
text); per-table typed parsing happens downstream via ``from_json`` exactly
as in the multi-table wire path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

MAGIC = ord("D")
_NULL = 0xFFFFFFFF
#: sentinel for a null source offset on the wire — decodes back to a NULL
#: pos so the engine's quarantine validity rules (null offset = poison) see
#: the record intact instead of the encoder aborting the whole Arrow task
_NULL_POS = -(1 << 63)
#: sentinel op byte for a NULL op (same poison-record contract: ord(None)
#: would abort the whole Arrow task; decode restores None and the null-safe
#: validity rule routes the record to quarantine as unknown_op)
_NULL_OP = 0


def _pack_one(op: str, pos: int, ts_ms: int, file: str, db: str, table: str,
              before: str | None, after: str | None) -> bytes:
    out = [struct.pack(
        ">BBqq", MAGIC, _NULL_OP if op is None else ord(op), pos,
        ts_ms if ts_ms is not None else 0,
    )]
    for s in (file or "", db or "", table or ""):
        b = s.encode("utf-8")
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
    magic, opb, pos, ts_ms = struct.unpack_from(">BBqq", buf, 0)
    if magic != MAGIC:
        raise ValueError("bad wire frame magic")
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
    return (None if opb == _NULL_OP else chr(opb),
            None if pos == _NULL_POS else pos, ts_ms,
            strs[0], strs[1], strs[2], jsons[0], jsons[1])


def encode_binary_wire(env: DataFrame) -> DataFrame:
    """Typed envelope → one binary frame per event (column ``frame``),
    via Arrow-batched mapInPandas (the encoder half of the decoder pair)."""
    flat = env.select(
        "op",
        F.col("source.pos").alias("pos"),
        F.coalesce(F.col("ts_ms"), F.lit(0)).alias("ts_ms"),
        F.col("source.file").alias("file"),
        F.col("source.db").alias("db"),
        F.col("source.table").alias("table"),
        F.when(F.col("before").isNotNull(), F.to_json("before")).alias("before_json"),
        F.when(F.col("after").isNotNull(), F.to_json("after")).alias("after_json"),
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null pos/ts_ms arrive as pandas NaN: sentinel-encode instead of
            # int(NaN) aborting the task — one malformed envelope must reach
            # the sink-side quarantine, not fail the batch (same poison-record
            # contract as operators/quarantine.validity_reason)
            frames = [
                _pack_one(None if pd.isna(r.op) else r.op,
                          _NULL_POS if pd.isna(r.pos) else int(r.pos),
                          0 if pd.isna(r.ts_ms) else int(r.ts_ms),
                          r.file, r.db, r.table,
                          None if pd.isna(r.before_json) else r.before_json,
                          None if pd.isna(r.after_json) else r.after_json)
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame({"frame": frames})

    return flat.mapInPandas(enc, schema="frame binary")


def decode_binary_wire(frames: DataFrame, payload: StructType) -> DataFrame:
    """Binary frames → typed envelope under ``payload``. The Python half
    only splits the frame (struct unpack, vectorized per Arrow batch); the
    typed payload parse stays JVM-side (``from_json``)."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_unpack_one(bytes(b)) for b in pdf["frame"]]
            yield pd.DataFrame(
                rows,
                columns=["op", "pos", "ts_ms", "file", "db", "table",
                         "before_json", "after_json"],
            )

    wire = frames.mapInPandas(
        dec,
        schema="op string, pos long, ts_ms long, file string, db string,"
               " table string, before_json string, after_json string",
    )
    return wire.select(
        F.from_json("before_json", payload).alias("before"),
        F.from_json("after_json", payload).alias("after"),
        "op",
        "ts_ms",
        F.struct(
            F.col("file"),
            F.col("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.col("db"),
            F.col("table"),
            F.col("ts_ms").alias("ts_ms"),
        ).alias("source"),
        F.lit(None).cast(
            "struct<id:string,total_order:bigint,data_collection_order:bigint>"
        ).alias("transaction"),
    )
