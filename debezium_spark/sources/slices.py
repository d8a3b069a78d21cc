"""CSV-slice full-migration transport — the openGauss-fork envelope
extension for moving whole tables.

The fork extends the Debezium envelope with full-migration fields
(``debezium-core/.../data/Envelope.java:126-148``: ``csv`` — the slice
content/location, ``msgType`` — full data / metadata / eof, ``index`` —
slice index, ``totalSlice``, ``sliceSize``, ``snapshot``) and its migration
tool ships each source table as CSV slices over those messages. This module
is the Spark-first analog:

- ``export_csv_slices``: rows → slice records, each carrying its rows as
  an ARRAY of CSV record strings plus the slice metadata, bracketed by a
  ``metadata`` header record (schema DDL) and an ``eof`` trailer — the
  fork's message framing. (The fork ships a csv FILE; carrying the records
  as an array instead of one newline-joined block is the Spark-native
  adaptation — values may legally contain quoted newlines, so a joined
  block would need CSV-aware re-framing at load.)
  100 TB shape: slice assignment is by **key hash**, not a sequential row
  number (a global row_number would funnel the table through one task);
  every slice is a deterministic key subset of ~``slice_size`` rows, the
  per-slice CSV assembles with a partial-aggregable ``collect_list`` +
  ``array_sort`` (deterministic bytes), and nothing visits the driver.
- ``load_csv_slices``: slice records → typed rows via ``explode`` +
  ``from_csv`` under the declared schema — all Catalyst, parallel per
  slice, verified complete against the eof record (slice count + row
  count) before any row loads.

Round-trip is exact: load(export(df)) ≡ df (oracle-checked,
``csv_slice_roundtrip``). The engine boots the loaded rows with the usual
fence-pinned ``CdcEngine.bootstrap`` (tools/full_migration.py drives the
whole snapshot→slices→load→stream path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: msgType values (Envelope.java:132 "full data, incremental data,
#: metadata and eof")
MSG_FULL = "full"
MSG_METADATA = "metadata"
MSG_EOF = "eof"

_SLICE_COLS = ["msgType", "index", "totalSlice", "sliceSize", "csv", "schema_ddl"]

#: CSV null sentinel (the MySQL LOAD DATA convention). Spark's default
#: options collapse empty string and NULL into one token, so a migrated
#: empty-string value (e.g. an empty file's content — whose sha256 is the
#: north-rule invariant) silently became NULL on load (review r4). With the
#: sentinel, '' round-trips as quoted "" and NULL as \N; the one remaining
#: ambiguity — a real cell value of backslashes+N — is removed by an
#: injective escape (export prefixes one more backslash, load strips it).
_CSV_OPTS = {"nullValue": "\\N"}
_NULLISH = r"^\\+N$"        # values that would collide with the sentinel
_ESCAPED_NULLISH = r"^\\\\+N$"  # ...after the export escape (2+ backslashes)


def _escape_nullish(col):
    return F.when(col.rlike(_NULLISH), F.concat(F.lit("\\"), col)).otherwise(col)


def _unescape_nullish(col):
    return F.when(
        col.rlike(_ESCAPED_NULLISH), F.substring(col, 2, 1 << 30)
    ).otherwise(col)


def export_csv_slices(
    df: DataFrame, key_cols: list[str], slice_size: int = 10_000,
    n: int | None = None,
) -> DataFrame:
    """Table → CSV-slice records: one ``metadata`` record (schema DDL), N
    ``full`` records (index, totalSlice, sliceSize, csv block), one ``eof``
    record.

    Slices are key-hash partitions (deterministic, parallel, skew-free) of
    ~``slice_size`` rows; rows inside a slice sort lexicographically by
    their CSV line so the emitted bytes are engine- and partitioning-
    independent.

    Scan count (ADVICE r3 #5 — the old shape re-scanned the table three
    times): markers carry the a-priori slice-count UPPER BOUND (hash
    buckets can come up empty) plus the exact row count; the loader's
    completeness gate is row-count equality, which any missing slice
    breaks (every shipped slice is non-empty), so no separate
    count-distinct pass is needed. That leaves ONE narrow row-count scan
    here plus the caller's single evaluation of the returned body — and
    the count scan also drops if the caller passes ``n`` (e.g. from an
    up-to-date catalog statistic)."""
    if n is None:
        n = df.count()
    n_slices = max(1, (n + slice_size - 1) // slice_size)
    schema_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    from pyspark.sql.types import StringType

    cells = [
        _escape_nullish(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, StringType) else F.col(f.name)
        for f in df.schema.fields
    ]
    line = F.to_csv(F.struct(*cells), _CSV_OPTS)
    sliced = df.select(
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_slices))
        .cast("long").alias("index"),
        line.alias("_line"),
    )
    body = (
        sliced.groupBy("index")
        .agg(F.array_sort(F.collect_list("_line")).alias("_lines"))
        .select(
            F.lit(MSG_FULL).alias("msgType"),
            "index",
            F.lit(n_slices).cast("long").alias("totalSlice"),
            F.size(F.col("_lines")).cast("long").alias("sliceSize"),
            F.col("_lines").alias("csv"),
            F.lit(None).cast("string").alias("schema_ddl"),
        )
    )
    spark = df.sparkSession

    def _marker(msg: str, ddl: str | None):
        return spark.range(1).select(
            F.lit(msg).alias("msgType"),
            F.lit(-1).cast("long").alias("index"),
            F.lit(n_slices).cast("long").alias("totalSlice"),
            F.lit(n).cast("long").alias("sliceSize"),
            F.lit(None).cast("array<string>").alias("csv"),
            F.lit(ddl).alias("schema_ddl"),
        )

    return (
        _marker(MSG_METADATA, schema_ddl)
        .unionByName(body)
        .unionByName(_marker(MSG_EOF, None))
    )


def load_csv_slices(slices: DataFrame, schema: StructType | None = None) -> DataFrame:
    """CSV-slice records → typed rows. ``schema`` defaults to the DDL the
    ``metadata`` record carries. Raises if the slice set is incomplete
    (missing eof, missing slices, or row count mismatch) — a half-shipped
    table must fail loudly, not load partially."""
    # ONE narrow probe job folds the metadata record, the eof record, and
    # the body stats (review r5: three separate .first() actions re-scanned
    # a recomputed slice frame up to 3× before the body load — the loader
    # now mirrors the export side's one-scan design). csv is never touched,
    # so the scan is metadata-column-narrow.
    is_full = F.col("msgType") == MSG_FULL
    probe = slices.select(
        F.max(F.when(F.col("msgType") == MSG_METADATA, F.col("schema_ddl")))
        .alias("ddl"),
        F.max(F.when(F.col("msgType") == MSG_EOF, F.col("totalSlice")))
        .alias("eof_total"),
        F.max(F.when(F.col("msgType") == MSG_EOF, F.col("sliceSize")))
        .alias("eof_rows"),
        F.count(F.when(is_full, F.lit(1))).alias("k"),
        F.sum(F.when(is_full, F.col("sliceSize"))).alias("rows"),
    ).first()
    if probe["eof_total"] is None:
        raise ValueError("slice set has no eof record — transfer incomplete")
    if schema is None:
        if not probe["ddl"]:
            raise ValueError("no schema: metadata record missing and none passed")
        schema = StructType.fromDDL(probe["ddl"])
    body = slices.filter(is_full)
    # completeness gate: exact ROW-count equality (every shipped slice is
    # non-empty, so a missing slice always breaks it); the eof's totalSlice
    # is an upper bound — hash buckets can legitimately come up empty
    if probe["k"] > probe["eof_total"] or (probe["rows"] or 0) != probe["eof_rows"]:
        raise ValueError(
            f"incomplete slice set: have {probe['k']}/{probe['eof_total']} slices, "
            f"{probe['rows']} of {probe['eof_rows']} rows"
        )
    from pyspark.sql.types import StringType

    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    out_cols = [
        _unescape_nullish(F.col(f"_r.{f.name}")).alias(f.name)
        if isinstance(f.dataType, StringType) else F.col(f"_r.{f.name}").alias(f.name)
        for f in schema.fields
    ]
    return (
        body.select(F.explode(F.col("csv")).alias("_line"))
        .select(F.from_csv(F.col("_line"), ddl, _CSV_OPTS).alias("_r"))
        .select(*out_cols)
    )


def snapshot_envelope(rows: DataFrame, file: str, pos: int) -> DataFrame:
    """Plain rows → op='r' snapshot envelope pinned at (file, pos) — the
    shape ``CdcEngine.bootstrap`` and the PATH-record load consume
    (``RelationalChangeRecordEmitter.java:89-101`` emits snapshot data as
    READ events; the fork's PATH records point at slice files carrying the
    same rows)."""
    pay_ddl = "struct<" + ",".join(
        f"`{f.name}`:{f.dataType.simpleString()}" for f in rows.schema.fields
    ) + ">"
    return rows.select(
        F.lit(None).cast(pay_ddl).alias("before"),
        F.struct(*[F.col(c) for c in rows.columns]).alias("after"),
        F.lit("r").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct(
            F.lit(file).alias("file"),
            F.lit(pos).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit("true").alias("snapshot"),
            F.lit(None).cast("string").alias("db"),
            F.lit(None).cast("string").alias("table"),
            F.lit(0).cast("long").alias("ts_ms"),
        ).alias("source"),
        F.lit(None).cast(
            "struct<id:string,total_order:bigint,data_collection_order:bigint>"
        ).alias("transaction"),
    )


__all__ = [
    "export_csv_slices",
    "load_csv_slices",
    "snapshot_envelope",
    "MSG_FULL",
    "MSG_METADATA",
    "MSG_EOF",
]
