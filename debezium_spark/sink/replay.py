"""Sink replay: one batch of envelopes → an ordered SQL statement stream.

The reference's sink tasks turn each polled batch into per-transaction
statement lists and apply them in source order
(``debezium-connector-mysql/sink/replay/transaction/TransactionReplayTask.java:347-420``
constructDml groups statements per gtid;
``TransactionDispatcher`` applies whole transactions in order; DDL events
interleave at their offsets via ``ReplayTask.constructDdl``). There is no
JDBC target in this engine, so the transport analog is an ordered statement
FILE stream — the same role the CSV slice files play for full migration.

Spark-first shape:

* statement TEXT is the narrow per-row map from :mod:`sqlgen` (DML) and the
  Arrow-batched control-plane translators (DDL) — no shuffle;
* ``begin;``/``commit;`` wrappers are O(transactions) rows produced by ONE
  partial aggregation over the transaction id (min/max offset per tx), not
  a global window — transactions wrap exactly like the reference's
  whole-tx dispatch, and untagged rows stay autocommit;
* global replay order is materialized exactly once, at the writer, by a
  range repartition on the offset key — part files are range-ordered, so
  their concatenation IS the total order. Offset-range part files apply
  SEQUENTIALLY (two updates to one row may land in different ranges, so
  ranges are not mutually order-safe); order-safe PARALLEL apply comes from
  :func:`per_table_statement_streams` — one channel per table, the
  reference's table-parallel mode and the config behind its published
  throughput number.
"""

from __future__ import annotations

import json
import os
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_spark.sink.ddl_translate import iter_translations
from debezium_spark.sink.metadata import TableMeta
from debezium_spark.sink.sqlgen import dml_statements

#: sub-position ordering inside one offset: tx BEGIN < statement < tx COMMIT
_SUB_BEGIN, _SUB_STMT, _SUB_COMMIT = 0, 1, 2

#: statement-row shape shared by the DML map, the DDL translator, and the
#: tx-wrapper rows — uniform so multi-table streams union cleanly.
_STMT_SCHEMA = "file string, pos long, sub int, seq int, stmt string, _tx string"


def _dml_stmt_rows(
    env_df: DataFrame, table: TableMeta, dialect: str
) -> DataFrame:
    """Typed-envelope DML rows → (file, pos, sub, seq, stmt, _tx)."""
    has_tx = "transaction" in env_df.columns
    tx_id = (
        F.col("transaction.id") if has_tx else F.lit(None).cast("string")
    )
    dml = dml_statements(env_df, table, dialect=dialect, extra={"_tx": tx_id})
    return dml.select(
        F.col("source.file").alias("file"),
        F.col("source.pos").alias("pos"),
        F.lit(_SUB_STMT).alias("sub"),
        F.lit(0).alias("seq"),
        F.col("sql").alias("stmt"),
        F.col("_tx"),
    )


def _ddl_stmt_rows(
    env_df: DataFrame, text_col, mapping: dict[str, str]
) -> DataFrame:
    """op='l' rows → translated DDL statement rows at their offset.

    ``seq`` orders a multi-statement translation (current_schema prelude
    before the DDL body, ReplayTask.constructDdl) within one offset."""
    ddl_rows = env_df.where(F.col("op") == "l").select(
        F.col("source.file").alias("file"),
        F.col("source.pos").alias("pos"),
        text_col.alias("ddl"),
        F.col("source.db").alias("db"),
        F.col("source.table").alias("tbl"),
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {"file": [], "pos": [], "sub": [], "seq": [], "stmt": [], "_tx": []}
            for i, seq, s in iter_translations(
                pdf["ddl"], pdf["db"], pdf["tbl"], mapping
            ):
                out["file"].append(pdf["file"].iloc[i])
                out["pos"].append(pdf["pos"].iloc[i])
                out["sub"].append(_SUB_STMT)
                out["seq"].append(seq)
                # line-oriented transport: a multi-line source DDL must stay
                # one statement line; newline → space is SQL-whitespace-
                # preserving (known edge: a newline INSIDE a DDL string
                # literal, e.g. COMMENT '...', flattens to a space)
                out["stmt"].append(s.replace("\r\n", " ").replace("\n", " ").replace("\r", " "))
                out["_tx"].append(None)
            yield pd.DataFrame(out)

    return ddl_rows.mapInPandas(gen, _STMT_SCHEMA)


def _wrap_tx(all_stmts: DataFrame) -> DataFrame:
    """Add begin;/commit; rows at each transaction's first/last offset.

    ONE partial aggregation per transaction id → two rows each. Computed
    over the FULL statement set, so a transaction spanning several tables
    wraps once — whole-transaction dispatch
    (``TransactionReplayTask.java``), not per-table wrapping."""
    tx_bounds = (
        all_stmts.where(F.col("_tx").isNotNull())
        .groupBy("_tx")
        .agg(
            F.min(F.struct("file", "pos")).alias("lo"),
            F.max(F.struct("file", "pos")).alias("hi"),
        )
    )
    begins = tx_bounds.select(
        F.col("lo.file").alias("file"), F.col("lo.pos").alias("pos"),
        F.lit(_SUB_BEGIN).alias("sub"), F.lit(0).alias("seq"),
        F.lit("begin;").alias("stmt"), F.col("_tx"),
    )
    commits = tx_bounds.select(
        F.col("hi.file").alias("file"), F.col("hi.pos").alias("pos"),
        F.lit(_SUB_COMMIT).alias("sub"), F.lit(0).alias("seq"),
        F.lit("commit;").alias("stmt"), F.col("_tx"),
    )
    return all_stmts.unionByName(begins).unionByName(commits).drop("_tx")


def statement_stream(
    env_df: DataFrame,
    table: TableMeta,
    schema_mapping: Mapping[str, str] | None = None,
    dialect: str = "opengauss",
) -> DataFrame:
    """Envelope batch → (file, pos, sub, seq, stmt) statement rows.

    DML rows come from :func:`sqlgen.dml_statements`; DDL rows (op ``l``)
    translate through :func:`ddl_translate.translate_ddl` at their stream
    offset (``seq`` orders the prelude before the DDL); transaction-tagged
    rows gain ``begin;``/``commit;`` wrappers at the transaction's first and
    last offset. Sorting by (file, pos, sub, seq) reproduces the reference's
    apply order; the sort itself happens at the writer.
    """
    mapping = dict(schema_mapping or {})
    env_df = env_df.select(
        "op", "before", "after", "source",
        *(["transaction"] if "transaction" in env_df.columns else []),
        *(["_ddl_text"] if "_ddl_text" in env_df.columns else []),
    )

    stmts = _dml_stmt_rows(env_df, table, dialect)
    # DDL rows: text rides `_ddl_text` on the wire path, else after.content
    # (streaming/engine.py barrier extraction uses the same two sources).
    # A payload schema without a content field can't carry DDL text — fall
    # back to null, which iter_translations skips, instead of failing plan
    # analysis on a missing struct field for batches with zero op='l' rows.
    after_fields = {f.name for f in env_df.schema["after"].dataType.fields}
    if "_ddl_text" in env_df.columns:
        text_col = F.col("_ddl_text")
    elif "content" in after_fields:
        text_col = F.col("after.content")
    else:
        text_col = F.lit(None).cast("string")
    ddl_stmts = _ddl_stmt_rows(env_df, text_col, mapping)
    return _wrap_tx(stmts.unionByName(ddl_stmts))


def statement_stream_multi(
    wire_df: DataFrame,
    specs,
    schema_mapping: Mapping[str, str] | None = None,
    dialect: str = "opengauss",
    metas: Mapping[tuple[str, str], TableMeta] | None = None,
) -> DataFrame:
    """Mixed-table WIRE batch → one ordered statement stream.

    The reference sink routes replay by fully-qualified table name into
    per-table work threads
    (``sink/replay/table/TableReplayTask.java:401-426``); this is that
    routing for statement generation. ``specs`` is the engine's own
    registry (:class:`debezium_spark.streaming.multi.TableSpec` — db,
    table, payload_schema, key_cols); each table's rows parse with its own
    ``from_json`` and map through its own pure-Catalyst statement
    expression, so the plan is a union of per-table narrow maps — no
    shuffle, no Python on the DML path. Rows for unregistered tables are
    dropped (include-list semantics, ``relational/Selectors.java``); DDL
    rows translate once regardless of registration (the reference forwards
    DDL for any table in the include list's databases).

    Transaction wrappers are computed over the UNION, so a source
    transaction touching several tables wraps once — the reference applies
    whole transactions, not per-table fragments.

    ``metas`` overrides the derived :class:`TableMeta` for tables whose
    target types differ from what the Spark schema implies (the
    information_schema facts, e.g. json/enum/point columns).
    """
    mapping = dict(schema_mapping or {})
    metas = dict(metas or {})

    all_stmts = _wire_ddl_rows(wire_df, mapping)
    for spec in specs:
        all_stmts = all_stmts.unionByName(
            _spec_dml_rows(wire_df, spec, mapping, dialect, metas)
        )
    return _wrap_tx(all_stmts)


def _spec_dml_rows(
    wire_df: DataFrame, spec, mapping: dict, dialect: str, metas: dict
) -> DataFrame:
    """One registered TableSpec's wire rows → its DML statement rows.

    Shared by the unified (:func:`statement_stream_multi`) and per-table
    (:func:`per_table_statement_streams`) modes so routing, meta override,
    and envelope-parse semantics cannot diverge between them."""
    from debezium_spark.sink.metadata import table_meta_from_schema
    from debezium_spark.streaming.multi import wire_to_envelope

    meta = metas.get((spec.db, spec.table)) or table_meta_from_schema(
        mapping.get(spec.db, spec.db),
        spec.table,
        spec.payload_schema,
        spec.key_cols,
        dialect=dialect,
    )
    rows = wire_df.where(
        (F.col("source.db") == spec.db)
        & (F.col("source.table") == spec.table)
        & F.col("op").isin("c", "u", "d")
    )
    env = wire_to_envelope(rows, spec.payload_schema)
    return _dml_stmt_rows(env, meta, dialect)


def _wire_ddl_rows(wire_df: DataFrame, mapping: dict) -> DataFrame:
    """Wire-format op='l' rows → translated DDL statement rows (DDL text
    rides ``after_json``'s ``content`` field on the wire path)."""
    return _ddl_stmt_rows(
        wire_df.select(
            "op", "source",
            F.get_json_object(F.col("after_json"), "$.content").alias("_ddl"),
        ),
        F.col("_ddl"),
        mapping,
    )


def per_table_statement_streams(
    wire_df: DataFrame,
    specs,
    schema_mapping: Mapping[str, str] | None = None,
    dialect: str = "opengauss",
    metas: Mapping[tuple[str, str], TableMeta] | None = None,
) -> dict[tuple[str, str], DataFrame]:
    """Mixed-table WIRE batch → one statement stream PER table.

    The reference's table-parallel replay mode
    (``provide.transaction.metadata=false``, the default — one work thread
    per table, ``sink/replay/table/TableReplayTask.java``; its published
    30k-tps number is measured in THIS mode at 50 tables / 50 threads,
    ``README.md:407``): each table's statements apply on their own session
    concurrently, which preserves per-table order but — exactly like the
    reference — abandons cross-table transaction atomicity; a transaction
    touching several tables is re-wrapped per table fragment. Use
    :func:`statement_stream_multi` (one stream, whole-tx wrappers) for the
    transaction-parallel posture (``provide.transaction.metadata=true``).

    DDL routes to its OWN table's channel at its offset, like the
    reference's per-table queues; DDL for unregistered tables is dropped
    with the rest of their rows (include-list semantics).

    Each returned stream writes independently with
    :func:`write_statement_stream` (its own batch directory) and applies on
    its own session via :func:`apply_statement_stream` — N tables = N
    order-safe parallel channels.
    """
    mapping = dict(schema_mapping or {})
    metas = dict(metas or {})

    out: dict[tuple[str, str], DataFrame] = {}
    for spec in specs:
        table_rows = wire_df.where(
            (F.col("source.db") == spec.db)
            & (F.col("source.table") == spec.table)
        )
        dml = _spec_dml_rows(table_rows, spec, mapping, dialect, metas)
        ddl = _wire_ddl_rows(table_rows, mapping)
        out[(spec.db, spec.table)] = _wrap_tx(dml.unionByName(ddl))
    return out


def write_statement_stream(
    stmt_df: DataFrame, out_dir: str, batch_id: int, n_files: int = 8
) -> int:
    """Write one batch's statements as range-ordered text part files.

    ``part-00000 … part-NNNNN`` sorted by (file, pos, sub, seq): each part
    is internally ordered and parts are range-ordered, so concatenation is
    the total replay order (apply offset ranges sequentially — parallel
    channels come from per-table streams, see the module docstring).
    Idempotent on redelivery: a committed batch directory
    (``_done`` marker) is never rewritten — the statement-file analog of the
    offset fence (JdbcDbWriter's breakpoint table).

    Returns the statement count (0 for a skipped redelivery).
    """
    batch_dir = os.path.join(out_dir, f"batch-{batch_id:06d}")
    done = os.path.join(batch_dir, "_done")
    if os.path.exists(done):
        return 0
    from pyspark.sql import Observation

    obs = Observation(f"stmt-stream-{batch_id}")
    ordered = (
        stmt_df.repartitionByRange(n_files, "file", "pos", "sub", "seq")
        .sortWithinPartitions("file", "pos", "sub", "seq")
        .select("stmt")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # transport invariant: one statement per line. The literal/DDL
            # escape rules (sqlgen, _ddl_stmt_rows) make this structural;
            # this guard rides the SAME observation (no extra job) and
            # fails loudly if a future statement source regresses it.
            F.sum(
                F.when(F.col("stmt").rlike("[\\n\\r]"), 1).otherwise(0)
            ).alias("multiline"),
        )
    )
    ordered.write.mode("overwrite").text(batch_dir)
    multiline = int(obs.get["multiline"] or 0)
    if multiline:
        raise ValueError(
            f"statement stream batch {batch_id}: {multiline} statement(s) "
            "contain raw newlines and would split across part-file lines — "
            "the written batch is NOT committed (_done withheld)"
        )
    n = int(obs.get["n"])
    tmp = done + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"batch_id": batch_id, "statements": n}, f)
    os.replace(tmp, done)
    return n


def _wrap_tx_channels(all_stmts: DataFrame) -> DataFrame:
    """Channel-aware tx wrapping: ONE aggregation over every channel.

    Per-channel :func:`_wrap_tx` calls cost one shuffle (and, under AQE,
    one stage-materialization job) EACH; grouping by (channel, _tx) wraps
    every channel's fragments in a single partial aggregation, so wrapper
    cost is O(1) jobs at any channel count. Row-for-row equal to mapping
    :func:`_wrap_tx` over the per-channel streams (each transaction's
    bounds are computed within its channel either way)."""
    tx_bounds = (
        all_stmts.where(F.col("_tx").isNotNull())
        .groupBy("channel", "_tx")
        .agg(
            F.min(F.struct("file", "pos")).alias("lo"),
            F.max(F.struct("file", "pos")).alias("hi"),
        )
    )
    begins = tx_bounds.select(
        "channel", F.col("lo.file").alias("file"), F.col("lo.pos").alias("pos"),
        F.lit(_SUB_BEGIN).alias("sub"), F.lit(0).alias("seq"),
        F.lit("begin;").alias("stmt"), F.col("_tx"),
    )
    commits = tx_bounds.select(
        "channel", F.col("hi.file").alias("file"), F.col("hi.pos").alias("pos"),
        F.lit(_SUB_COMMIT).alias("sub"), F.lit(0).alias("seq"),
        F.lit("commit;").alias("stmt"), F.col("_tx"),
    )
    return all_stmts.unionByName(begins).unionByName(commits).drop("_tx")


def write_statement_streams(
    wire_df: DataFrame,
    specs,
    out_root: str,
    batch_id: int,
    schema_mapping: Mapping[str, str] | None = None,
    dialect: str = "opengauss",
    metas: Mapping[tuple[str, str], TableMeta] | None = None,
    files_per_channel: int = 1,
) -> dict[tuple[str, str], int]:
    """Write EVERY table channel's statement batch with O(1) Spark jobs.

    Looping :func:`per_table_statement_streams` through the per-channel
    writer costs jobs LINEAR in the table count — one write action per
    channel plus one AQE stage materialization per channel's tx-wrapper
    aggregation; at the reference's 50-table config that is ~100 jobs of
    serial driver work per batch, the generation bottleneck at a 500-table
    deployment. This writer builds the same statement rows as one union
    tagged by a ``channel`` column, wraps transactions for every channel in
    ONE (channel, _tx) aggregation, range-partitions by (channel, offset)
    and lets ONE dynamic-partitioned text write emit every channel's
    range-ordered part files. The injected dynamic-partition sort is
    satisfied by the explicit (channel, offset) sort, so within-channel
    offset order is preserved (asserted by the cross-writer equivalence
    test, which also pins row-for-row equality with the per-channel path).

    Layout and receipts match the per-channel writer exactly
    (``<out_root>/<db.table>/batch-NNNNNN/part-* + _done``), so
    :func:`apply_statement_stream` consumes either writer's output.
    Channels whose receipt already exists are EXCLUDED from the job
    (idempotent redelivery, per channel); empty channels get an empty
    directory with a 0-statement receipt. Per-channel statement counts and
    the one-statement-per-line guard ride the single write as O(channels)
    fixed-width conditional sums on one Observation.

    Returns ``{(db, table): statement_count}`` (0 for skipped redeliveries).
    """
    specs = list(specs)
    if not specs:
        return {}
    from pyspark.sql import Observation

    mapping = dict(schema_mapping or {})
    metas = dict(metas or {})
    keys = sorted((s.db, s.table) for s in specs)
    by_key = {(s.db, s.table): s for s in specs}
    cids = {k: f"{k[0]}.{k[1]}" for k in keys}
    batch_name = f"batch-{batch_id:06d}"
    pending = [
        k for k in keys
        if not os.path.exists(
            os.path.join(out_root, cids[k], batch_name, "_done")
        )
    ]
    counts: dict[tuple[str, str], int] = {k: 0 for k in keys}
    if not pending:
        return counts

    union = None
    for k in pending:
        spec = by_key[k]
        table_rows = wire_df.where(
            (F.col("source.db") == spec.db)
            & (F.col("source.table") == spec.table)
        )
        part = (
            _spec_dml_rows(table_rows, spec, mapping, dialect, metas)
            .unionByName(_wire_ddl_rows(table_rows, mapping))
            .select(F.lit(cids[k]).alias("channel"), "*")
        )
        union = part if union is None else union.unionByName(part)
    union = _wrap_tx_channels(union)

    obs = Observation(f"stmt-streams-{batch_id}")
    metrics = [
        F.sum(
            F.when(F.col("channel") == cids[k], 1).otherwise(0)
        ).alias(f"n_{i}")
        for i, k in enumerate(pending)
    ]
    metrics.append(
        F.sum(
            F.when(F.col("stmt").rlike("[\\n\\r]"), 1).otherwise(0)
        ).alias("multiline")
    )
    n_parts = max(len(pending) * files_per_channel, 1)
    ordered = (
        union.repartitionByRange(
            n_parts, "channel", "file", "pos", "sub", "seq"
        )
        .sortWithinPartitions("channel", "file", "pos", "sub", "seq")
        .observe(obs, *metrics)
        .select("channel", "stmt")
    )
    tmp_root = os.path.join(out_root, f"_tmp-{batch_name}")
    ordered.write.mode("overwrite").partitionBy("channel").text(tmp_root)
    vals = obs.get
    if int(vals["multiline"] or 0):
        raise ValueError(
            f"statement stream batch {batch_id}: {int(vals['multiline'])} "
            "statement(s) contain raw newlines and would split across "
            "part-file lines — NO channel is committed (_done withheld)"
        )
    import shutil as _shutil
    from urllib.parse import unquote as _unquote

    # Spark percent-escapes special characters in dynamic-partition path
    # values (Hive escapePathName: a channel 'db:1.t' lands as
    # 'channel=db%3A1.t'), so the output dir CANNOT be looked up by the
    # raw channel string — an escaped channel would be misread as empty,
    # its receipt written with the nonzero observed count, and the real
    # part files deleted with tmp_root (final review r5). List the actual
    # dirs and decode: Spark's escaping is %XX per escaped byte with '%'
    # itself escaped, so unquote is a faithful inverse.
    part_dirs: dict[str, str] = {}
    if os.path.isdir(tmp_root):
        for name in os.listdir(tmp_root):
            if name.startswith("channel="):
                part_dirs[_unquote(name[len("channel="):])] = name

    for i, k in enumerate(pending):
        counts[k] = int(vals[f"n_{i}"] or 0)
        dst = os.path.join(out_root, cids[k], batch_name)
        if os.path.exists(dst):  # partial leftovers from a crashed write
            _shutil.rmtree(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        src_name = part_dirs.get(cids[k])
        if src_name is not None:
            os.replace(os.path.join(tmp_root, src_name), dst)
        elif counts[k]:
            # statements were observed but no partition dir exists — a
            # receipt here would lie and the statements would be lost;
            # withhold _done so the batch is retried, and keep tmp_root
            # for inspection
            raise RuntimeError(
                f"statement stream batch {batch_id}: channel {cids[k]!r} "
                f"observed {counts[k]} statement(s) but no partition "
                f"directory was written under {tmp_root!r} — receipt "
                "withheld"
            )
        else:  # empty channel: no rows, still a committed (empty) batch
            os.makedirs(dst)
        tmp = os.path.join(dst, "_done.tmp")
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "statements": counts[k]}, f)
        os.replace(tmp, os.path.join(dst, "_done"))
    _shutil.rmtree(tmp_root, ignore_errors=True)
    return counts


def _iter_batch_lines(batch_dir: str):
    """One committed batch directory → its statement lines in replay order.

    Part files are range-ordered by the writer (``write_statement_stream``),
    so reading them in filename order IS the total order."""
    parts = sorted(
        p for p in os.listdir(batch_dir)
        if p.startswith("part-") and not p.endswith(".crc")
    )
    for p in parts:
        with open(os.path.join(batch_dir, p), encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if line:
                    yield line


def _units(lines):
    """Statement lines → apply units: ``(body, explicit_tx)``, lazily.

    ``begin;`` … ``commit;`` spans group into one unit (body excludes the
    wrappers — the reference's ``txn.getSqlList()`` likewise carries only
    the statements, ``WorkThread.java:148-156`` re-issues BEGIN/COMMIT at
    apply time); everything else is a single-statement autocommit unit. An
    unterminated ``begin;`` is a corrupt stream and raises — the writer
    computes both transaction bounds inside the batch, so a missing
    ``commit;`` can only mean truncated part files. A generator so a large
    batch streams: only one transaction's body is ever held in memory."""
    body: list[str] | None = None
    for line in lines:
        if line == "begin;":
            if body is not None:
                raise ValueError("corrupt statement stream: nested begin;")
            body = []
        elif line == "commit;":
            if body is None:
                raise ValueError("corrupt statement stream: commit; without begin;")
            yield body, True
            body = None
        elif body is not None:
            body.append(line)
        else:
            yield [line], False
    if body is not None:
        raise ValueError(
            "corrupt statement stream: begin; without a matching commit; "
            "(truncated part files?)"
        )


def apply_statement_stream(
    batch_dir: str,
    execute,
    fail_sql_path: str | None = None,
    locator: str | None = None,
    now=None,
    progress_every: int = 1,
    require_receipt: bool = True,
    breakpoint_table: str | None = None,
) -> tuple[int, int]:
    """Apply one written batch's ordered statements through ``execute``.

    The reference's sink apply loop
    (``sink/replay/transaction/WorkThread.java:148-216``
    ``replayTransaction``/``executeTxnSql``): each transaction applies
    whole — BEGIN, statements, COMMIT; the first failing statement stops
    the transaction, rolls it back, and diverts the WHOLE transaction to a
    fail-SQL file (``fail.sql.path``, ``README.md:321``) as a timestamped
    comment block + the statements, then replay continues with the next
    transaction. Success/failure are counted per transaction — the
    ``successCount``/``failCount`` pair the progress report publishes
    (feed them to ``ProcessCommitter.record_sink_batch``).

    ``execute`` is any ``Callable[[str], None]`` that runs one SQL
    statement on the target session (a DB-API cursor's ``execute``, a JDBC
    bridge, DuckDB in the tests) and raises on failure. The session must be
    transaction-free at entry — after a crash, resume with a FRESH
    connection (the reference's work thread likewise reconnects): the
    database discards the crashed unit's uncommitted prefix, and a reused
    session stuck inside the dead transaction would poison every
    subsequent unit. Statements within
    one call share one session, sequentially — parallelism comes from
    applying different TABLES' batch directories on different sessions
    (:func:`per_table_statement_streams`), exactly the reference's
    per-table work threads; this function is one ordered channel.

    Idempotent on redelivery: a batch directory already applied (its
    ``_applied`` marker exists) is skipped and the recorded counts are
    returned — the breakpoint-table analog (``BreakPointRecord.java``), so
    a crash between apply and the caller's own fence never double-applies.
    Within a batch, a ``_progress`` breakpoint persists after every
    ``progress_every`` applied units (default: every unit, the reference's
    per-transaction breakpoint cadence), so a crash MID-batch resumes at
    the first unapplied unit instead of re-executing the whole prefix —
    without it, re-applied plain INSERTs would collide on their PKs and
    divert already-committed transactions to fail.sql. The re-apply window
    on crash is at most ``progress_every`` units (raise it to trade that
    window for fewer marker writes on huge batches). Honest limitation of
    the FILE breakpoint: it is not atomic with the database commit — a
    crash between a unit's ``commit;`` and the breakpoint write re-applies
    that unit on resume, and where PK-keyed DML re-raises visibly (the
    diverted-to-fail.sql case above), a non-idempotent statement on a
    PK-less target (``update t set n = n + 1``, bare INSERT) duplicates
    silently.

    ``breakpoint_table`` closes that window the way the reference does
    (``BreakPointRecord.java`` — the breakpoint row commits INSIDE the
    target database in the same transaction): pass a table name (created
    ``if not exists`` with columns ``batch varchar, unit bigint, ok int``)
    and every unit — autocommit units are upgraded to explicit
    transactions — commits its own ``(batch, unit, 1)`` marker row
    atomically with its statements; diverted units record ``(batch, unit,
    0)`` in their own autocommit after the rollback. On (re)entry the
    resume point and the success/fail counts are reconstructed FROM the
    database, so exactly-once holds across any crash point, including for
    non-idempotent DML. Requires ``execute`` to return a DB-API-style
    result (``fetchone``) for SELECTs — cursors and DuckDB connections
    both do. The file ``_progress`` is still written as a cheap
    observability mirror but the database is authoritative.

    The writer's ``_done`` receipt is required BEFORE anything executes
    (``require_receipt=False`` opts out, for hand-built statement
    directories): a directory without it was never committed — a crash
    mid-write, or the multiline invariant guard withheld it — so applying
    it could execute split statement fragments. When the receipt is
    present, the part files' line count is verified against its recorded
    statement count up front, also before anything executes; a mismatch
    means lost or truncated part files — and because the check runs
    BEFORE the apply loop, a missing MIDDLE part file can never cause
    post-gap statements to execute out of order or the positional
    ``_progress`` index to fence the wrong units. This catches truncation
    at unit boundaries that the unterminated-``begin;`` check cannot see.

    If the rollback itself fails the session is in an unknown state and the
    error propagates (the reference's dead-connection path likewise stops
    the thread, ``WorkThread.java:196-204``).

    Returns ``(success_count, fail_count)`` in transaction units.
    """
    import datetime as _dt

    marker = os.path.join(batch_dir, "_applied")
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            rec = json.load(f)
        return rec["success"], rec["fail"]
    if fail_sql_path is None:
        fail_sql_path = os.path.join(
            os.path.dirname(os.path.abspath(batch_dir)), "fail.sql"
        )
    if now is None:
        now = lambda: _dt.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    where = locator or batch_dir

    expected = None
    done = os.path.join(batch_dir, "_done")
    if os.path.exists(done):
        with open(done, encoding="utf-8") as f:
            expected = json.load(f).get("statements")
    elif require_receipt:
        raise ValueError(
            f"batch at {batch_dir} has no _done receipt — the writer never "
            "committed it (crash mid-write, or the one-statement-per-line "
            "guard withheld it); refusing to apply possibly-partial part "
            "files (pass require_receipt=False for hand-built directories)"
        )
    if expected is not None:
        # verify BEFORE anything executes: a lost part file (tail OR middle)
        # must not let post-gap statements run out of order, nor let the
        # positional _progress index fence the wrong units
        actual = sum(1 for _ in _iter_batch_lines(batch_dir))
        if actual != expected:
            raise ValueError(
                f"statement stream batch at {batch_dir}: part files carry "
                f"{actual} statement line(s) but the _done receipt records "
                f"{expected} — lost or truncated part files; nothing was "
                "applied this call (_applied withheld)"
            )

    batch_key = (locator or os.path.basename(batch_dir)).replace("'", "''")

    progress = os.path.join(batch_dir, "_progress")
    start_unit = 0
    success = fail = 0
    if breakpoint_table is not None:
        # the reference's posture: the breakpoint lives in the target, so
        # resume state survives any crash point exactly (BreakPointRecord)
        execute(
            f"create table if not exists {breakpoint_table} "
            "(batch varchar, unit bigint, ok int)"
        )
        row = execute(
            f"select max(unit), "
            f"coalesce(sum(case when ok = 1 then 1 else 0 end), 0), "
            f"coalesce(sum(case when ok = 0 then 1 else 0 end), 0) "
            f"from {breakpoint_table} where batch = '{batch_key}'"
        ).fetchone()
        if row is not None and row[0] is not None:
            start_unit, success, fail = int(row[0]) + 1, int(row[1]), int(row[2])
    elif os.path.exists(progress):
        with open(progress, encoding="utf-8") as f:
            rec = json.load(f)
        start_unit, success, fail = rec["next_unit"], rec["success"], rec["fail"]

    def _mark(i: int, ok: int) -> str:
        return (
            f"insert into {breakpoint_table} values ('{batch_key}', {i}, {ok});"
        )

    def _save_progress(next_unit: int) -> None:
        tmp = progress + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"next_unit": next_unit, "success": success, "fail": fail}, f
            )
        os.replace(tmp, progress)

    for i, (body, explicit) in enumerate(_units(_iter_batch_lines(batch_dir))):
        if i < start_unit:  # breakpoint-resume: already applied pre-crash
            continue
        err = None
        if explicit or breakpoint_table is not None:
            # with a breakpoint table even autocommit units run as explicit
            # transactions so the marker row commits atomically with them
            began = False
            try:
                execute("begin;")
                began = True
                for stmt in body:
                    execute(stmt)
                if breakpoint_table is not None:
                    execute(_mark(i, 1))
                execute("commit;")
            except Exception as e:
                err = e
                if began:  # a failed begin; left no transaction to roll back
                    execute("rollback;")  # propagation on failure is deliberate
        else:
            try:
                execute(body[0])
            except Exception as e:
                err = e
        if err is None:
            success += 1
        else:
            fail += 1
            block = [
                f"-- {now()}: {where} unit {i} ({len(body)} statements)",
                f"-- {err}",
                *body,
                "",
            ]
            with open(fail_sql_path, "a", encoding="utf-8") as f:
                f.write("\n".join(block) + "\n")
            if breakpoint_table is not None:
                # the diverted unit is PROCESSED: record it (own autocommit,
                # after the rollback) so resume never re-diverts it
                execute(_mark(i, 0))
        if (i + 1 - start_unit) % progress_every == 0:
            _save_progress(i + 1)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"success": success, "fail": fail}, f)
    os.replace(tmp, marker)
    if os.path.exists(progress):
        os.remove(progress)
    return success, fail
