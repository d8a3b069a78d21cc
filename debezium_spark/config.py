"""Connector-property facade — Debezium config names → engine wiring.

A reference user configures connectors with properties
(``CommonConnectorConfig.java`` / ``RelationalDatabaseConnectorConfig.java``
field definitions); this module accepts those exact property names and
builds the corresponding engine pieces, so switching from the reference
means carrying the property file over:

=============================================  ==============================
property (reference definition)                engine effect
=============================================  ==============================
``snapshot.mode``                              CdcEngine.run snapshot_mode
``table.include.list`` / ``table.exclude.list``  filters.table_include SMT
``column.exclude.list``                        filters.column_exclude SMT
``column.mask.hash.<algo>.with.salt.<salt>``   masking.hash_mask_column SMT
``column.mask.with.<n>.chars``                 masking.mask_column SMT
``column.truncate.to.<n>.chars``               masking.truncate_column SMT
``skipped.operations``                         filters.skipped_operations SMT
``tombstones.on.delete``                       split tombstone parity flag
``message.key.columns``                        per-table key override
``decimal.handling.mode``                      typeconv decimal mode choice
``time.precision.mode``                        typeconv temporal unit choice
``snapshot.select.statement.overrides.<t>``    filters.snapshot_row_filter
``commit.process.while.running`` + the fork's  streaming.progress
``*.process.file.path`` / ``commit.time.       ProcessCommitter (progress
interval`` / ``create.count.info.path`` /      files in the reference's
``process.file.{count,time}.limit`` /          exact JSON/rotation format)
``append.write`` / ``file.size.limit``
=============================================  ==============================

Unknown properties are kept (``extras``) rather than rejected — the
reference likewise passes through connector-specific keys.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _split_scoped(entry: str) -> tuple[str | None, str]:
    """Reference column properties name columns fully-qualified
    (``databaseName.tableName.columnName``, regex-matched by Selectors):
    split into (table-scope regex, column). A bare dotless name is
    unscoped — it applies to every table the chain touches."""
    entry = entry.strip()
    if "." not in entry:
        return None, entry
    scope, col = entry.rsplit(".", 1)
    return scope, col


def parse_properties(path: str) -> dict[str, str]:
    """A Debezium ``.properties`` file → ``{key: value}``, ready for
    :meth:`EngineConfig.from_properties` / ``SinkConfig.from_properties``.
    One place for the transport parse (strip, ``#`` comments, first ``=``
    splits) so the source- and sink-side job drivers cannot drift."""
    props: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, v = line.split("=", 1)
                props[k.strip()] = v.strip()
    return props


def _scope_pred(scope: str):
    """Row predicate for a scope regex: full-match on source db.table
    (Selectors full-matches the qualified name)."""
    from pyspark.sql import functions as _F

    fq = _F.concat_ws(".", _F.col("source.db"), _F.col("source.table"))
    return fq.rlike(f"^(?:{scope})$")


@dataclass
class EngineConfig:
    snapshot_mode: str = "initial"
    snapshot_offset: tuple[str, int] | None = None  # explicit handoff point
    #: snapshot.offset.gtid.set — recorded alongside the handoff point;
    #: the engine fences on the file-major (file, pos) key (gtid rides the
    #: envelope's source.gtid informationally, as the fork stores it)
    snapshot_gtid: str | None = None
    server_name: str = "debezium"  # topic prefix (database.server.name)
    table_include: str | None = None
    table_exclude: str | None = None
    database_include: str | None = None
    database_exclude: str | None = None
    truncate_handling: str = "include"  # include | skip (truncate.handling.mode)
    # column-scoped entries carry their db.table qualifier (reference format
    # is fully-qualified ``databaseName.tableName.columnName``, matched as a
    # regex by Selectors/TableSchemaBuilder): (scope_regex|None, column, ...)
    column_exclude: list[tuple[str | None, str]] = field(default_factory=list)
    hash_masks: list[tuple[str | None, str, str, str]] = field(default_factory=list)  # (scope, col, algo, salt)
    const_masks: list[tuple[str | None, str, int]] = field(default_factory=list)  # (scope, col, n_chars)
    truncates: list[tuple[str | None, str, int]] = field(default_factory=list)  # (scope, col, n_chars)
    skipped_operations: list[str] = field(default_factory=list)
    tombstones_on_delete: bool = True
    key_overrides: list[tuple[str, list[str]]] = field(default_factory=list)  # (tbl_regex, cols)
    decimal_mode: str = "precise"  # precise | string | double
    time_precision: str = "adaptive"  # adaptive | adaptive_time_microseconds | connect
    snapshot_overrides: dict[str, str] = field(default_factory=dict)  # table -> WHERE
    # migration-progress reporting (fork README.md:113 feature; property
    # names and defaults per the fork's Source端/Sink端 tables). Progress
    # files are the fork's external-controller contract — see
    # streaming/progress.py for the file/JSON format parity.
    commit_process: bool = False  # commit.process.while.running
    source_process_file_path: str | None = None
    sink_process_file_path: str | None = None
    commit_time_interval: int = 1  # seconds between progress lines
    create_count_info_path: str | None = None
    process_file_count_limit: int = 10
    process_file_time_limit: int = 168  # hours
    append_write: bool = True
    file_size_limit: int = 10  # MB per progress file before rotation
    extras: dict[str, str] = field(default_factory=dict)

    # -- parsing -------------------------------------------------------------

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "EngineConfig":
        cfg = cls()
        for key, val in props.items():
            k = key.strip()
            if k == "snapshot.mode":
                cfg.snapshot_mode = val.strip()
            elif k == "database.server.name":
                cfg.server_name = val.strip()
            elif k == "snapshot.offset.binlog.filename":
                f0, p0 = cfg.snapshot_offset or ("", -1)
                cfg.snapshot_offset = (val.strip(), p0)
            elif k == "snapshot.offset.binlog.position":
                f0, p0 = cfg.snapshot_offset or ("", -1)
                cfg.snapshot_offset = (f0, int(val))
            elif k == "snapshot.offset.gtid.set":
                cfg.snapshot_gtid = val.strip()
            elif k == "database.include.list":
                alts = "|".join(f"(?:{p.strip()})" for p in val.split(",") if p.strip())
                cfg.database_include = f"^(?:{alts})$"
            elif k == "database.exclude.list":
                alts = "|".join(f"(?:{p.strip()})" for p in val.split(",") if p.strip())
                cfg.database_exclude = f"^(?:{alts})$"
            elif k == "truncate.handling.mode":
                if val.strip() not in ("include", "skip"):
                    raise ValueError(f"unknown truncate.handling.mode {val!r}")
                cfg.truncate_handling = val.strip()
            elif k == "table.include.list":
                # comma-separated regexes → one anchored alternation; the
                # reference's Selectors FULL-matches the fully-qualified
                # name (Predicates.includes uses Matcher.matches), so an
                # unanchored rlike would over-include ("inventory.orders"
                # must not match "inventory.orders_audit")
                alts = "|".join(f"(?:{p.strip()})" for p in val.split(",") if p.strip())
                cfg.table_include = f"^(?:{alts})$"
            elif k == "table.exclude.list":
                alts = "|".join(f"(?:{p.strip()})" for p in val.split(",") if p.strip())
                cfg.table_exclude = f"^(?:{alts})$"
            elif k == "column.exclude.list":
                cfg.column_exclude = [
                    _split_scoped(p) for p in val.split(",") if p.strip()
                ]
            elif k.startswith("column.mask.hash."):
                m = re.match(r"column\.mask\.hash\.([^.]+)\.with\.salt\.(.+)$", k)
                if not m:
                    raise ValueError(f"malformed property {key!r}")
                algo, salt = m.group(1), m.group(2)
                for col in val.split(","):
                    if col.strip():
                        scope, c = _split_scoped(col)
                        cfg.hash_masks.append((scope, c, algo, salt))
            elif k.startswith("column.mask.with."):
                m = re.match(r"column\.mask\.with\.(\d+)\.chars$", k)
                if not m:
                    raise ValueError(f"malformed property {key!r}")
                for col in val.split(","):
                    if col.strip():
                        scope, c = _split_scoped(col)
                        cfg.const_masks.append((scope, c, int(m.group(1))))
            elif k.startswith("column.truncate.to."):
                m = re.match(r"column\.truncate\.to\.(\d+)\.chars$", k)
                if not m:
                    raise ValueError(f"malformed property {key!r}")
                for col in val.split(","):
                    if col.strip():
                        scope, c = _split_scoped(col)
                        cfg.truncates.append((scope, c, int(m.group(1))))
            elif k == "skipped.operations":
                ops = [o.strip() for o in val.split(",") if o.strip()]
                cfg.skipped_operations = [] if ops == ["none"] else ops
            elif k == "tombstones.on.delete":
                cfg.tombstones_on_delete = val.strip().lower() in ("true", "1", "yes")
            elif k == "message.key.columns":
                # "db.tbl:c1,c2;(.*).orders:id" (RelationalDatabaseConnectorConfig.java:420)
                for entry in val.split(";"):
                    if not entry.strip():
                        continue
                    tbl, cols = entry.split(":", 1)
                    cfg.key_overrides.append(
                        (tbl.strip(), [c.strip() for c in cols.split(",") if c.strip()])
                    )
            elif k == "decimal.handling.mode":
                if val.strip() not in ("precise", "string", "double"):
                    raise ValueError(f"unknown decimal.handling.mode {val!r}")
                cfg.decimal_mode = val.strip()
            elif k == "time.precision.mode":
                cfg.time_precision = val.strip()
            elif k.startswith("snapshot.select.statement.overrides."):
                # reference key form is overrides.<databaseName>.<tableName>
                # — keep the full qualified suffix (rsplit would collapse
                # same-named tables across databases onto one key)
                cfg.snapshot_overrides[k[len("snapshot.select.statement.overrides."):]] = val
            elif k == "commit.process.while.running":
                cfg.commit_process = val.strip().lower() == "true"
            elif k == "source.process.file.path":
                cfg.source_process_file_path = val.strip()
            elif k == "sink.process.file.path":
                cfg.sink_process_file_path = val.strip()
            elif k == "commit.time.interval":
                cfg.commit_time_interval = int(val)
            elif k == "create.count.info.path":
                cfg.create_count_info_path = val.strip()
            elif k == "process.file.count.limit":
                cfg.process_file_count_limit = int(val)
            elif k == "process.file.time.limit":
                cfg.process_file_time_limit = int(val)
            elif k == "append.write":
                cfg.append_write = val.strip().lower() == "true"
            elif k == "file.size.limit":
                cfg.file_size_limit = int(val)
            else:
                cfg.extras[k] = val
        return cfg

    # -- wiring ---------------------------------------------------------------

    def smt_chain(self, db: str | None = None, table: str | None = None) -> list:
        """The per-event transform chain these properties imply, in the
        reference's application order: table filters → op filter → column
        projections/maskers.

        Column properties are scoped by fully-qualified name (``db.table.
        column``, regex). With the chain's table identity (``db``/``table``,
        as MultiTableEngine per-table specs have): scoped entries resolve at
        build time — non-matching ones are omitted, matching ones apply
        plainly (true schema-level drop for column.exclude). Without
        identity (mixed stream): scoped entries become row-conditional on
        source.db/source.table, so a property scoped to db1.t1.ssn never
        touches an ``ssn`` field of other tables."""
        from debezium_spark.operators import filters as flt
        from debezium_spark.operators import masking as msk

        from pyspark.sql import functions as _F

        def resolve(scope):
            """→ (include: bool, pred: Column|None) for one scoped entry."""
            if scope is None:
                return True, None
            if db is not None and table is not None:
                return bool(re.fullmatch(scope, f"{db}.{table}")), None
            return True, _scope_pred(scope)

        chain: list = []
        if self.database_include:
            pat = self.database_include
            chain.append(lambda df, p=pat: df.filter(_F.col("source.db").rlike(p)))
        if self.database_exclude:
            pat = self.database_exclude
            chain.append(lambda df, p=pat: df.filter(~_F.col("source.db").rlike(p)))
        if self.table_include or self.table_exclude:
            inc, exc = self.table_include, self.table_exclude
            chain.append(lambda df, i=inc, e=exc: flt.table_include(df, i, e))
        if self.truncate_handling == "skip":
            chain.append(lambda df: flt.skipped_operations(df, ["t"]))
        if self.skipped_operations:
            ops = list(self.skipped_operations)
            chain.append(lambda df, o=ops: flt.skipped_operations(df, o))
        for scope, col in self.column_exclude:
            inc, pred = resolve(scope)
            if not inc:
                continue
            chain.append(lambda df, c=col, p=pred: flt.column_exclude(df, [c], p))
        for scope, col, algo, salt in self.hash_masks:
            # algo validity is enforced inside hash_mask_column (it raises
            # on anything it cannot map to a JVM hash function)
            inc, pred = resolve(scope)
            if not inc:
                continue
            chain.append(
                lambda df, c=col, s=salt, a=algo, p=pred: msk.hash_mask_column(
                    df, c, s, algo=a, scope_pred=p
                )
            )
        for scope, col, n in self.const_masks:
            inc, pred = resolve(scope)
            if not inc:
                continue
            chain.append(
                lambda df, c=col, n=n, p=pred: msk.mask_column(df, c, "*" * n, scope_pred=p)
            )
        for scope, col, n in self.truncates:
            inc, pred = resolve(scope)
            if not inc:
                continue
            chain.append(
                lambda df, c=col, n=n, p=pred: msk.truncate_column(df, c, n, scope_pred=p)
            )
        return chain

    def key_cols_for(self, db: str, table: str, default: list[str]) -> list[str]:
        """message.key.columns resolution: first matching table pattern wins
        (patterns match the fully-qualified name, regex per the reference)."""
        fq = f"{db}.{table}"
        for pattern, cols in self.key_overrides:
            if re.fullmatch(pattern, fq):
                return cols
        return default

    def snapshot_where(self, table: str) -> str | None:
        return self.snapshot_overrides.get(table)

    def build_committer(self, role: str = "sink"):
        """ProcessCommitter for this config's progress properties, or None
        when ``commit.process.while.running`` is off or the side's path is
        unset (the reference likewise only reports when configured)."""
        path = (
            self.sink_process_file_path
            if role == "sink"
            else self.source_process_file_path
        )
        if not self.commit_process or not path:
            return None
        from debezium_spark.streaming.progress import ProcessCommitter

        return ProcessCommitter(
            path,
            role,
            commit_time_interval=self.commit_time_interval,
            file_size_limit=self.file_size_limit,
            file_count_limit=self.process_file_count_limit,
            file_time_limit=self.process_file_time_limit,
            append_write=self.append_write,
            create_count_info_path=self.create_count_info_path,
        )

    def build_engine(self, spark, table, db: str | None = None,
                     source_table: str | None = None, **engine_kwargs):
        """CdcEngine wired with this config's SMT chain, tombstone flag,
        and (when configured) sink progress committer. ``db``/
        ``source_table`` give the chain its table identity so scoped
        column properties resolve at build time (see smt_chain)."""
        from debezium_spark.streaming.engine import CdcEngine

        engine_kwargs.setdefault("tombstones_on_delete", self.tombstones_on_delete)
        if "committer" not in engine_kwargs:
            # not setdefault: that would CONSTRUCT a throwaway committer
            # (mkdir side effect) even when the caller passed one
            engine_kwargs["committer"] = self.build_committer("sink")
        return CdcEngine(
            spark, table, smt_chain=self.smt_chain(db, source_table), **engine_kwargs
        )

    def value_converters(self) -> dict:
        """The typeconv callables these properties select — used when
        building typed envelopes from wire values (functions/typeconv):
        ``decimal(col, precision, scale)`` per decimal.handling.mode and
        ``timestamp(col)`` / ``time(col)`` per time.precision.mode."""
        from debezium_spark.functions import typeconv as tc

        decimal = {
            # cast down to the declared (p, s): the bytes decoder works in
            # decimal(38, s) internally, but the facade contract is that all
            # three handling modes yield the SAME schema for the same call
            "precise": lambda col, p=38, s=9: tc.decimal_from_unscaled_bytes(
                col, s
            ).cast(f"decimal({p},{s})"),
            "string": tc.decimal_from_string,
            "double": tc.decimal_from_double,
        }[self.decimal_mode]
        if self.time_precision == "connect":
            # Kafka Connect logical types: millis everywhere
            ts, time_fn = tc.from_debezium_timestamp_ms, (
                lambda col: tc.time_micros(col, "millis")
            )
        else:  # adaptive / adaptive_time_microseconds: micros
            ts, time_fn = tc.from_debezium_timestamp_us, (
                lambda col: tc.time_micros(col, "micros")
            )
        return {"decimal": decimal, "timestamp": ts, "time": time_fn,
                "date": tc.from_debezium_date}


def apply_snapshot_override(cfg: EngineConfig, table: str, df: DataFrame) -> DataFrame:
    """snapshot.select.statement.overrides.<table> → WHERE at bootstrap."""
    from debezium_spark.operators.filters import snapshot_row_filter

    where = cfg.snapshot_where(table)
    return snapshot_row_filter(df, where) if where else df
