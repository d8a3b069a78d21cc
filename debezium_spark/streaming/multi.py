"""MultiTableEngine — per-table routing of a mixed change stream.

The reference's entire dataflow is per-table: topic naming
(``schema/TopicSelector.java:39-92``), per-table value schemas
(``relational/TableSchemaBuilder.java:124-175``), per-table key columns with
``message.key.columns`` overrides (``relational/Key.java`` KeyMapper, config
``RelationalDatabaseConnectorConfig.java:420``), and sink replay routed by
fully-qualified table name (``sink/replay/table/TableReplayTask.java:
401-426``). This module is that layer for the Spark engine: a registry of
``TableSpec``s, each binding a ``(db, table)`` identity to its own
``LakeTable`` (own payload schema, own key columns, own write mode), and a
batch-apply that fans a mixed *wire* batch out to the per-table engines.

Wire form: payloads travel as JSON strings (``before_json`` /
``after_json``) because a mixed-table DataFrame cannot carry N different
payload StructTypes in one column — exactly why the reference serializes
per-table schemas onto the wire. Each table parses its own rows with its own
schema (one ``from_json``, JVM-side).

Scale shape: the wire batch is analyzed once (one narrow aggregation yields
per-table max offsets + row presence), then each registered table gets a
filtered parse + the engine's usual one-shuffle merge, pruned to that
table's buckets. Tables absent from a batch receive an offset-bearing
heartbeat so their fences stay fresh (``heartbeat/Heartbeat.java:27-79``).
Unregistered tables are dropped, mirroring table include-list semantics
(``relational/Selectors.java``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from debezium_spark.plans.table import LakeTable
from debezium_spark.schema import SOURCE_SCHEMA, TRANSACTION_SCHEMA
from debezium_spark.streaming.engine import CdcEngine

#: wire-format envelope: payloads as JSON strings (per-table schemas are
#: applied at parse time, one from_json per registered table)
WIRE_SCHEMA = StructType(
    [
        StructField("before_json", StringType(), True),
        StructField("after_json", StringType(), True),
        StructField("op", StringType(), False),
        StructField("ts_ms", LongType(), True),
        StructField("source", SOURCE_SCHEMA, False),
        StructField("transaction", TRANSACTION_SCHEMA, True),
    ]
)


def envelope_to_wire(env: DataFrame) -> DataFrame:
    """Typed envelope → wire form (payload structs serialized to JSON)."""
    return env.select(
        F.when(F.col("before").isNotNull(), F.to_json(F.col("before"))).alias("before_json"),
        F.when(F.col("after").isNotNull(), F.to_json(F.col("after"))).alias("after_json"),
        "op",
        "ts_ms",
        "source",
        "transaction",
    )


def wire_to_envelope(wire: DataFrame, payload: StructType) -> DataFrame:
    """Wire form → typed envelope under one table's payload schema."""
    return wire.select(
        F.from_json(F.col("before_json"), payload).alias("before"),
        F.from_json(F.col("after_json"), payload).alias("after"),
        "op",
        "ts_ms",
        "source",
        "transaction",
    )


@dataclass
class TableSpec:
    """One captured table: identity, value schema, key.

    ``key_cols`` is the ``message.key.columns`` analog — it may override the
    source primary key (reference KeyMapper,
    ``RelationalDatabaseConnectorConfig.java:420``)."""

    db: str
    table: str
    payload_schema: StructType
    key_cols: list[str]
    n_buckets: int = 16
    mode: str = "mor"
    smt_chain: list = field(default_factory=list)

    @property
    def fqn(self) -> str:
        return f"{self.db}.{self.table}"


class MultiTableEngine:
    """Registry of per-table CdcEngines + a mixed-batch dispatcher."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        specs: list[TableSpec],
        salt_factor: int = 4,
        compact_depth: int = 8,
        max_parallel_tables: int = 8,
    ) -> None:
        """``max_parallel_tables``: per-table merges are independent Spark
        jobs against disjoint LakeTables, so the dispatcher submits them
        from a thread pool — the analog of the reference sink's parallel
        work threads routed by table (``TableReplayTask.java:401-426``,
        30 threads). 1 = sequential."""
        self.spark = spark
        self.root = root.rstrip("/")
        self.max_parallel_tables = max_parallel_tables
        self.specs: dict[tuple[str, str], TableSpec] = {}
        self.engines: dict[tuple[str, str], CdcEngine] = {}
        for spec in specs:
            t = LakeTable(
                spark,
                os.path.join(self.root, spec.db, spec.table),
                spec.key_cols,
                n_buckets=spec.n_buckets,
                mode=spec.mode,
            )
            if not t.exists():
                t.create(spec.payload_schema)
            self.specs[(spec.db, spec.table)] = spec
            self.engines[(spec.db, spec.table)] = CdcEngine(
                spark,
                t,
                smt_chain=spec.smt_chain,
                salt_factor=salt_factor,
                compact_depth=compact_depth,
            )

    def table(self, db: str, table: str) -> LakeTable:
        return self.engines[(db, table)].table

    def _prepass_stats(self, wire: DataFrame) -> DataFrame:
        """The per-batch pre-pass: ONE aggregation over the wire batch that
        yields, per (db, table) — its max offset, barrier presence, and a
        malformed-row flag built from the SAME ``validity_reason`` rule set
        the engine's quarantine split applies post-parse (unknown op, null
        offset, null payload — incl. JSON parse failures — or null key
        under that table's key columns). Keeping every probe inside this
        single job is the serial-cost contract: per-batch driver time is
        the scaling bottleneck (asserted by tests/test_plans.py)."""
        from debezium_spark.operators.quarantine import validity_reason

        bad = F.lit(False)
        for (db_, tbl_), spec_ in self.specs.items():
            match = (F.col("source.db") == db_) & (F.col("source.table") == tbl_)
            after_p = F.from_json("after_json", spec_.payload_schema)
            before_p = F.from_json("before_json", spec_.payload_schema)
            key_null = F.lit(False)
            for kcol in spec_.key_cols:
                key_null = key_null | F.coalesce(after_p[kcol], before_p[kcol]).isNull()
            bad_t = validity_reason(
                F.col("op"), F.col("source.pos"), after_p, before_p, key_null
            ).isNotNull()
            bad = F.when(match, bad_t).otherwise(bad)
        return wire.groupBy(
            F.col("source.db").alias("db"), F.col("source.table").alias("t")
        ).agg(
            F.max("source.pos").alias("p"),
            F.max("source.file").alias("f"),
            F.max(F.col("op").isin(["l", "t"]).cast("int")).alias("nd"),
            F.max(bad.cast("int")).alias("nb"),
        )

    def apply_wire_batch(self, wire: DataFrame, batch_id: str) -> dict[str, int | None]:
        """Fan one mixed wire batch out to the per-table engines.

        One narrow pre-pass (source columns only — parquet-prunable) yields
        each table's max offset, the global max, and barrier presence;
        then each registered table parses + merges only its rows. Tables
        with no rows in the batch get an offset-bearing heartbeat at the
        global max so idle fences advance (Heartbeat.java:27-79).
        Unregistered tables are dropped (include-list semantics)."""
        wire = wire.persist()
        try:
            stats = self._prepass_stats(wire).collect()
            if not stats:
                return {}
            present = {(r["db"], r["t"]): r for r in stats}
            # Global offsets only over REGISTERED tables with a non-null max
            # pos: an unregistered table (dropped anyway) or a poison group
            # whose every source.pos is null must not wedge the dispatcher
            # with None comparisons — 'one poison record never wedges the
            # stream' is the module contract.
            fenced = [
                r for r in stats
                if (r["db"], r["t"]) in self.specs and r["p"] is not None
            ]
            global_fence = (
                max((r["f"], r["p"]) for r in fenced) if fenced else None
            )

            def apply_one(key) -> tuple[str, int | None]:
                db, tbl = key
                eng = self.engines[key]
                spec = self.specs[key]
                row = present.get(key)
                if row is None:
                    # idle table this batch: offset-bearing heartbeat (only
                    # if some registered table established a global fence)
                    if global_fence is None:
                        return spec.fqn, None
                    return spec.fqn, eng.heartbeat(global_fence)
                sub = wire.filter(
                    (F.col("source.db") == db) & (F.col("source.table") == tbl)
                )
                env = wire_to_envelope(sub, spec.payload_schema)
                # null max-pos ⇒ every row in this table's group has a null
                # offset: hand the engine fence=None/has_bad=None so its own
                # probe quarantines the rows instead of fencing on None
                all_null_pos = row["p"] is None
                return spec.fqn, eng.apply_envelope_batch(
                    env,
                    batch_id=f"{batch_id}/{spec.fqn}",
                    fence=None if all_null_pos else (row["f"], row["p"]),
                    has_ddl=bool(row["nd"]),
                    # the fused flag reflects pre-SMT rows; with SMTs the
                    # engine re-probes post-transform
                    has_bad=None if (spec.smt_chain or all_null_pos) else bool(row["nb"]),
                )

            keys = list(self.engines)
            if self.max_parallel_tables > 1 and len(keys) > 1:
                # per-table merges touch disjoint table roots/manifests, so
                # they commute; concurrent Spark jobs share the executor
                # pool (driver-side thread fan-out, like the reference's
                # per-table work threads)
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(self.max_parallel_tables, len(keys))
                ) as pool:
                    versions = dict(pool.map(apply_one, keys))
            else:
                versions = dict(apply_one(k) for k in keys)
            return versions
        finally:
            wire.unpersist()

    def apply_envelope_batch(self, env: DataFrame, batch_id: str) -> dict[str, int | None]:
        """Convenience: accept a typed envelope whose payload is a superset
        struct (single-source multi-table capture) by converting to wire
        form first — each table then re-parses only its own fields."""
        return self.apply_wire_batch(envelope_to_wire(env), batch_id)

    def read_all(self) -> dict[str, DataFrame]:
        """Final state per table (fqn → DataFrame)."""
        return {spec.fqn: self.engines[k].table.read() for k, spec in self.specs.items()}


__all__ = [
    "WIRE_SCHEMA",
    "TableSpec",
    "MultiTableEngine",
    "envelope_to_wire",
    "wire_to_envelope",
]
