"""Control-ledger compaction (VERDICT r4 #1): the schema-history and
catalog ledgers fold into checkpoint lines instead of growing append-only
forever, so restart replay and the apply_ddl idempotency scan stay
O(entries-since-compaction) at the 10^5+-batch design point — the
reference's breakpoint ledger likewise expires applied offsets
(``connector/breakpoint/BreakPointRecord.java:116`` toDeleteOffsets, size
cap at ``README.md:332``)."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark.generator import ChangeLogGenerator
from debezium_spark.operators.schema_evolution import (
    apply_ddl,
    compact_schema_history,
    schema_history,
    schema_history_checkpoint,
)
from debezium_spark.plans.table import LakeTable
from debezium_spark.streaming.engine import CdcEngine
from debezium_spark.streaming.multi import (
    WIRE_SCHEMA,
    MultiTableEngine,
    TableSpec,
)


def _history_file(t):
    return os.path.join(t.root, "_schema_history.jsonl")


def test_thousand_ddl_ledger_stays_bounded_and_replays(spark, tmp_path):
    """The headline invariant: ~1k DDL barriers with periodic compaction
    (the engine's trigger logic at threshold 64) keep the ledger under
    threshold+1 lines at all times, pre-checkpoint offsets stay
    idempotently skipped, and a FRESH table incarnation replaying the
    compacted ledger converges to the identical schema state."""
    root = str(tmp_path / "t")
    t = LakeTable(spark, root, ["k"], n_buckets=2)
    t.create(StructType.fromDDL("k string, v int"))
    threshold = 64
    max_lines = 0
    for i in range(1000):
        if i == 500:
            sql = "ALTER TABLE t RENAME COLUMN v TO score"
        elif i % 200 == 100:
            sql = f"ALTER TABLE t ADD COLUMN extra{i} INT DEFAULT {i}"
        else:
            col = "v" if i < 500 else "score"
            sql = f"ALTER TABLE t ALTER COLUMN {col} SET DEFAULT {i % 7}"
        apply_ddl(t, sql, ("binlog.000001", i))
        # the engine's _maintain_ledgers trigger, inlined (the real engine
        # path is exercised by test_engine_auto_compacts_history below —
        # driving 1000 envelope batches through Spark would take minutes
        # for no extra ledger coverage)
        if len(schema_history(t)) > threshold:
            compact_schema_history(t)
        with open(_history_file(t)) as f:
            max_lines = max(max_lines, sum(1 for _ in f))
    assert max_lines <= threshold + 1, max_lines
    assert os.path.getsize(_history_file(t)) < 64 * 1024
    cp = schema_history_checkpoint(t)
    assert cp is not None and cp["folded"] > 900

    # a pre-checkpoint barrier replayed after compaction must be a no-op
    # (the per-entry ledger line is gone; the checkpoint fence skips it)
    before = t.manifest()["version"]
    apply_ddl(t, "ALTER TABLE t ALTER COLUMN score SET DEFAULT 999", ("binlog.000001", 3))
    assert t.manifest()["version"] == before
    assert t.schema()["score"].metadata["CURRENT_DEFAULT"] != "999"

    # ---- restart onto a FRESH incarnation (lost-schema recovery) ----
    root2 = str(tmp_path / "t2")
    t2 = LakeTable(spark, root2, ["k"], n_buckets=2)
    t2.create(StructType.fromDDL("k string, v int"))
    shutil.copy(_history_file(t), _history_file(t2))
    n = CdcEngine(spark, t2).recover_schema()
    assert n == len(schema_history(t))  # only post-checkpoint entries replay
    assert t2.schema().json() == t.schema().json()
    assert t2.manifest().get("renames") == t.manifest().get("renames")


def test_engine_auto_compacts_history(spark, tmp_path):
    """The real trigger path: DDL barriers through apply_envelope_batch
    fold the ledger once it exceeds history_compact_threshold entries;
    the stream keeps running and the final schema reflects every barrier."""
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    engine = CdcEngine(spark, table, history_compact_threshold=3, compact_depth=0)
    gen = ChangeLogGenerator(spark, seed=7, n_repos=4)
    env = gen.events(40)
    engine.apply_envelope_batch(env, batch_id="data")

    def ddl_row(pos, sql):
        payload_t = env.schema["after"].dataType
        after_ddl = F.struct(
            *[
                F.lit(sql).alias("content") if f.name == "content"
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in payload_t.fields
            ]
        )
        return spark.range(1).select(
            F.lit(None).cast(payload_t).alias("before"),
            after_ddl.alias("after"),
            F.lit("l").alias("op"),
            F.lit(0).cast("long").alias("ts_ms"),
            F.struct(
                F.lit("binlog.000009").alias("file"),
                F.lit(pos).cast("long").alias("pos"),
                F.lit(None).cast("string").alias("gtid"),
                F.lit(None).cast("string").alias("snapshot"),
                F.lit("inventory").alias("db"),
                F.lit("repo_files").alias("table"),
                F.lit(0).cast("long").alias("ts_ms"),
            ).alias("source"),
            F.lit(None).cast(env.schema["transaction"].dataType).alias("transaction"),
        )

    names = ["c0", "c1", "c2", "c3", "c4", "c5"]
    for i, name in enumerate(names):
        engine.apply_envelope_batch(
            ddl_row(1000 + i, f"ALTER TABLE inventory.repo_files ADD COLUMN {name} INT"),
            batch_id=f"ddl{i}",
        )
    assert schema_history_checkpoint(table) is not None
    assert len(schema_history(table)) <= 3
    cols = set(table.read().columns)
    assert set(names) <= cols
    # restart + recovery on the compacted ledger is a clean no-op
    eng2 = CdcEngine(spark, table, history_compact_threshold=3)
    eng2.recover_schema()
    assert set(table.read().columns) == cols


def test_expire_keep_bounds_manifests(spark, tmp_path):
    """expire_keep auto-expires old versions after each committed batch:
    manifest count (and the lineage riding it) stays bounded while the
    fence and final state remain exact."""
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    engine = CdcEngine(spark, table, expire_keep=2, compact_depth=0)
    gen = ChangeLogGenerator(spark, seed=9, n_repos=4)
    for b in range(5):
        engine.apply_envelope_batch(gen.events(30, start_pos=b * 30), batch_id=f"b{b}")
    mdir = os.path.join(table.root, "_manifests")
    versions = [f for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")]
    assert len(versions) <= 2, versions
    assert table.fence() == ("binlog.000001", 149)
    assert len(table.lineage()) <= 2 * (2 + 1)  # ≤ buckets-per-version × kept
    # resume skip still exact after expiry
    assert engine.apply_envelope_batch(
        gen.events(30, start_pos=4 * 30), batch_id="replayed"
    ) is None


def test_catalog_compaction_bounds_and_restart(spark, tmp_path):
    """Catalog ledger fold: CREATE/DROP/RENAME mutations past the threshold
    collapse to one checkpoint line; a restart with the ORIGINAL static
    spec list reconstructs the identical catalog — including the folded
    rename (stale static registration re-keys to the renamed capture) and
    a same-name re-create landing at its @gen root."""
    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    lake = str(tmp_path / "lake")
    mte = MultiTableEngine(spark, lake, [users], default_buckets=2,
                           catalog_compact_threshold=3)

    def row(pos, table, op, after, before=None):
        return {"before_json": before, "after_json": after, "op": op,
                "ts_ms": 1000 + pos,
                "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                           "snapshot": None, "db": "app", "table": table,
                           "ts_ms": 1000 + pos},
                "transaction": None}

    b0 = [
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),
        row(2, "orders", "l", json.dumps({"content":
            "CREATE TABLE app.orders (order_no BIGINT, PRIMARY KEY (order_no))"})),
        row(3, "orders", "c", '{"order_no": 7}'),
        row(4, "audit", "l", json.dumps({"content":
            "CREATE TABLE app.audit (aid BIGINT, PRIMARY KEY (aid))"})),
        row(5, "audit", "l", json.dumps({"content": "DROP TABLE app.audit"})),
        row(6, "users", "l", json.dumps({"content":
            "RENAME TABLE app.users TO app.accounts"})),
    ]
    mte.apply_wire_batch(spark.createDataFrame(b0, WIRE_SCHEMA), "b0")

    # 4 mutations > threshold 3 → the batch end folded the ledger
    with open(os.path.join(lake, "_catalog.jsonl")) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    assert len(lines) == 1 and lines[0].get("checkpoint") is True
    assert lines[0]["folded"] == 4

    # a same-name re-create AFTER the fold appends past the checkpoint —
    # restart must replay checkpoint + trailing entry
    mte.apply_wire_batch(spark.createDataFrame([
        row(7, "users", "l", json.dumps({"content":
            "CREATE TABLE app.users (uid BIGINT, tag VARCHAR(5),"
            " PRIMARY KEY (uid))"})),
        row(8, "users", "c", '{"uid": 50, "tag": "new"}'),
    ], WIRE_SCHEMA), "b0b")
    state = {k: mte.engines[k].table.root for k in mte.specs}
    retired = set(mte.retired)
    assert ("app", "accounts") in state and ("app", "users") in state
    assert state[("app", "users")].endswith("@gen.0")  # fresh incarnation

    # ---- restart with the ORIGINAL static list: checkpoint alone must
    # ---- rebuild the catalog (no per-mutation entries left to replay)
    mte2 = MultiTableEngine(spark, lake, [users], default_buckets=2,
                            catalog_compact_threshold=3)
    assert {k: mte2.engines[k].table.root for k in mte2.specs} == state
    assert set(mte2.retired) == retired
    # the renamed capture kept its original data lineage...
    assert mte2.engines[("app", "accounts")].table.root == os.path.join(
        lake, "app", "users")
    got = mte2.table("app", "accounts").read().collect()
    assert [(r["uid"], r["name"]) for r in got] == [(1, "ada")]
    # ...and the re-created same-name table is the fresh one
    assert [r["uid"] for r in mte2.table("app", "users").read().collect()] == [50]

    # post-restart traffic routes correctly; a dropped capture stays dead
    mte2.apply_wire_batch(spark.createDataFrame([
        row(9, "accounts", "u", '{"uid": 1, "name": "ada2"}',
            '{"uid": 1, "name": "ada"}'),
        row(10, "audit", "c", '{"aid": 99}'),
    ], WIRE_SCHEMA), "b1")
    assert [(r["uid"], r["name"])
            for r in mte2.table("app", "accounts").read().collect()] == [(1, "ada2")]
    assert ("app", "audit") not in mte2.specs

    # double restart is stable; a ledger that is already just a checkpoint
    # re-folds to a no-op, and an explicit re-fold stays restart-equivalent
    mte3 = MultiTableEngine(spark, lake, [users], default_buckets=2)
    assert {k: mte3.engines[k].table.root for k in mte3.specs} == {
        k: mte2.engines[k].table.root for k in mte2.specs}
    assert mte3.compact_catalog() == 1  # folds b0b's trailing create entry
    mte4 = MultiTableEngine(spark, lake, [users], default_buckets=2)
    assert set(mte4.specs) == set(mte3.specs)
