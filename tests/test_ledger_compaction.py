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

def test_catalog_compaction_preserves_include_list_semantics(spark, tmp_path):
    """Review r5 finding #2: compact_catalog used to fold constructor-static
    specs into the checkpoint, so a restart that removed a table from the
    static spec list kept capturing it forever. Only ledger-derived specs
    (mid-stream CREATE / rename-target) belong in the checkpoint: a static
    spec dropped from the list must stop capturing after compaction exactly
    as it does before compaction."""
    users = TableSpec("app", "users", StructType.fromDDL("uid long, name string"),
                      ["uid"], n_buckets=2)
    orders = TableSpec("app", "orders", StructType.fromDDL("order_no long, v string"),
                       ["order_no"], n_buckets=2)
    lake = str(tmp_path / "lake")
    mte = MultiTableEngine(spark, lake, [users, orders], default_buckets=2,
                           catalog_compact_threshold=1)

    def row(pos, table, op, after):
        return {"before_json": None, "after_json": after, "op": op,
                "ts_ms": 1000 + pos,
                "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                           "snapshot": None, "db": "app", "table": table,
                           "ts_ms": 1000 + pos},
                "transaction": None}

    # two dynamic mutations cross threshold 1 → fold; static specs live
    mte.apply_wire_batch(spark.createDataFrame([
        row(1, "users", "c", '{"uid": 1, "name": "ada"}'),
        row(2, "orders", "c", '{"order_no": 7, "v": "x"}'),
        row(3, "audit", "l", json.dumps({"content":
            "CREATE TABLE app.audit (aid BIGINT, PRIMARY KEY (aid))"})),
        row(4, "audit", "c", '{"aid": 11}'),
        row(5, "tmp", "l", json.dumps({"content":
            "CREATE TABLE app.tmp (tid BIGINT, PRIMARY KEY (tid))"})),
        row(6, "tmp", "l", json.dumps({"content": "DROP TABLE app.tmp"})),
    ], WIRE_SCHEMA), "b0")
    with open(os.path.join(lake, "_catalog.jsonl")) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    assert len(lines) == 1 and lines[0].get("checkpoint") is True
    # the checkpoint names ONLY the ledger-derived spec, never the statics
    assert [(s["db"], s["table"]) for s in lines[0]["specs"]] == [("app", "audit")]

    # restart with orders REMOVED from the static list: its capture stops
    mte2 = MultiTableEngine(spark, lake, [users], default_buckets=2,
                            catalog_compact_threshold=1)
    assert set(mte2.specs) == {("app", "users"), ("app", "audit")}
    res = mte2.apply_wire_batch(spark.createDataFrame([
        row(7, "orders", "c", '{"order_no": 8, "v": "y"}'),
        row(8, "audit", "c", '{"aid": 12}'),
    ], WIRE_SCHEMA), "b1")
    assert "app.orders" not in res
    assert sorted(r["aid"] for r in
                  mte2.table("app", "audit").read().collect()) == [11, 12]
    # orders' lake data is untouched on disk — capture stopped, not dropped
    assert [r["order_no"] for r in LakeTable(
        spark, os.path.join(lake, "app", "orders"), ["order_no"], n_buckets=2,
    ).read().collect()] == [7]

    # a second compaction on the reduced engine still excludes statics and
    # keeps the dynamic spec; a restart with the FULL list re-adds orders
    mte2.compact_catalog()
    mte3 = MultiTableEngine(spark, lake, [users, orders], default_buckets=2)
    assert set(mte3.specs) == {("app", "users"), ("app", "orders"),
                               ("app", "audit")}

def test_compaction_fence_is_file_major(spark, tmp_path):
    """Review r5 finding #5: the post-compaction replay fence compared only
    offset pos, so a barrier in a LATER binlog file with a smaller per-file
    pos was silently skipped as already-applied. The fence must order
    (file, pos) file-major, exactly like the data fence."""
    t = LakeTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.create(StructType.fromDDL("k string, v int"))
    apply_ddl(t, "ALTER TABLE t ADD COLUMN a INT", ("binlog.000001", 5000))
    assert compact_schema_history(t) == 1
    cp = schema_history_checkpoint(t)
    assert (cp["offset_file"], cp["offset_pos"]) == ("binlog.000001", 5000)

    # binlog rotated: pos restarts below the fold point — must still apply
    apply_ddl(t, "ALTER TABLE t ADD COLUMN b INT", ("binlog.000002", 100))
    assert "b" in {f.name for f in t.schema().fields}
    assert len(schema_history(t)) == 1  # ledgered past the checkpoint

    # idempotent replay of the SAME later-file barrier still skips
    before = t.manifest()["version"]
    apply_ddl(t, "ALTER TABLE t ADD COLUMN b INT", ("binlog.000002", 100))
    assert t.manifest()["version"] == before

    # a genuinely pre-fence barrier (same file, smaller pos) stays fenced
    apply_ddl(t, "ALTER TABLE t ADD COLUMN c INT", ("binlog.000001", 3))
    assert "c" not in {f.name for f in t.schema().fields}

    # re-compaction folds to the max (file, pos), file-major
    assert compact_schema_history(t) == 1
    cp = schema_history_checkpoint(t)
    assert (cp["offset_file"], cp["offset_pos"]) == ("binlog.000002", 100)


def test_recover_schema_restores_checkpoint_despite_data_commits(spark, tmp_path):
    """Review r5 finding #3: the checkpoint-restore gate compared the
    manifest version (which increments on every DATA commit) to the
    checkpoint's schema_version, so a recreated table that re-ingested data
    before recovery skipped the restore and replay wedged on a
    post-checkpoint op referencing a folded rename. The restore is now
    unconditional (restore_schema no-ops when state already matches)."""
    t = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    engine = CdcEngine(spark, t)
    gen = ChangeLogGenerator(spark, seed=11, n_repos=4)
    engine.apply_envelope_batch(gen.events(30, start_pos=0), batch_id="b0")

    # folded history: RENAME size -> bytes, then a post-checkpoint widen
    apply_ddl(t, "ALTER TABLE t RENAME COLUMN lang TO language", ("binlog.000001", 29))
    assert compact_schema_history(t) == 1
    cp_version = schema_history_checkpoint(t)["schema_version"]
    apply_ddl(t, "ALTER TABLE t MODIFY COLUMN language VARCHAR(64)", ("binlog.000001", 30))

    # recreate the table at a fresh root with the ORIGINAL schema, replay
    # lots of data first so the manifest version races past the
    # checkpoint's schema_version, then recover
    t2 = LakeTable(spark, str(tmp_path / "t2"), ["repo", "path"], n_buckets=2)
    e2 = CdcEngine(spark, t2)
    pos = 0
    while t2.manifest()["version"] <= cp_version:
        e2.apply_envelope_batch(gen.events(5, start_pos=pos), batch_id=f"d{pos}")
        pos += 5
    shutil.copy(_history_file(t), _history_file(t2))
    e2.recover_schema()  # used to raise: rename 'lang' not found
    assert t2.schema().json() == t.schema().json()
    assert t2.manifest().get("renames") == t.manifest().get("renames")
    # reads resolve old data through the restored rename alias
    assert t2.read().filter(F.col("language").isNull()).count() == 0

    # recover on a CURRENT table (checkpoint + tail already applied) is a
    # stable no-op on the schema
    before = t.schema().json()
    CdcEngine(spark, t).recover_schema()
    assert t.schema().json() == before


def test_recover_schema_on_current_table_publishes_no_manifest(spark, tmp_path):
    """Review r5: recovery used to restore the checkpoint state onto the
    LIVE table first and replay the tail as separate manifest publishes —
    a current table was transiently reverted (tail columns vanished), and
    a crash in that window was permanent because apply_ddl's idempotency
    scan skips redelivered barriers. Recovery now composes checkpoint +
    tail in a scratch manifest and publishes AT MOST ONE restore: zero
    publishes when the live table already matches."""
    t = LakeTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.create(StructType.fromDDL("k string, v int"))
    apply_ddl(t, "ALTER TABLE t RENAME COLUMN v TO score", ("binlog.000001", 10))
    assert compact_schema_history(t) == 1
    # post-checkpoint tail: an ADD the crash-window bug would transiently drop
    apply_ddl(t, "ALTER TABLE t ADD COLUMN x INT DEFAULT 1", ("binlog.000001", 11))
    before_version = t.manifest()["version"]
    before_schema = t.schema().json()

    n = CdcEngine(spark, t).recover_schema()
    assert n == 1  # the one tail entry replayed (in scratch)
    assert t.manifest()["version"] == before_version  # ZERO live publishes
    assert t.schema().json() == before_schema

    # genuine recovery (fresh incarnation) publishes exactly ONE manifest
    # carrying the complete final state — no intermediate checkpoint-only
    # state ever becomes visible
    t2 = LakeTable(spark, str(tmp_path / "t2"), ["k"], n_buckets=2)
    t2.create(StructType.fromDDL("k string, v int"))
    shutil.copy(_history_file(t), _history_file(t2))
    v0 = t2.manifest()["version"]
    CdcEngine(spark, t2).recover_schema()
    assert t2.manifest()["version"] == v0 + 1
    assert t2.schema().json() == before_schema
    assert {f.name for f in t2.schema().fields} >= {"k", "score", "x"}


def test_null_file_offsets_never_crash_ledger_maintenance(spark, tmp_path):
    """Review r5: the file-major (file, pos) comparisons raised TypeError
    when an offset carried a null file (nullable in the wire format), where
    the old pos-only compares tolerated it — a crash-loop in apply_ddl
    BEFORE the ledger write, the exact wedge class the degrade design bans.
    offset_key sorts a null file first instead."""
    t = LakeTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.create(StructType.fromDDL("k string, v int"))
    apply_ddl(t, "ALTER TABLE t ADD COLUMN a INT", ("binlog.000001", 100))
    assert compact_schema_history(t) == 1

    # null-file barrier against a checkpointed ledger: must not raise; a
    # null file sorts FIRST, so it lands behind the fence and no-ops
    apply_ddl(t, "ALTER TABLE t ADD COLUMN b INT", (None, 500))
    assert "b" not in {f.name for f in t.schema().fields}

    # a null-file entry IN the ledger must not crash compaction either
    apply_ddl(t, "ALTER TABLE t ADD COLUMN c INT", ("binlog.000002", 10))
    hist = _history_file(t)
    with open(hist, "a") as f:
        f.write(json.dumps({
            "offset_file": None, "offset_pos": 999,
            "ops": [["set_default", "c", "3"]], "raw": "poison", "ts_ms": 0,
        }) + "\n")
    assert compact_schema_history(t) == 2
    cp = schema_history_checkpoint(t)
    # fold fence = max under offset_key: the real file beats the null file
    assert (cp["offset_file"], cp["offset_pos"]) == ("binlog.000002", 10)
