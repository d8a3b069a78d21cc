"""Connector-property facade: reference Debezium property names wire the
engine (CommonConnectorConfig / RelationalDatabaseConnectorConfig names)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.config import EngineConfig


REFERENCE_PROPS = {
    "snapshot.mode": "when_needed",
    "table.include.list": "inventory\\.repo_files, inventory\\.orders",
    "column.exclude.list": "inventory.repo_files.commit",
    "column.mask.hash.SHA-256.with.salt.s3cr3t": "inventory.repo_files.content",
    "column.truncate.to.12.chars": "inventory.repo_files.path",
    "skipped.operations": "d",
    "tombstones.on.delete": "true",
    "message.key.columns": "inventory.repo_files:repo,path;(.*)\\.orders:order_no",
    "decimal.handling.mode": "string",
    "snapshot.select.statement.overrides.repo_files": "lang = 'py'",
    "some.connector.specific.key": "passthrough",
}


def test_property_parsing():
    cfg = EngineConfig.from_properties(REFERENCE_PROPS)
    assert cfg.snapshot_mode == "when_needed"
    assert "repo_files" in cfg.table_include and "|" in cfg.table_include
    assert cfg.column_exclude == [("inventory.repo_files", "commit")]
    assert cfg.hash_masks == [("inventory.repo_files", "content", "SHA-256", "s3cr3t")]
    assert cfg.truncates == [("inventory.repo_files", "path", 12)]
    assert cfg.skipped_operations == ["d"]
    assert cfg.tombstones_on_delete is True
    assert cfg.key_overrides[0] == ("inventory.repo_files", ["repo", "path"])
    assert cfg.decimal_mode == "string"
    assert cfg.snapshot_where("repo_files") == "lang = 'py'"
    assert cfg.extras == {"some.connector.specific.key": "passthrough"}

    assert cfg.key_cols_for("inventory", "repo_files", ["x"]) == ["repo", "path"]
    assert cfg.key_cols_for("other_db", "orders", ["x"]) == ["order_no"]
    assert cfg.key_cols_for("inventory", "unmatched", ["x"]) == ["x"]

    assert EngineConfig.from_properties({"skipped.operations": "none"}).skipped_operations == []
    with pytest.raises(ValueError):
        EngineConfig.from_properties({"decimal.handling.mode": "bogus"})
    with pytest.raises(ValueError):
        EngineConfig.from_properties({"column.mask.hash.SHA-256.missing.salt": "c"})


def test_smt_chain_applies_in_reference_order(spark):
    from debezium_spark import ChangeLogGenerator

    cfg = EngineConfig.from_properties(
        {
            "table.include.list": "inventory\\.repo_files",
            "skipped.operations": "d",
            "column.mask.hash.SHA-256.with.salt.s:": "content",
            "column.truncate.to.10.chars": "path",
        }
    )
    env = ChangeLogGenerator(spark, seed=5, n_repos=4).events(400)
    out = env
    for smt in cfg.smt_chain():
        out = smt(out)
    rows = out.collect()
    assert rows and all(r["op"] != "d" for r in rows)
    assert all(len(r["after"]["content"]) == 64 for r in rows)  # sha256 hex
    assert all(len(r["after"]["path"]) <= 10 for r in rows)


def test_config_driven_engine_end_to_end(spark, tmp_path):
    """A property file drives a full replay: include-filter + masking run as
    the engine's SMT chain and the final state reflects them."""
    from debezium_spark import ChangeLogGenerator, LakeTable

    cfg = EngineConfig.from_properties(
        {
            "snapshot.mode": "never",
            "column.mask.hash.SHA-256.with.salt.xyz": "content",
            "skipped.operations": "none",
        }
    )
    gen = ChangeLogGenerator(spark, seed=8, n_repos=5)
    bdir = str(tmp_path / "b")
    gen.write_batches(bdir, 800, 2)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = cfg.build_engine(spark, table)
    engine.run(bdir, snapshot_mode=cfg.snapshot_mode)
    out = table.read()
    assert out.count() > 0
    # every surviving content value is a salted sha256 hex digest
    assert out.filter(~F.col("content").rlike("^[0-9a-f]{64}$")).count() == 0


def test_include_patterns_are_anchored(spark):
    """Review regression: reference Selectors FULL-match the qualified name;
    substring rlike over-included inventory.orders_audit."""
    from debezium_spark.operators.filters import table_include

    cfg = EngineConfig.from_properties({"table.include.list": "inventory\\.orders"})
    fqs = ["inventory.orders", "inventory.orders_audit", "myinventory.orders"]
    env = spark.createDataFrame(
        [(f.split(".")[0], f.split(".")[1]) for f in fqs], "db string, tbl string"
    ).selectExpr("named_struct('db', db, 'table', tbl) AS source")
    kept = table_include(env, cfg.table_include).select("source.table").collect()
    assert [r["table"] for r in kept] == ["orders"]


def test_snapshot_override_keys_keep_database_qualifier():
    cfg = EngineConfig.from_properties(
        {
            "snapshot.select.statement.overrides.inventory.orders": "id > 0",
            "snapshot.select.statement.overrides.sales.orders": "id > 10",
        }
    )
    assert cfg.snapshot_where("inventory.orders") == "id > 0"
    assert cfg.snapshot_where("sales.orders") == "id > 10"
    assert cfg.snapshot_where("orders") is None


def test_mask_hash_algorithm_is_honored(spark):
    """Review regression: SHA-512 configs silently produced SHA-256."""
    import hashlib
    from debezium_spark import ChangeLogGenerator

    cfg = EngineConfig.from_properties(
        {"column.mask.hash.SHA-512.with.salt.pepper": "content"}
    )
    env = ChangeLogGenerator(spark, seed=2, n_repos=3).events(10)
    out = env
    for smt in cfg.smt_chain():
        out = smt(out)
    row = out.filter(F.col("after").isNotNull()).select(
        "after.content").first()
    assert len(row["content"]) == 128  # sha512 hex
    orig = env.filter(F.col("after").isNotNull()).select("after.content").first()["content"]
    assert row["content"] == hashlib.sha512(b"pepper" + orig.encode()).hexdigest()


def test_reference_fork_properties(spark):
    """openGauss-fork property names: db-level filters, truncate handling,
    explicit snapshot offset, server name."""
    cfg = EngineConfig.from_properties(
        {
            "database.server.name": "pg1",
            "database.include.list": "app, inventory",
            "truncate.handling.mode": "skip",
            "snapshot.offset.binlog.filename": "binlog.000007",
            "snapshot.offset.binlog.position": "12345",
            "snapshot.offset.gtid.set": "uuid:1-100",
        }
    )
    assert cfg.server_name == "pg1"
    assert cfg.snapshot_offset == ("binlog.000007", 12345)
    assert cfg.snapshot_gtid == "uuid:1-100"
    assert "snapshot.offset.gtid.set" not in cfg.extras
    assert cfg.truncate_handling == "skip"

    from debezium_spark import ChangeLogGenerator

    env = ChangeLogGenerator(spark, seed=3, n_repos=3).events(100)
    # inject one truncate + one foreign-db row
    env = env.withColumn(
        "op", F.when(F.col("source.pos") == 5, F.lit("t")).otherwise(F.col("op"))
    ).withColumn(
        "source",
        F.when(
            F.col("source.pos") == 6,
            F.col("source").withField("db", F.lit("otherdb")),
        ).otherwise(F.col("source")),
    )
    out = env
    for smt in cfg.smt_chain():
        out = smt(out)
    rows = out.select("op", "source.db").collect()
    assert all(r["op"] != "t" for r in rows)          # truncate skipped
    assert all(r["db"] != "otherdb" for r in rows)    # db excluded by include-list
    assert len(rows) == 98

    import pytest
    with pytest.raises(ValueError):
        EngineConfig.from_properties({"truncate.handling.mode": "bogus"})


def test_snapshot_mode_initial_only_stops_before_streaming(spark, tmp_path):
    """MySqlConnectorConfig.java:131-167 INITIAL_ONLY: snapshot, then stop —
    batches on disk are never consumed."""
    from debezium_spark import ChangeLogGenerator, LakeTable

    gen = ChangeLogGenerator(spark, seed=31, n_repos=4)
    bdir = str(tmp_path / "b")
    gen.write_batches(bdir, 400, 1)
    snap = gen.snapshot(50)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    engine = EngineConfig.from_properties({"snapshot.mode": "initial_only"}).build_engine(
        spark, table
    )
    versions = engine.run(bdir, snapshot_env=snap, snapshot_mode="initial_only",
                          snapshot_fence=("binlog.000001", -1))
    assert versions == []  # stream never opened
    assert table.fence() == ("binlog.000001", -1)  # snapshot fence only
    assert table.read().count() == snap.count()


def test_snapshot_mode_schema_only_recovery_replays_ledger(spark, tmp_path):
    """SCHEMA_ONLY_RECOVERY: rebuild the schema from _schema_history.jsonl
    (idempotent ledger replay), then stream — the lost-history recovery
    path (AbstractDatabaseHistory.java)."""
    import os
    import shutil
    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
    from debezium_spark.operators.schema_evolution import apply_ddl

    gen = ChangeLogGenerator(spark, seed=32, n_repos=4)
    # original table accumulates DDL history
    orig = LakeTable(spark, str(tmp_path / "orig"), ["repo", "path"], n_buckets=2)
    CdcEngine(spark, orig).apply_envelope_batch(gen.events(200), batch_id="b0")
    apply_ddl(orig, "ALTER TABLE t ADD COLUMN stars INT", ("binlog.000001", 200))
    apply_ddl(orig, "ALTER TABLE t RENAME COLUMN lang TO language", ("binlog.000001", 201))
    assert "stars" in [f.name for f in orig.schema().fields]

    # disaster: table restored from a pre-DDL backup, ledger survived
    restored = LakeTable(spark, str(tmp_path / "rest"), ["repo", "path"], n_buckets=2)
    eng = CdcEngine(spark, restored)  # creates base schema (no stars/rename)
    shutil.copy(
        os.path.join(orig.root, "_schema_history.jsonl"),
        os.path.join(restored.root, "_schema_history.jsonl"),
    )
    bdir = str(tmp_path / "b")
    gen.write_batches(bdir, 300, 1)
    eng.run(bdir, snapshot_mode="schema_only_recovery")
    cols = [f.name for f in restored.schema().fields]
    assert "stars" in cols and "language" in cols and "lang" not in cols
    assert restored.read().count() > 0  # streaming followed recovery
    # recovery is idempotent
    assert eng.recover_schema() == 2
    assert [f.name for f in restored.schema().fields] == cols


def test_scoped_column_properties_only_touch_their_table(spark):
    """Advisor regression: a property scoped to db1.t1.ssn used to mask a
    field named ssn in EVERY table the chain touched (rsplit kept only the
    last segment). Scoped entries now filter on source.db/source.table."""
    from debezium_spark import ChangeLogGenerator

    cfg = EngineConfig.from_properties(
        {
            "column.mask.hash.SHA-256.with.salt.x": "otherdb.othertable.content",
            "column.truncate.to.5.chars": "inventory.repo_files.path",
            "column.exclude.list": "otherdb.othertable.lang",
        }
    )
    env = ChangeLogGenerator(spark, seed=7, n_repos=3).events(50)
    out = env
    for smt in cfg.smt_chain():  # no table identity → row-conditional
        out = smt(out)
    rows = out.filter(F.col("after").isNotNull()).select("after.*").collect()
    assert rows
    # content mask scoped to a DIFFERENT table: values untouched
    orig = env.filter(F.col("after").isNotNull()).select("after.content").collect()
    assert [r["content"] for r in rows] == [r["content"] for r in orig]
    # lang exclude scoped elsewhere: field present and non-null
    assert all(r["lang"] is not None for r in rows)
    # path truncate scoped to THIS stream's table: applied
    assert all(len(r["path"]) <= 5 for r in rows)

    # with table identity, scoped entries resolve at build time
    chain_for_other = cfg.smt_chain(db="otherdb", table="othertable")
    chain_for_inv = cfg.smt_chain(db="inventory", table="repo_files")
    # inventory chain keeps only its truncate; otherdb chain keeps mask+exclude
    assert len(chain_for_inv) == 1 and len(chain_for_other) == 2
    out2 = env
    for smt in chain_for_inv:
        out2 = smt(out2)
    rows2 = out2.filter(F.col("after").isNotNull()).select("after.*").collect()
    assert all(len(r["path"]) <= 5 for r in rows2)
    assert "lang" in out2.schema["after"].dataType.fieldNames()


def test_value_converters_and_tombstone_flag(spark, tmp_path):
    """Review regression: decimal.handling.mode / time.precision.mode /
    tombstones.on.delete were parsed but wired to nothing."""
    import decimal as pydec
    from debezium_spark import ChangeLogGenerator, LakeTable

    cfg = EngineConfig.from_properties(
        {"decimal.handling.mode": "string", "time.precision.mode": "connect",
         "tombstones.on.delete": "true"}
    )
    conv = cfg.value_converters()
    row = spark.createDataFrame(
        [("12.34", 1700000000123, 500)], "d string, ms long, t long"
    ).select(
        conv["decimal"](F.col("d"), 12, 2).alias("dec"),
        F.unix_millis(conv["timestamp"](F.col("ms"))).alias("ms"),
        conv["time"](F.col("t")).alias("us"),
    ).first()
    assert pydec.Decimal(str(row["dec"])) == pydec.Decimal("12.34")
    assert row["ms"] == 1700000000123
    assert row["us"] == 500_000  # connect mode: input millis -> micros

    # tombstone flag reaches the engine; final state unchanged by it
    gen = ChangeLogGenerator(spark, seed=14, n_repos=4)
    env = gen.events(400)
    t1 = LakeTable(spark, str(tmp_path / "a"), ["repo", "path"], n_buckets=2)
    e1 = cfg.build_engine(spark, t1)
    assert e1.tombstones_on_delete is True
    e1.apply_envelope_batch(env, batch_id="b")
    t2 = LakeTable(spark, str(tmp_path / "b"), ["repo", "path"], n_buckets=2)
    EngineConfig().build_engine(spark, t2).apply_envelope_batch(env, batch_id="b")
    s1 = {(r["repo"], r["path"], r["content"]) for r in t1.read().collect()}
    s2 = {(r["repo"], r["path"], r["content"]) for r in t2.read().collect()}
    assert s1 == s2 and len(s1) > 0
