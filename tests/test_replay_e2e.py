"""End-to-end replay: generator → engine → LakeTable final state must equal
the pure-Python sequential oracle with 100% per-row sha256(content) equality
(the north-rule invariant), including PK-change splits, same-key c→u→d→c
chains, multi-batch replay, and crash/resume idempotency."""

from __future__ import annotations

import hashlib

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
from tests.conftest import sequential_oracle

N_EVENTS = 4000


def _final_state_rows(table):
    return {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in table.read().collect()
    }


def _oracle_state(env_df):
    events = [r.asDict(recursive=True) for r in env_df.collect()]
    state = sequential_oracle(events)
    return {
        k: hashlib.sha256(v["content"].encode()).hexdigest() for k, v in state.items()
    }


def test_full_replay_matches_oracle(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=42, n_repos=20)
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, N_EVENTS, n_batches=4)

    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=8)
    engine = CdcEngine(spark, table)
    versions = engine.replay(batch_dir)
    assert len(versions) == 4

    got = _final_state_rows(table)
    want = _oracle_state(gen.events(N_EVENTS))
    assert got == want  # 100% sha256 row equality, both directions


def test_replay_is_idempotent_after_resume(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=7, n_repos=10)
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, 2000, n_batches=4)

    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    # crash simulation: replay only the first 2 batches, then resume from scratch
    from debezium_spark.sources.batches import list_batches, read_batch

    for i, p in enumerate(list_batches(batch_dir)[:2]):
        engine.apply_envelope_batch(read_batch(spark, p), batch_id=f"b{i}")
    fence_mid = table.fence()
    assert fence_mid is not None

    engine2 = CdcEngine(spark, table)  # fresh engine on the same table = restart
    versions = engine2.replay(batch_dir)  # batches 0-1 must be skipped
    assert len(versions) == 2
    # replaying everything again changes nothing (exactly-once)
    v3 = engine2.replay(batch_dir)
    assert v3 == []

    got = _final_state_rows(table)
    want = _oracle_state(gen.events(2000))
    assert got == want


def test_snapshot_then_stream_handoff(spark, tmp_path):
    """FIXTURES.md F4: bootstrap op='r' snapshot pinned at a fence, then
    stream batches strictly after it, including updates to snapshot rows."""
    gen = ChangeLogGenerator(spark, seed=11, n_repos=10)
    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)

    snap = gen.snapshot(500)
    engine.bootstrap(snap, fence=("binlog.000001", -1))
    stream = gen.events(1500)  # pos 0.. > -1
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, 1500, n_batches=3)
    engine.replay(batch_dir)

    snap_events = [r.asDict(recursive=True) for r in snap.collect()]
    stream_events = [r.asDict(recursive=True) for r in stream.collect()]
    # oracle: snapshot rows first (pos=-1), then the stream
    state = sequential_oracle(snap_events + stream_events)
    want = {
        k: hashlib.sha256(v["content"].encode()).hexdigest() for k, v in state.items()
    }
    assert _final_state_rows(table) == want


def test_lineage_and_fence_committed_atomically(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=3, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, 1000, n_batches=2)
    engine.replay(batch_dir)

    lin = table.lineage()
    assert lin, "lineage rows must ride the commit"
    assert {"batch", "bucket", "events", "deletes", "upserts", "fence_pos"} <= set(lin[0])
    assert table.fence() == ("binlog.000001", 999)


def test_snapshot_mode_selection(spark, tmp_path):
    """snapshot.mode semantics: initial / when_needed / never / schema_only
    (reference MySqlConnectorConfig.SnapshotMode + coordinator ordering)."""
    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
    from pyspark.sql import functions as F

    gen = ChangeLogGenerator(spark, seed=3, n_repos=5)
    batch_dir = str(tmp_path / "b")
    gen.write_batches(batch_dir, 600, n_batches=2)
    snap = gen.snapshot(200)

    # when_needed on a fresh table -> bootstraps, then streams
    t1 = LakeTable(spark, str(tmp_path / "t1"), ["repo", "path"], n_buckets=4)
    e1 = CdcEngine(spark, t1)
    e1.run(batch_dir, snapshot_env=snap, snapshot_mode="when_needed")
    assert t1.fence()[1] == 599
    assert any(r["batch"].startswith("snapshot") for r in t1.lineage())

    # when_needed on a table with offsets -> snapshot skipped
    e1.run(batch_dir, snapshot_env=snap, snapshot_mode="when_needed")
    assert sum(1 for r in t1.lineage() if r["batch"].startswith("snapshot")) <= t1.n_buckets

    # never -> stream only (no snapshot rows ever)
    t2 = LakeTable(spark, str(tmp_path / "t2"), ["repo", "path"], n_buckets=4)
    CdcEngine(spark, t2).run(batch_dir, snapshot_mode="never")
    assert not any(r["batch"].startswith("snapshot") for r in t2.lineage())

    # schema_only -> fence-only commit at the handoff point, rows skipped
    t3 = LakeTable(spark, str(tmp_path / "t3"), ["repo", "path"], n_buckets=4)
    CdcEngine(spark, t3).run(
        batch_dir, snapshot_mode="schema_only",
        snapshot_fence=("binlog.000001", 299),
    )
    # events <= 299 were fenced out; only the tail batch applied
    assert t3.fence()[1] == 599
    lin = t3.lineage()
    assert any(r.get("heartbeat") and r["fence_pos"] == 299 for r in lin)
    applied = [r for r in lin if r["batch"].startswith("batch_") and r["events"] > 0]
    assert all(r["fence_pos"] == 599 for r in applied)


def test_pure_base_mor_read_skips_resolve(spark, tmp_path):
    """After full compaction a MoR read is a plain scan + project — no
    aggregate shuffle (the any_delta fast path)."""
    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable

    gen = ChangeLogGenerator(spark, seed=9, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4, mode="mor")
    engine = CdcEngine(spark, table, compact_depth=0)
    bdir = str(tmp_path / "b")
    gen.write_batches(bdir, 1000, 2)
    engine.replay(bdir)

    with_deltas = table.read()._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in with_deltas  # deltas present -> resolve aggregate

    table.compact()
    pure = table.read()._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in pure and "Exchange" not in pure
    assert table.read().count() > 0


def test_expire_versions_reclaims_disk_and_preserves_state(spark, tmp_path):
    """Snapshot expiration: old manifests + unreferenced data dirs go away,
    the live state (and its rename/burned ledgers) survive, expired
    versions stop time-traveling."""
    import os
    import pytest
    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable

    gen = ChangeLogGenerator(spark, seed=6, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4, mode="cow")
    engine = CdcEngine(spark, table)
    for b in range(4):
        engine.apply_envelope_batch(gen.events(200, start_pos=b * 200), batch_id=f"b{b}")
    table.alter_rename_column("commit", "commit_sha")
    v_old = 1
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    data_dirs_before = len(os.listdir(os.path.join(str(tmp_path / "t"), "data")))

    table.expire_versions(keep_last=2)

    assert {(r["repo"], r["path"]): r["content"] for r in table.read().collect()} == state
    assert table.manifest().get("renames") == {"commit_sha": ["commit"]}
    assert len(os.listdir(os.path.join(str(tmp_path / "t"), "data"))) < data_dirs_before
    with pytest.raises(FileNotFoundError):
        table.manifest(version=v_old)
    # engine still resumes exactly-once after expiry
    assert engine.apply_envelope_batch(gen.events(200), batch_id="replay") is None


def test_orphan_data_files_are_invisible_after_crash(spark, tmp_path):
    """Crash between data write and manifest publish leaves orphan files;
    they must never surface in reads and resume must re-apply cleanly."""
    import os
    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
    from pyspark.sql import functions as F

    gen = ChangeLogGenerator(spark, seed=12, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    engine.apply_envelope_batch(gen.events(300), batch_id="b0")
    n_before = table.read().count()

    # simulate the crash: a data dir written but never referenced
    orphan = os.path.join(str(tmp_path / "t"), "data", "d-orphan")
    gen.events(50, start_pos=300).select(
        F.col("after.repo").alias("repo"), F.col("after.path").alias("path"),
        F.col("after.commit").alias("commit"), F.col("after.lang").alias("lang"),
        F.lit("ORPHAN").alias("content"), F.lit("u").alias("_op"),
        F.col("source.pos").alias("_pos"),
        F.lit(0).alias("_bucket"),
    ).write.parquet(orphan)

    assert table.read().filter(F.col("content") == "ORPHAN").count() == 0
    assert table.read().count() == n_before
    # the real batch for those offsets applies normally afterwards
    v = engine.apply_envelope_batch(gen.events(50, start_pos=300), batch_id="b1")
    assert v is not None and table.fence()[1] == 349


def test_flatten_drops_engine_tombstones(spark):
    """Review r4 deep-pass: engine tombstones carry the key in `before`, so
    the both-null filter never matched and every delete came out twice."""
    from debezium_spark import ChangeLogGenerator
    from debezium_spark.operators.flatten import extract_new_record_state
    from debezium_spark.operators.tombstones import with_tombstones
    from pyspark.sql import functions as F

    gen = ChangeLogGenerator(spark, seed=21, n_repos=4)
    env = with_tombstones(gen.events(200))
    n_deletes = env.filter((F.col("op") == "d") & ~F.col("_tombstone")).count()
    flat = extract_new_record_state(env, delete_mode="rewrite", drop_tombstones=True)
    assert flat.filter(F.col("__deleted") == "true").count() == n_deletes
    # keep mode retains them
    kept = extract_new_record_state(env, delete_mode="rewrite", drop_tombstones=False)
    assert kept.filter(F.col("__deleted") == "true").count() == 2 * n_deletes


def test_stamp_transaction_exact_above_2_53(spark):
    """Review r4 deep-pass: double division mis-stamped the tail event of a
    transaction at pos > 2^53 into the next transaction."""
    from debezium_spark.operators.transactions import stamp_transaction
    from pyspark.sql import functions as F

    big = 999_999_999_999_999_999
    env = spark.createDataFrame(
        [(big,), (big + 1,)], "pos long"
    ).select(
        F.lit(None).cast("struct<k:string>").alias("before"),
        F.named_struct(F.lit("k"), F.lit("x")).alias("after"),
        F.lit("c").alias("op"), F.lit(0).cast("long").alias("ts_ms"),
        F.struct(F.lit("f").alias("file"), F.col("pos").alias("pos"),
                 F.lit(None).cast("string").alias("gtid"),
                 F.lit(None).cast("string").alias("snapshot"),
                 F.lit("d").alias("db"), F.lit("t").alias("table"),
                 F.lit(0).cast("long").alias("ts_ms")).alias("source"),
        F.lit(None).cast(
            "struct<id:string,total_order:bigint,data_collection_order:bigint>"
        ).alias("transaction"),
    )
    out = {r["source"]["pos"]: r["transaction"]["id"]
           for r in stamp_transaction(env, 10).collect()}
    assert out[big] == f"tx-{big // 10}"
    assert out[big + 1] == f"tx-{(big + 1) // 10}"


def test_list_batches_orders_numerically_past_padding(tmp_path):
    """Final review r5: lexicographic listing replays batch_100000 BEFORE
    batch_99999 once the writer's 5-digit padding overflows — the later
    fence then exactly-once-skips every earlier batch, silently losing
    their events. Order must be numeric on the batch index."""
    import os

    from debezium_spark.sources.batches import list_batches

    names = ["batch_99998.parquet", "batch_100000.parquet",
             "batch_99999.parquet", "batch_00001.parquet"]
    for n in names:
        open(os.path.join(tmp_path, n), "w").close()
    got = [os.path.basename(p) for p in list_batches(str(tmp_path))]
    assert got == ["batch_00001.parquet", "batch_99998.parquet",
                   "batch_99999.parquet", "batch_100000.parquet"]
