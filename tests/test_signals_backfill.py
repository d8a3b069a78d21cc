"""Signal table parsing + incremental-snapshot backfill: an
execute-snapshot signal mid-stream re-reads a chunk without losing later
stream updates (DBLog window semantics via pos-stamping)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
from debezium_spark.operators.signals import read_signals


def test_read_signals_parses_known_actions(spark):
    rows = [
        ("s1", "log", json.dumps({"message": "hi"})),
        ("s2", "execute-snapshot", json.dumps({"data-collections": ["inventory.repo_files"]})),
        ("s3", "unknown-action", None),
        ("s4", "schema-changes", "not-json"),
    ]
    df = spark.createDataFrame(rows, "id string, type string, data string")
    actions = read_signals(df)
    assert [a.type for a in actions] == ["log", "execute-snapshot", "schema-changes"]
    assert actions[1].data["data-collections"] == ["inventory.repo_files"]
    assert actions[2].data == {}


def test_backfill_overwrites_stale_not_fresh(spark, tmp_path):
    """Chunk rows must overwrite state older than the window, but stream
    events applied *after* the backfill must win over chunk rows."""
    gen = ChangeLogGenerator(spark, seed=23, n_repos=8)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)

    # stream prefix
    batch_dir = str(tmp_path / "b")
    gen.write_batches(batch_dir, 1000, n_batches=2)
    engine.replay(batch_dir)
    fence_before = table.fence()

    # backfill chunk: re-read "the source" — here, current state with a
    # marker content proving the chunk version landed
    chunk = gen.snapshot(300).withColumn(
        "after", F.col("after").withField("content", F.lit("CHUNK"))
    )
    engine.backfill(chunk, batch_id="bf0")
    # the fence must NOT advance: pos is a dense event index, so a real
    # unapplied event exists at fence+1 — advancing past it would drop it
    assert table.fence() == fence_before
    backfilled = table.read().filter(F.col("content") == "CHUNK").count()
    assert backfilled > 0

    # later stream events must override chunk rows
    post = gen.events(500, start_pos=2000)
    engine.apply_envelope_batch(post, batch_id="b2")
    post_keys = (
        post.filter(F.col("op") != "d")
        .select(F.col("after.repo").alias("repo"), F.col("after.path").alias("path"))
        .distinct()
    )
    still_chunk = (
        table.read()
        .filter(F.col("content") == "CHUNK")
        .join(post_keys, on=["repo", "path"], how="left_semi")
        .count()
    )
    assert still_chunk == 0, "stream events after the backfill must win"


def test_backfill_does_not_drop_next_event(spark, tmp_path):
    """Regression (ADVICE r1): the event at exactly fence+1 must survive a
    backfill — the old code advanced the fence to fence+1 and the fence
    skip then silently dropped any batch ending there."""
    gen = ChangeLogGenerator(spark, seed=7, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4, mode="cow")
    engine = CdcEngine(spark, table)

    engine.apply_envelope_batch(gen.events(100), batch_id="b0")  # fence -> 99
    assert table.fence()[1] == 99

    chunk = gen.snapshot(50).withColumn(
        "after", F.col("after").withField("content", F.lit("CHUNK"))
    )
    engine.backfill(chunk, batch_id="bf")
    assert table.fence()[1] == 99

    # one-event batch at pos 100 == old fence+1: must be applied, not skipped
    nxt = gen.events(1, start_pos=100).withColumn(
        "after", F.col("after").withField("content", F.lit("EVENT-100"))
    )
    v = engine.apply_envelope_batch(nxt, batch_id="b1")
    assert v is not None
    assert table.fence()[1] == 100
    assert table.read().filter(F.col("content") == "EVENT-100").count() == 1


def test_backfill_mor_tie_is_deterministic(spark, tmp_path):
    """In MoR mode the chunk row must deterministically beat applied events
    at pos <= fence and lose to the real event at fence+1 (sub-position
    encoding, not a nondeterministic max_by tie)."""
    gen = ChangeLogGenerator(spark, seed=11, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4, mode="mor")
    engine = CdcEngine(spark, table, compact_depth=0)

    engine.apply_envelope_batch(gen.events(200), batch_id="b0")
    chunk = gen.snapshot(100).withColumn(
        "after", F.col("after").withField("content", F.lit("CHUNK"))
    )
    engine.backfill(chunk, batch_id="bf")

    # chunk beats everything applied so far for the keys it covers
    chunk_keys = chunk.select(
        F.col("after.repo").alias("repo"), F.col("after.path").alias("path")
    ).distinct()
    covered = table.read().join(chunk_keys, ["repo", "path"], "left_semi")
    assert covered.filter(F.col("content") != "CHUNK").count() == 0

    # the real event at fence+1 (pos 200) beats the chunk for its key
    nxt = gen.events(1, start_pos=200).withColumn(
        "after", F.col("after").withField("content", F.lit("EVENT-200"))
    ).withColumn("op", F.lit("u"))
    engine.apply_envelope_batch(nxt, batch_id="b1")
    key = nxt.select(F.col("after.repo").alias("repo"), F.col("after.path").alias("path"))
    got = table.read().join(key, ["repo", "path"], "left_semi").select("content").collect()
    assert [r["content"] for r in got] == ["EVENT-200"]


def test_heartbeat_advances_fence_on_idle(spark, tmp_path):
    """Offset-bearing heartbeat: an SMT-filtered-to-empty batch and an
    explicit heartbeat() both advance the fence with a heartbeat lineage
    row (reference heartbeat/Heartbeat.java:27-79)."""
    from debezium_spark.operators.filters import skipped_operations

    gen = ChangeLogGenerator(spark, seed=3, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table, smt_chain=[lambda df: skipped_operations(df, ["c", "u", "d"])])

    engine.apply_envelope_batch(gen.events(100), batch_id="b0")
    # every row dropped by the SMT, but the source consumed offsets 0..99
    assert table.fence()[1] == 99
    hb = [r for r in table.lineage() if r.get("heartbeat")]
    assert hb and hb[-1]["fence_pos"] == 99

    # explicit idle heartbeat (source reports progress, zero rows)
    engine.heartbeat(("binlog.000001", 150))
    assert table.fence()[1] == 150
    assert any(r.get("heartbeat") and r["fence_pos"] == 150 for r in table.lineage())


def test_incremental_snapshot_chunks_interleave_with_stream(spark, tmp_path):
    """DBLog chunk orchestration: a chunked re-snapshot lands mid-stream,
    chunk rows overwrite stale state, and stream events after the window
    still win — across every chunk."""
    gen = ChangeLogGenerator(spark, seed=29, n_repos=6)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)

    engine.apply_envelope_batch(gen.events(1000), batch_id="b0")
    fence0 = table.fence()

    chunk_src = gen.snapshot(400).withColumn(
        "after", F.col("after").withField("content", F.lit("RESNAP"))
    )
    n_chunks = engine.incremental_snapshot(chunk_src, chunk_size=150)
    assert n_chunks == 3
    assert table.fence() == fence0  # no chunk may advance the fence
    resnapped = table.read().filter(F.col("content") == "RESNAP").count()
    assert resnapped > 0

    post = gen.events(300, start_pos=1000)
    engine.apply_envelope_batch(post, batch_id="b1")
    post_keys = (
        post.filter(F.col("op") != "d")
        .select(F.col("after.repo").alias("repo"), F.col("after.path").alias("path"))
        .distinct()
    )
    leftover = (
        table.read().filter(F.col("content") == "RESNAP")
        .join(post_keys, ["repo", "path"], "left_semi").count()
    )
    assert leftover == 0


def test_signal_log_and_schema_changes_actions(spark, tmp_path):
    """The two remaining Signal.java actions (signal/Log.java,
    signal/SchemaChanges.java): `log` lands the message as a durable
    lineage row; `schema-changes` re-emits the schema-history ledger as
    ordered schema-change envelope rows."""
    from debezium_spark.operators.schema_evolution import apply_ddl
    from debezium_spark.operators.signals import dispatch_signals

    gen = ChangeLogGenerator(spark, seed=5, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    engine.apply_envelope_batch(gen.events(100), batch_id="b0")
    apply_ddl(table, "ALTER TABLE t ADD COLUMN c1 INT DEFAULT 7", ("binlog.000001", 100))
    apply_ddl(table, "ALTER TABLE t RENAME COLUMN c1 TO c2", ("binlog.000001", 101))

    signals = spark.createDataFrame(
        [
            ("sig-1", "log", json.dumps({"message": "checkpoint A reached"})),
            ("sig-2", "schema-changes", None),
            ("sig-3", "bogus", None),
        ],
        "id string, type string, data string",
    )
    results = dispatch_signals(engine, signals)
    assert [(r[0], r[1]) for r in results] == [
        ("sig-1", "log"), ("sig-2", "schema-changes")
    ]

    # log: durable lineage row, fence untouched
    fence = table.fence()
    logs = [r for r in table.lineage() if r.get("signal") == "log"]
    assert logs and logs[-1]["message"] == "checkpoint A reached"
    assert logs[-1]["batch"] == "signal/sig-1"
    assert table.fence() == fence

    # schema-changes: the ledger as envelope rows, in offset order
    hist = results[1][2].collect()
    assert [(r["offset_pos"], r["op"]) for r in hist] == [(100, "l"), (101, "l")]
    assert "ADD COLUMN c1" in hist[0]["ddl"]
    assert json.loads(hist[0]["ops_json"]) == [["add", "c1", "int", "7"]]
    assert hist[1]["schema_version"] > hist[0]["schema_version"]

    # after ledger compaction the folded per-op entries are gone — the
    # signal re-emits the checkpoint FIRST as a synthetic baseline row
    # (complete schema state) so a consumer can still rebuild its history
    from debezium_spark.operators.schema_evolution import compact_schema_history

    assert compact_schema_history(table) == 2
    apply_ddl(table, "ALTER TABLE t ADD COLUMN c3 INT", ("binlog.000002", 5))
    hist2 = dispatch_signals(engine, signals)[1][2].collect()
    assert [(r["offset_pos"], r["ddl"] is None) for r in hist2] == [
        (101, True),   # checkpoint baseline at the fold fence
        (5, False),    # post-compaction tail entry (later file)
    ]
    baseline = json.loads(hist2[0]["ops_json"])
    assert baseline["checkpoint"] is True and baseline["folded"] == 2
    assert "c2" in baseline["schema"]  # the folded rename's final state


def test_signal_execute_snapshot_via_dispatch(spark, tmp_path):
    from debezium_spark.operators.signals import dispatch_signals

    gen = ChangeLogGenerator(spark, seed=13, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    engine.apply_envelope_batch(gen.events(300), batch_id="b0")

    chunk_src = gen.snapshot(100).withColumn(
        "after", F.col("after").withField("content", F.lit("SIGSNAP"))
    )
    signals = spark.createDataFrame(
        [("s9", "execute-snapshot",
          json.dumps({"data-collections": ["inventory.repo_files"]}))],
        "id string, type string, data string",
    )
    seen = {}
    results = dispatch_signals(
        engine, signals, snapshot_provider=lambda data: seen.setdefault("d", data) and chunk_src or chunk_src
    )
    assert seen["d"]["data-collections"] == ["inventory.repo_files"]
    assert results[0][1] == "execute-snapshot" and results[0][2] >= 1
    assert table.read().filter(F.col("content") == "SIGSNAP").count() > 0


def test_incremental_snapshot_autosizes_chunks(spark, tmp_path):
    """chunk_size=None bounds the serial commit count by parallelism ×
    CHUNK_PAR_MULT regardless of table size (each chunk is one fence
    commit — the 100-TB posture is a bounded commit count)."""
    gen = ChangeLogGenerator(spark, seed=17, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    engine.apply_envelope_batch(gen.events(200), batch_id="b0")

    src = gen.snapshot(150)
    n = engine.incremental_snapshot(src)  # auto-sized
    par = max(1, spark.sparkContext.defaultParallelism)
    assert 1 <= n <= par * CdcEngine.CHUNK_PAR_MULT
    # 150 rows < CHUNK_SIZE_FLOOR → exactly one chunk
    assert n == 1
    # the bound formula itself, driver-side (no need for a 10^10-row table):
    for rows in (10**6, 10**9, 10**10):
        size = max(CdcEngine.CHUNK_SIZE_FLOOR, -(-rows // (par * CdcEngine.CHUNK_PAR_MULT)))
        assert -(-rows // size) <= par * CdcEngine.CHUNK_PAR_MULT + 1


def test_backfill_on_fresh_table_does_not_claim_event_zero(spark, tmp_path):
    """Review r4 deep-pass: backfill on a table with NO committed fence
    must pin at -1 (nothing applied), not 0 — a 0 fence made the replay
    skip drop the real event at pos 0."""
    gen = ChangeLogGenerator(spark, seed=2, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    engine = CdcEngine(spark, table)
    chunk = gen.snapshot(20).withColumn(
        "after", F.col("after").withField("content", F.lit("CHUNK")))
    engine.backfill(chunk, batch_id="bf")
    assert table.fence()[1] == -1
    # event at pos 0 must still apply
    first = gen.events(1, start_pos=0).withColumn(
        "after", F.col("after").withField("content", F.lit("EVENT-0"))
    ).withColumn("op", F.lit("u"))
    v = engine.apply_envelope_batch(first, batch_id="b0")
    assert v is not None and table.fence()[1] == 0
    assert table.read().filter(F.col("content") == "EVENT-0").count() == 1
