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
    assert table.fence() == (fence_before[0], fence_before[1] + 1)
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
