"""Structured Streaming ingestion mode: readStream → foreachBatch → fenced
merge must produce the same final state as batch replay; batches arriving
over time (atomic renames, the documented contract) are applied in order via
the shared checkpoint; and redelivery after checkpoint loss is a no-op
thanks to the sink-side fence."""

from __future__ import annotations

import hashlib
import os
import shutil

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
from debezium_spark.streaming.structured import stream_replay
from tests.conftest import sequential_oracle

N_EVENTS = 2000


def _state(table):
    return {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in table.read().collect()
    }


def _oracle(gen, n):
    events = [r.asDict(recursive=True) for r in gen.events(n).collect()]
    return {
        k: hashlib.sha256(v["content"].encode()).hexdigest()
        for k, v in sequential_oracle(events).items()
    }


def test_stream_drain_matches_batch_oracle(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=42, n_repos=15)
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, N_EVENTS, n_batches=4)

    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    q = stream_replay(spark, engine, batch_dir, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    assert _state(table) == _oracle(gen, N_EVENTS)
    assert table.fence() == ("binlog.000001", N_EVENTS - 1)


def test_stream_incremental_arrival(spark, tmp_path):
    """Batches land over time (atomic dir renames); successive availableNow
    drains over one checkpoint apply only the new ones, in order."""
    gen = ChangeLogGenerator(spark, seed=9, n_repos=10)
    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    os.makedirs(live)
    gen.write_batches(staging, N_EVENTS, n_batches=4)
    names = sorted(os.listdir(staging))

    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    ckpt = str(tmp_path / "ckpt")

    for n in names[:2]:
        shutil.move(os.path.join(staging, n), os.path.join(live, n))
    stream_replay(spark, engine, live, ckpt, available_now=True).awaitTermination(300)
    assert table.fence() == ("binlog.000001", N_EVENTS // 2 - 1)

    for n in names[2:]:
        shutil.move(os.path.join(staging, n), os.path.join(live, n))
    stream_replay(spark, engine, live, ckpt, available_now=True).awaitTermination(300)

    assert _state(table) == _oracle(gen, N_EVENTS)
    assert table.fence() == ("binlog.000001", N_EVENTS - 1)


def test_stream_redelivery_is_noop(spark, tmp_path):
    """Lost checkpoint ⇒ the stream redelivers everything; the table fence
    (not the checkpoint) is what guarantees exactly-once."""
    gen = ChangeLogGenerator(spark, seed=5, n_repos=8)
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, 1000, n_batches=2)

    table = LakeTable(spark, str(tmp_path / "table"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    q = stream_replay(spark, engine, batch_dir, str(tmp_path / "ckpt1"), available_now=True)
    q.awaitTermination(300)
    v1 = table.manifest()["version"]
    state1 = _state(table)

    # fresh checkpoint = full redelivery; fence must reject every batch
    q2 = stream_replay(spark, engine, batch_dir, str(tmp_path / "ckpt2"), available_now=True)
    q2.awaitTermination(300)
    assert table.manifest()["version"] == v1
    assert _state(table) == state1
