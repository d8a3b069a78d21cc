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
    engine.flush_tx_carry()  # end of stream closes the tail transaction

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
    # tx-aligned: the drain's tail transaction (containing pos N/2-1) is
    # deferred until its END arrives with the next batches — the fence
    # stops at the last CLOSED transaction boundary
    half = N_EVENTS // 2 - 1
    tx_start = (half // 10) * 10  # generator tx_size=10
    assert table.fence() == ("binlog.000001", tx_start - 1)

    for n in names[2:]:
        shutil.move(os.path.join(staging, n), os.path.join(live, n))
    stream_replay(spark, engine, live, ckpt, available_now=True).awaitTermination(300)
    engine.flush_tx_carry()

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
    engine.flush_tx_carry()
    v1 = table.manifest()["version"]
    state1 = _state(table)

    # fresh checkpoint = full redelivery; fence must reject every batch
    q2 = stream_replay(spark, engine, batch_dir, str(tmp_path / "ckpt2"), available_now=True)
    q2.awaitTermination(300)
    engine.flush_tx_carry()
    assert table.manifest()["version"] == v1
    assert _state(table) == state1


def test_stream_replay_multi_routes_tables(spark, tmp_path):
    """Wire-format stream fans out to per-table engines with per-table
    fences; redelivered epochs are no-ops."""
    from pyspark.sql.types import StructType
    from debezium_spark.streaming.multi import MultiTableEngine, TableSpec, WIRE_SCHEMA
    from debezium_spark.streaming.structured import stream_replay_multi

    rows = [
        {"before_json": None,
         "after_json": '{"k": %d, "v": "v%d"}' % (i % 40, i),
         "op": "c" if i % 3 else "u",
         "ts_ms": i,
         "source": {"file": "f1", "pos": i, "gtid": None, "snapshot": None,
                    "db": "app", "table": "a" if i % 2 == 0 else "b", "ts_ms": i},
         "transaction": None}
        for i in range(400)
    ]
    bdir = tmp_path / "wire"
    bdir.mkdir()
    wire = spark.createDataFrame(rows, WIRE_SCHEMA)
    wire.filter("source.pos < 200").write.parquet(str(bdir / "batch_00000"))
    wire.filter("source.pos >= 200").write.parquet(str(bdir / "batch_00001"))

    mte = MultiTableEngine(
        spark, str(tmp_path / "lake"),
        [TableSpec("app", "a", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2),
         TableSpec("app", "b", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)],
    )
    q = stream_replay_multi(spark, mte, str(bdir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    ta, tb = mte.table("app", "a"), mte.table("app", "b")
    assert ta.fence()[1] == 398 and tb.fence()[1] == 399
    # even i -> table a, k = i % 40 -> the 20 even keys (odd keys -> b)
    assert ta.read().count() == 20 and tb.read().count() == 20
    # last-writer-wins per key across the stream
    last_a = {r["k"]: r["v"] for r in ta.read().collect()}
    expect_a = {}
    for i in range(0, 400, 2):
        expect_a[i % 40] = f"v{i}"
    assert last_a == expect_a
