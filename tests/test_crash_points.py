"""Crash-point sweep: kill the driver at EVERY manifest-publish boundary
during a replay, restart, and require byte-identical convergence.

The engine's exactly-once story is fence-in-commit: ``LakeTable._publish``
is the single atomic commit point (numbered manifest + LATEST pointer
swap), so the complete space of crash outcomes is "crashed before the
k-th publish, for every k" — data files may exist unreferenced, the carry
may be stale, a multi-segment DDL batch may be half-committed, but a
restart must converge to the uncrashed run's exact state. The reference
argues the same property batch-wise via its breakpoint ledger
(``BreakPointRecord.java``); this sweep proves it at every commit
boundary rather than sampling one mid-stream restart.
"""

from __future__ import annotations

import hashlib

import pytest

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
from debezium_spark.plans.table import LakeTable as _LT

N_EVENTS = 1200
N_BATCHES = 4


def _sha_state(table):
    return {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in table.read().collect()
    }


class _Boom(RuntimeError):
    pass


def _run_with_crash(spark, root, batch_dir, crash_after: int, monkeypatch):
    """Replay with a crash injected before the (crash_after+1)-th publish;
    returns the table (possibly mid-stream). crash_after=None → no crash."""
    table = LakeTable(spark, root, ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    calls = {"n": 0}
    real = _LT._publish

    def wedge(self, man):
        if calls["n"] >= crash_after:
            raise _Boom(f"crash before publish #{calls['n']}")
        calls["n"] += 1
        return real(self, man)

    monkeypatch.setattr(_LT, "_publish", wedge)
    try:
        with pytest.raises(_Boom):
            engine.replay(batch_dir)
    finally:
        monkeypatch.setattr(_LT, "_publish", real)
    return table


def test_crash_at_every_publish_point_converges(spark, tmp_path, monkeypatch):
    gen = ChangeLogGenerator(spark, seed=23, n_repos=10)
    batch_dir = str(tmp_path / "batches")
    gen.write_batches(batch_dir, N_EVENTS, n_batches=N_BATCHES)

    # ground truth: one uncrashed replay
    clean = LakeTable(spark, str(tmp_path / "clean"), ["repo", "path"], n_buckets=4)
    CdcEngine(spark, clean).replay(batch_dir)
    want = _sha_state(clean)
    want_fence = clean.fence()

    # count the REPLAY-time publish points (v0 is the pre-replay create,
    # done before the crash patch engages): versions v1..vN
    n_publishes = clean.manifest()["version"]
    assert n_publishes >= N_BATCHES

    for k in range(n_publishes):
        root = str(tmp_path / f"crash_{k}")
        table = _run_with_crash(spark, root, batch_dir, k, monkeypatch)
        # restart: fresh engine on the same table root, replay to the end
        engine2 = CdcEngine(spark, table)
        engine2.replay(batch_dir)
        assert _sha_state(table) == want, f"diverged after crash at publish {k}"
        assert table.fence() == want_fence, f"fence diverged at publish {k}"
        # and a further replay is a no-op (exactly-once held through the
        # crash-resume cycle)
        assert engine2.replay(batch_dir) == []


def test_crash_during_tx_carry_persistence_converges(spark, tmp_path, monkeypatch):
    """The carry write is NOT a manifest publish — crash between the
    closed-part commit and the carry materialization, then resume: the
    re-read batch regenerates the identical carry (deterministic split)
    and the fence dedupes the re-applied closed part."""
    import pyspark.sql.functions as F

    gen = ChangeLogGenerator(spark, seed=31, n_repos=8)
    env = gen.events(600)
    # stamp transaction ids so the tail-tx split engages: 50-event txs
    env = env.withColumn(
        "transaction",
        F.struct(
            F.concat(F.lit("tx-"), (F.col("source.pos") / 50).cast("long").cast("string")).alias("id"),
            F.lit(0).cast("long").alias("total_order"),
            F.lit(0).cast("long").alias("data_collection_order"),
        ),
    )
    bdir = tmp_path / "batches"
    # split mid-tx: batch 0 ends inside tx-5 (pos 275), so its tail defers
    env.where(F.col("source.pos") <= 275).write.parquet(str(bdir / "batch_00000.parquet"))
    env.where(F.col("source.pos") > 275).write.parquet(str(bdir / "batch_00001.parquet"))

    clean = LakeTable(spark, str(tmp_path / "clean"), ["repo", "path"], n_buckets=4)
    CdcEngine(spark, clean).replay(str(bdir))
    want = _sha_state(clean)

    from debezium_spark.streaming import engine as eng_mod

    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    real = eng_mod.persist_tx_carry
    calls = {"n": 0}

    def wedge(spark_, carry, root, meta=None):
        if calls["n"] == 0:  # first carry write = after batch 0's commit
            calls["n"] += 1
            raise _Boom("crash during carry persistence")
        return real(spark_, carry, root, meta=meta)

    monkeypatch.setattr(eng_mod, "persist_tx_carry", wedge)
    try:
        with pytest.raises(_Boom):
            engine.replay(str(bdir))
    finally:
        monkeypatch.setattr(eng_mod, "persist_tx_carry", real)

    engine2 = CdcEngine(spark, table)  # restart
    engine2.replay(str(bdir))
    assert _sha_state(table) == want
    assert engine2.replay(str(bdir)) == []
