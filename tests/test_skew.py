"""Commit-hotspot skew (north rule): a single (repo, path) key receiving a
large fraction of all updates must neither slow the merge pathologically nor
break correctness. Two mechanisms are under test:

1. last-wins dedupe uses ``groupBy(key).agg(max_by(...))`` — a partial
   aggregate, so the hot key collapses to one row *per map task* before the
   shuffle (an explicit window/row_number would instead sort the whole hot
   partition after shuffling every duplicate);
2. the CoW write repartitions by (bucket, salt), so the hot key's bucket is
   rewritten by ``salt_factor`` parallel tasks, not one straggler.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
from debezium_spark.operators.apply import compute_changes, split_pk_changes


def _hot_key_events(gen, n: int, hot_fraction: float = 0.9):
    """Rewrite ~hot_fraction of generated events onto one hot key."""
    env = gen.events(n)
    hot = F.struct(
        F.lit("repo_hot").alias("repo"),
        F.lit("src/hot/file.py").alias("path"),
        F.col("after.commit").alias("commit"),
        F.col("after.lang").alias("lang"),
        F.col("after.content").alias("content"),
    )
    is_hot = F.pmod(F.col("source.pos"), F.lit(10)) < int(hot_fraction * 10)
    return env.withColumn(
        "after", F.when(is_hot & F.col("after").isNotNull(), hot).otherwise(F.col("after"))
    ).withColumn(
        "before",
        F.when(
            is_hot & F.col("before").isNotNull(),
            hot.withField("content", F.col("before.content")),
        ).otherwise(F.col("before")),
    )


def test_hot_key_dedupes_to_one_row(spark):
    gen = ChangeLogGenerator(spark, seed=17, n_repos=10)
    env = _hot_key_events(gen, 20_000)
    changes = compute_changes(split_pk_changes(env, ["repo", "path"]), ["repo", "path"])
    hot_rows = changes.filter(
        (F.col("repo") == "repo_hot") & (F.col("path") == "src/hot/file.py")
    ).collect()
    assert len(hot_rows) == 1
    # the winner must be the event with the greatest pos among hot events
    last = (
        env.filter(F.col("after.repo") == "repo_hot")
        .orderBy(F.desc("source.pos"))
        .select("op", "after.content", "source.pos")
        .first()
    )
    if last["op"] != "d":
        assert hot_rows[0]["content"] == last["content"]


def test_hot_key_replay_matches_sequential_apply(spark, tmp_path):
    import hashlib

    from tests.conftest import sequential_oracle

    gen = ChangeLogGenerator(spark, seed=17, n_repos=10)
    env = _hot_key_events(gen, 20_000)
    batch_dir = str(tmp_path / "b")
    env.write.parquet(batch_dir + "/batch_00000.parquet")

    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table, salt_factor=8)
    engine.replay(batch_dir)

    events = [r.asDict(recursive=True) for r in env.collect()]
    want = {
        k: hashlib.sha256(v["content"].encode()).hexdigest()
        for k, v in sequential_oracle(events).items()
    }
    got = {
        (r["repo"], r["path"]): hashlib.sha256(r["content"].encode()).hexdigest()
        for r in table.read().collect()
    }
    assert got == want
