"""Fail-record quarantine: a poison row parks in quarantine, the batch
commits, the fence advances (reference fail-SQL ledger,
TableReplayTask.java:61,98,612)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable


def test_poison_rows_divert_and_batch_commits(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=31, n_repos=6)
    env = gen.events(500)
    # corrupt: null key on some creates, an unknown op on one row
    env = env.withColumn(
        "after",
        F.when(
            (F.col("op") == "c") & (F.pmod(F.col("source.pos"), F.lit(50)) == 0),
            F.col("after").withField("path", F.lit(None).cast("string")),
        ).otherwise(F.col("after")),
    ).withColumn(
        "op", F.when(F.col("source.pos") == 123, F.lit("zz")).otherwise(F.col("op"))
    )

    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    v = engine.apply_envelope_batch(env, batch_id="b0")
    assert v is not None
    assert table.fence()[1] == 499  # fence covers quarantined offsets too

    q = engine.read_quarantine()
    reasons = {r["reason"] for r in q.select("reason").distinct().collect()}
    assert reasons == {"null_key", "unknown_op"}
    assert q.filter(F.col("pos") == 123).first()["reason"] == "unknown_op"
    n_bad = q.count()
    assert n_bad == env.filter(
        ((F.col("op") == "c") & (F.pmod(F.col("source.pos"), F.lit(50)) == 0))
        | (F.col("op") == "zz")
    ).count()
    # quarantined records keep the full wire JSON for manual re-apply
    assert q.filter(F.col("record_json").isNull()).count() == 0

    # no null-keyed rows leaked into the table
    assert table.read().filter(F.col("path").isNull()).count() == 0

    # crash-replay: same batch re-applied -> fence skip, no quarantine dupes
    engine.apply_envelope_batch(env, batch_id="b0")
    assert engine.read_quarantine().count() == n_bad


def test_malformed_wire_json_quarantines_in_multi_table(spark, tmp_path):
    """A wire payload that fails from_json parses to a null payload ->
    null_payload/null_key quarantine, not a crashed batch."""
    from pyspark.sql.types import StructType
    from debezium_spark.streaming.multi import MultiTableEngine, TableSpec, WIRE_SCHEMA

    rows = [
        {"before_json": None, "after_json": '{"k": 1, "v": "ok"}', "op": "c",
         "ts_ms": 0, "source": {"file": "f", "pos": 0, "gtid": None, "snapshot": None,
         "db": "app", "table": "t", "ts_ms": 0}, "transaction": None},
        {"before_json": None, "after_json": "{not-json", "op": "c",
         "ts_ms": 0, "source": {"file": "f", "pos": 1, "gtid": None, "snapshot": None,
         "db": "app", "table": "t", "ts_ms": 0}, "transaction": None},
    ]
    wire = spark.createDataFrame(rows, WIRE_SCHEMA)
    mte = MultiTableEngine(
        spark, str(tmp_path / "lake"),
        [TableSpec("app", "t", StructType.fromDDL("k long, v string"), ["k"], n_buckets=2)],
    )
    mte.apply_wire_batch(wire, batch_id="b0")
    t = mte.table("app", "t")
    assert t.fence()[1] == 1
    assert [r["k"] for r in t.read().collect()] == [1]
    eng = mte.engines[("app", "t")]
    q = eng.read_quarantine().collect()
    assert len(q) == 1 and q[0]["pos"] == 1


def test_null_op_is_quarantined_not_applied(spark, tmp_path):
    """Review r4 deep-pass: op IS NULL slipped through validity_reason's
    three-valued logic and applied as an UPSERT; it must flag unknown_op."""
    from pyspark.sql.types import StructType
    import json as _json
    from debezium_spark import CdcEngine, LakeTable
    from debezium_spark.operators.quarantine import read_quarantine

    ddl_nullable = (
        "before struct<repo:string,path:string,content:string>, "
        "after struct<repo:string,path:string,content:string>, "
        "op string, ts_ms long, "
        "source struct<file:string,pos:bigint,gtid:string,snapshot:string,"
        "db:string,table:string,ts_ms:bigint>, "
        "transaction struct<id:string,total_order:bigint,data_collection_order:bigint>"
    )
    rows = [
        {"before": None, "after": {"repo": "r", "path": "p1", "content": "ok"},
         "op": "c", "ts_ms": 1,
         "source": {"file": "f", "pos": 1, "gtid": None, "snapshot": None,
                    "db": "d", "table": "t", "ts_ms": 1}, "transaction": None},
        {"before": None, "after": {"repo": "r", "path": "p2", "content": "evil"},
         "op": None, "ts_ms": 2,
         "source": {"file": "f", "pos": 2, "gtid": None, "snapshot": None,
                    "db": "d", "table": "t", "ts_ms": 2}, "transaction": None},
    ]
    env = spark.createDataFrame(rows, ddl_nullable)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    CdcEngine(spark, table).apply_envelope_batch(env, batch_id="b0")
    assert {r["path"] for r in table.read().collect()} == {"p1"}
    q = read_quarantine(spark, str(tmp_path / "t")).collect()
    assert len(q) == 1 and q[0]["reason"] == "unknown_op"


def test_null_file_barrier_never_fence_skips_the_segment(spark, tmp_path):
    """Review r5: under the file-major offset key a null file sorts BEFORE
    every real file, so a null-file op='l' barrier row used to poison its
    segment's fence — offset_key(None, p) compared <= the table fence and
    the WHOLE preceding segment of valid rows silently fence-skipped
    (data loss), with the batch-end fence then making the loss permanent.
    The barrier must quarantine (null_offset) and the valid rows apply."""
    gen = ChangeLogGenerator(spark, seed=7, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    # establish a real fence first
    engine.apply_envelope_batch(gen.events(100), batch_id="b0")
    fence0 = table.fence()
    assert fence0 is not None and fence0[0] is not None
    before = table.read().count()

    # next batch: valid creates at pos 100..149 plus one null-file barrier
    env = gen.events(150).filter(F.col("source.pos") >= 100)
    barrier = env.limit(1).select(
        F.lit(None).cast(env.schema["before"].dataType).alias("before"),
        F.lit(None).cast(env.schema["after"].dataType).alias("after"),
        F.lit("l").alias("op"),
        F.lit(2000).alias("ts_ms"),
        F.struct(
            F.lit(None).cast("string").alias("file"),
            F.lit(150).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.lit("app").alias("db"), F.lit("t").alias("table"),
            F.lit(2000).cast("long").alias("ts_ms"),
        ).alias("source"),
        F.lit(None).cast(env.schema["transaction"].dataType).alias("transaction"),
    )
    engine.apply_envelope_batch(env.unionByName(barrier), batch_id="b1")

    # the valid rows applied — nothing fence-skipped; the fence covers the
    # quarantined barrier's offset too (quarantine contract), in the valid
    # rows' file
    assert table.read().count() > before
    assert table.fence() == (fence0[0], 150)
    q = engine.read_quarantine()
    assert q.filter(
        (F.col("op") == "l") & F.col("file").isNull()
    ).first()["reason"] == "null_offset"


def test_all_null_file_batch_quarantines_not_skips(spark, tmp_path):
    """Review r5 companion: a batch whose rows all carry null file but
    valid pos used to compare offset_key('', pos) <= fence and vanish in
    the replay skip; it must reach quarantine instead."""
    gen = ChangeLogGenerator(spark, seed=9, n_repos=4)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    engine.apply_envelope_batch(gen.events(50), batch_id="b0")
    n0 = table.read().count()

    poisoned = gen.events(80).filter(F.col("source.pos") >= 50).withColumn(
        "source", F.col("source").withField("file", F.lit(None).cast("string"))
    )
    engine.apply_envelope_batch(poisoned, batch_id="b1")
    assert table.read().count() == n0  # nothing applied…
    q = engine.read_quarantine()
    assert q.filter(F.col("reason") == "null_offset").count() == 30  # …nothing lost


def test_strict_mode_fails_batch_instead_of_dropping(spark, tmp_path):
    """Final review r5: with quarantine=False a null-offset or unknown-op
    row was silently DROPPED by the three-valued segment/control filters —
    neither merged, nor errored, nor quarantined, while the fence advanced
    past it. Strict mode now fails the batch loudly (Kafka Connect
    errors.tolerance=none semantics), naming the validity reason."""
    import pytest

    gen = ChangeLogGenerator(spark, seed=53, n_repos=4)
    env = gen.events(100)
    bad = env.withColumn(
        "source",
        F.when(
            F.col("source.pos") == 42,
            F.col("source").withField("pos", F.lit(None).cast("long")),
        ).otherwise(F.col("source")),
    )
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    strict = CdcEngine(spark, table, quarantine=False)
    with pytest.raises(ValueError, match="null_offset"):
        strict.apply_envelope_batch(bad, batch_id="b0")
    # the batch did NOT commit — no fence, no partial data
    assert table.fence() is None

    # a clean batch applies normally in strict mode
    v = strict.apply_envelope_batch(env, batch_id="b0")
    max_pos = env.agg(F.max("source.pos")).first()[0]
    assert v is not None and table.fence()[1] == max_pos

    # the offset-less-batch path fails loudly too (it used to return None
    # after silently discarding the poison rows)
    allbad = env.limit(3).withColumn(
        "source", F.col("source").withField("pos", F.lit(None).cast("long"))
    )
    t2 = LakeTable(spark, str(tmp_path / "t2"), ["repo", "path"], n_buckets=4)
    with pytest.raises(ValueError, match="strict mode"):
        CdcEngine(spark, t2, quarantine=False).apply_envelope_batch(
            allbad, batch_id="b0"
        )
