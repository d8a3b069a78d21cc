"""TRUNCATE events (op='t', Envelope.java:498-505): a mid-batch truncate is
a barrier — rows before it vanish, rows after it survive — and replaying the
batch after the truncate is a no-op (fence covers barriers too)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable


def _truncate_row(spark, env_schema, pos: int):
    pay_t = env_schema["after"].dataType
    tx_t = env_schema["transaction"].dataType
    return spark.range(1).select(
        F.lit(None).cast(pay_t).alias("before"),
        F.lit(None).cast(pay_t).alias("after"),
        F.lit("t").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct(
            F.lit("binlog.000001").alias("file"),
            F.lit(pos).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.lit("inventory").alias("db"),
            F.lit("repo_files").alias("table"),
            F.lit(0).cast("long").alias("ts_ms"),
        ).alias("source"),
        F.lit(None).cast(tx_t).alias("transaction"),
    )


def test_truncate_mid_batch_is_a_barrier(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=13, n_repos=10)
    env = gen.events(1000)
    trunc_pos = 600
    env2 = (
        env.filter(F.col("source.pos") != trunc_pos)
        .unionByName(_truncate_row(spark, env.schema, trunc_pos))
    )

    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    engine.apply_envelope_batch(env2, batch_id="b0")

    # surviving state = sequential apply of only the events after the truncate
    survivors = table.read().select("repo", "path").collect()
    max_pre = (
        table.read()
        .join(
            gen.events(1000).filter(F.col("source.pos") < trunc_pos).select(
                F.col("after.repo").alias("repo"), F.col("after.path").alias("path")
            ).distinct(),
            on=["repo", "path"],
            how="left_semi",
        )
    )
    # every surviving key must have at least one event after the truncate
    post_keys = (
        gen.events(1000)
        .filter(F.col("source.pos") > trunc_pos)
        .select(
            F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("repo"),
            F.coalesce(F.col("after.path"), F.col("before.path")).alias("path"),
        )
        .distinct()
    )
    n_outside = table.read().join(post_keys, on=["repo", "path"], how="left_anti").count()
    assert n_outside == 0, "rows from before the truncate leaked through"
    assert table.read().count() > 0
    assert table.fence() == ("binlog.000001", 999)

    # exactly-once across the barrier
    v = engine.apply_envelope_batch(env2, batch_id="b0-again")
    assert v is None
    # truncate recorded in lineage
    assert any(l.get("truncate") for l in table.lineage())


def test_truncate_table_sql_text_routes_to_truncate_barrier(spark, tmp_path):
    """TRUNCATE TABLE arriving as SQL *text* (op='l', the DDL stream form)
    must hit the same barrier as the typed op='t' event."""
    gen = ChangeLogGenerator(spark, seed=22, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    env = gen.events(500)
    engine.apply_envelope_batch(env, batch_id="b0")
    assert table.read().count() > 0

    pay_t = env.schema["after"].dataType
    tx_t = env.schema["transaction"].dataType
    content = "TRUNCATE TABLE inventory.repo_files"
    ddl = spark.range(1).select(
        F.lit(None).cast(pay_t).alias("before"),
        F.lit(None).cast(pay_t).alias("after"),
        F.lit("l").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct(
            F.lit("binlog.000001").alias("file"),
            F.lit(500).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.lit("inventory").alias("db"),
            F.lit("repo_files").alias("table"),
            F.lit(0).cast("long").alias("ts_ms"),
        ).alias("source"),
        F.lit(None).cast(tx_t).alias("transaction"),
        F.lit(content).alias("_ddl_text"),
    )
    engine.apply_envelope_batch(ddl, batch_id="b1")
    assert table.read().count() == 0
    assert table.fence() == ("binlog.000001", 500)


def test_fork_op_codes_control_rows_and_cascade(spark, tmp_path):
    """Fork op codes (Envelope.java:34-98): 'm' MESSAGE / 'i' CREATE_INDEX /
    'ts' TABLE_SNAPSHOT / 'p' PATH are payload-free control rows — they
    consume offsets (fence advances) but never merge and never quarantine;
    'tc' TRUNCATE_CASCADE is the same barrier as 't'."""
    gen = ChangeLogGenerator(spark, seed=24, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    env = gen.events(300)
    pay_t = env.schema["after"].dataType
    tx_t = env.schema["transaction"].dataType

    def ctrl(pos, op):
        return spark.range(1).select(
            F.lit(None).cast(pay_t).alias("before"),
            F.lit(None).cast(pay_t).alias("after"),
            F.lit(op).alias("op"),
            F.lit(0).cast("long").alias("ts_ms"),
            F.struct(
                F.lit("binlog.000001").alias("file"),
                F.lit(pos).cast("long").alias("pos"),
                F.lit(None).cast("string").alias("gtid"),
                F.lit(None).cast("string").alias("snapshot"),
                F.lit("inventory").alias("db"),
                F.lit("repo_files").alias("table"),
                F.lit(0).cast("long").alias("ts_ms"),
            ).alias("source"),
            F.lit(None).cast(tx_t).alias("transaction"),
        )

    batch = env
    for pos, op in [(300, "m"), (301, "i"), (302, "ts"), (303, "p")]:
        batch = batch.unionByName(ctrl(pos, op))
    engine.apply_envelope_batch(batch, batch_id="b0")
    n = table.read().count()
    assert n > 0
    assert table.fence() == ("binlog.000001", 303)  # control offsets consumed
    assert engine.read_quarantine().count() == 0    # never quarantined

    # 'tc' truncates like 't'
    engine.apply_envelope_batch(ctrl(304, "tc"), batch_id="b1")
    assert table.read().count() == 0
    assert table.fence() == ("binlog.000001", 304)


def test_truncate_sql_for_other_table_is_history_only(spark, tmp_path):
    """Review regression: a TRUNCATE statement naming a DIFFERENT table
    (e.g. inside a multi-statement script) truncated THIS capture; the
    target must match the row's source identity."""
    gen = ChangeLogGenerator(spark, seed=23, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    env = gen.events(500)
    engine.apply_envelope_batch(env, batch_id="b0")
    n = table.read().count()
    assert n > 0

    pay_t = env.schema["after"].dataType
    tx_t = env.schema["transaction"].dataType
    ddl = spark.range(1).select(
        F.lit(None).cast(pay_t).alias("before"),
        F.lit(None).cast(pay_t).alias("after"),
        F.lit("l").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct(
            F.lit("binlog.000001").alias("file"),
            F.lit(500).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit(None).cast("string").alias("snapshot"),
            F.lit("inventory").alias("db"),
            F.lit("repo_files").alias("table"),
            F.lit(0).cast("long").alias("ts_ms"),
        ).alias("source"),
        F.lit(None).cast(tx_t).alias("transaction"),
        F.lit("TRUNCATE TABLE inventory.audit_log").alias("_ddl_text"),
    )
    engine.apply_envelope_batch(ddl, batch_id="b1")
    assert table.read().count() == n  # untouched
    assert table.fence() == ("binlog.000001", 500)  # barrier still fences


def test_truncate_only_batch_empties_table(spark, tmp_path):
    gen = ChangeLogGenerator(spark, seed=21, n_repos=5)
    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    engine = CdcEngine(spark, table)
    env = gen.events(500)
    engine.apply_envelope_batch(env, batch_id="b0")
    assert table.read().count() > 0

    t_only = _truncate_row(spark, env.schema, 500)
    engine.apply_envelope_batch(t_only, batch_id="b1")
    assert table.read().count() == 0
    assert table.fence() == ("binlog.000001", 500)
