"""CSV-slice full-migration transport (sources/slices.py + the
tools/full_migration.py driver): exact roundtrip, completeness guard,
snapshot-then-stream handoff through slices."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from debezium_spark.sources.slices import (
    MSG_EOF,
    MSG_FULL,
    MSG_METADATA,
    export_csv_slices,
    load_csv_slices,
)


def test_roundtrip_exact_with_hostile_values(spark):
    """Values with commas, quotes, and newlines must survive byte-exact —
    the reason slices carry an ARRAY of CSV records, not one joined blob."""
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.concat(F.lit('a,"b"\nc '), F.col("id").cast("string")).alias("v"),
        (F.col("id") * 1.5).alias("x"),
    )
    sl = export_csv_slices(df, ["k"], slice_size=50)
    kinds = {r["msgType"]: r for r in sl.select("msgType").distinct().collect()}
    assert set(kinds) == {MSG_METADATA, MSG_FULL, MSG_EOF}
    back = load_csv_slices(sl)
    assert back.schema.simpleString() == df.schema.simpleString()
    assert df.exceptAll(back).count() == 0 and back.exceptAll(df).count() == 0
    # bounded slices
    sizes = [r["sliceSize"] for r in sl.filter(f"msgType = '{MSG_FULL}'").collect()]
    assert sum(sizes) == 500 and max(sizes) < 500


def test_roundtrip_with_hostile_column_names(spark):
    """Review regression: unquoted schema_ddl broke the load of tables with
    reserved-word or spaced column names."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["order", "select"])
    back = load_csv_slices(export_csv_slices(df, ["order"], slice_size=10))
    assert back.columns == ["order", "select"]
    assert {(r["order"], r["select"]) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_incomplete_slice_set_fails_loudly(spark):
    df = spark.range(100).select(F.col("id").alias("k"), F.lit("v").alias("v"))
    sl = export_csv_slices(df, ["k"], slice_size=10).persist()
    # drop one body slice
    holed = sl.filter(~((F.col("msgType") == MSG_FULL) & (F.col("index") == 0)))
    with pytest.raises(ValueError, match="incomplete"):
        load_csv_slices(holed)
    # drop the eof record
    with pytest.raises(ValueError, match="eof"):
        load_csv_slices(sl.filter(F.col("msgType") != MSG_EOF))
    sl.unpersist()


def test_full_migration_tool_handoff(spark, tmp_path):
    """tools/full_migration.py: export -> load (fence-pinned bootstrap) ->
    stream from the fence; final state matches engine-only replay."""
    from types import SimpleNamespace

    import tools.full_migration as fm
    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable

    gen = ChangeLogGenerator(spark, seed=11, n_repos=5)
    # "source database" = materialized snapshot rows; binlog continues after
    snap = gen.snapshot(200)
    src = str(tmp_path / "src")
    snap.select("after.*").write.parquet(src)
    bdir = str(tmp_path / "binlog")
    gen.write_batches(bdir, 600, 2)

    fm.cmd_export(SimpleNamespace(source=src, key="repo,path",
                                  slices=str(tmp_path / "slices"), slice_size=50))
    fm.cmd_load(SimpleNamespace(slices=str(tmp_path / "slices"),
                                table=str(tmp_path / "t"), key="repo,path",
                                buckets=4, binlog=bdir,
                                fence_file="binlog.000001", fence_pos=-1))

    migrated = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=4)
    assert migrated.fence()[1] == 599

    # reference: plain bootstrap + replay through the engine
    ref = LakeTable(spark, str(tmp_path / "ref"), ["repo", "path"], n_buckets=4)
    e = CdcEngine(spark, ref)
    e.bootstrap(snap, fence=("binlog.000001", -1))
    e.replay(bdir)
    a = {(r["repo"], r["path"], r["content"]) for r in migrated.read().collect()}
    b = {(r["repo"], r["path"], r["content"]) for r in ref.read().collect()}
    assert a == b and len(a) > 0


def test_path_record_loads_slices_mid_stream(spark, tmp_path):
    """The fork's 'p' PATH op: a stream record pointing at an exported
    slice set (RelationalChangeRecordEmitter.java:89-101). The engine loads
    the slices AT the record's position — later events overwrite, the
    whole thing is fence-idempotent."""
    from debezium_spark import CdcEngine, LakeTable

    # exported "source table" slices
    src = spark.createDataFrame(
        [("r0", f"f{i}", f"c{i}", "py", f"body{i}") for i in range(40)],
        "repo string, path string, commit string, lang string, content string",
    )
    sdir = str(tmp_path / "slices")
    export_csv_slices(src, ["repo", "path"], slice_size=10).write.parquet(sdir)

    table = LakeTable(spark, str(tmp_path / "t"), ["repo", "path"], n_buckets=2)
    engine = CdcEngine(spark, table)
    env_schema = (
        "before struct<repo:string,path:string,commit:string,lang:string,content:string>, "
        "after struct<repo:string,path:string,commit:string,lang:string,content:string>, "
        "op string, ts_ms long, "
        "source struct<file:string,pos:bigint,gtid:string,snapshot:string,"
        "db:string,table:string,ts_ms:bigint>, "
        "transaction struct<id:string,total_order:bigint,data_collection_order:bigint>"
    )

    def row(pos, op, before, after):
        return {
            "before": before, "after": after, "op": op, "ts_ms": pos,
            "source": {"file": "binlog.000001", "pos": pos, "gtid": None,
                       "snapshot": None, "db": "app", "table": "t", "ts_ms": pos},
            "transaction": None,
        }

    def payload(path, content):
        return {"repo": "r0", "path": path, "commit": "x", "lang": "py",
                "content": content}

    batch = spark.createDataFrame([
        # a pre-slice event for f0 (the slice load at pos 5 overwrites it)
        row(1, "c", None, payload("f0", "stale")),
        # the PATH record: content column carries the slice location
        row(5, "p", None, payload("_", sdir)),
        # post-slice update wins over the slice row
        row(9, "u", payload("f1", "body1"), payload("f1", "updated")),
    ], env_schema)
    engine.apply_envelope_batch(batch, batch_id="b0")
    state = {r["path"]: r["content"] for r in table.read().collect()}
    assert len(state) == 40
    assert state["f0"] == "body0"      # slice overwrote the stale pre-event
    assert state["f1"] == "updated"    # post-slice event overwrote the slice
    assert table.fence() == ("binlog.000001", 9)
    # idempotent re-apply
    assert engine.apply_envelope_batch(batch, batch_id="b0-again") is None
    assert {r["path"]: r["content"] for r in table.read().collect()} == state


def test_full_migration_uses_existing_spark(spark, monkeypatch, tmp_path):
    """cmd_* reuse the active session (getOrCreate) — no second JVM."""
    import tools.full_migration as fm

    assert fm.make_spark("x") is spark


def test_empty_string_and_sentinel_values_roundtrip(spark):
    """Review r4 deep-pass: '' became NULL through the CSV round-trip
    (sha256('') is the north-rule invariant for empty files); the \\N null
    sentinel plus the nullish escape keeps '' / NULL / literal '\\N' all
    distinct."""
    from debezium_spark.sources.slices import export_csv_slices, load_csv_slices

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x"), (4, "\\N"), (5, "\\\\N"), (6, "a,b\nc")],
        "k long, v string",
    )
    back = {r["k"]: r["v"] for r in load_csv_slices(export_csv_slices(df, ["k"], 3)).collect()}
    assert back == {1: "", 2: None, 3: "x", 4: "\\N", 5: "\\\\N", 6: "a,b\nc"}
