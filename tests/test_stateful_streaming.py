"""Custom stateful streaming operator (applyInPandasWithState
sessionization) must equal the batch sessionization on the same events."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.streaming.stateful import sessionize_batch, sessionize_stream

GAP_MS = 10_000


def _events(spark):
    """3 users, sessions separated by > GAP gaps."""
    rows = []
    eid = 0
    base = 1_700_000_000_000
    for user in (1, 2, 3):
        t = base + user * 1000
        for session in range(3):
            for i in range(4):
                rows.append((eid, user, t, (user * 10 + i)))
                eid += 1
                t += 2_000  # intra-session: 2s apart (< gap)
            t += GAP_MS + 5_000  # inter-session gap
    return spark.createDataFrame(rows, "event_id long, user_id long, ts_ms long, cents long")


def test_stream_sessionization_matches_batch(spark, tmp_path):
    ev = _events(spark)
    want = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"], r["sum_cents"])
        for r in sessionize_batch(ev, GAP_MS).collect()
    }
    assert len(want) == 9  # 3 users x 3 sessions

    # stream input: real events, then two watermark-advancing sentinels in
    # later files so event-time timeouts close the final open sessions
    src = tmp_path / "stream"
    src.mkdir()
    with_ts = ev.withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop("ts_ms")
    with_ts.coalesce(1).write.parquet(str(src / "batch_00000"))
    far = 1_700_009_000_000
    for i, uid in enumerate((9998, 9999)):
        spark.createDataFrame(
            [(10_000 + i, uid, far + i * 1000, 0)],
            "event_id long, user_id long, ts_ms long, cents long",
        ).withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop("ts_ms").coalesce(
            1
        ).write.parquet(str(src / f"batch_0000{i + 1}"))

    stream = (
        spark.readStream.schema("event_id long, user_id long, cents long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "batch_*"))
    )
    sessions = sessionize_stream(stream, GAP_MS)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(out_dir).filter(F.col("user_id") < 9000)
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"], r["sum_cents"])
        for r in got_df.collect()
    }
    assert got == want
