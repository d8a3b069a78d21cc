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


def test_out_of_order_events_match_batch(spark, tmp_path):
    """Review regression: late-but-admissible events must merge into (or
    split from) PENDING sessions exactly as in batch — lowering starts,
    bridging two sessions, or opening an earlier separate session."""
    base = 1_700_000_000_000
    # in-order file 1: user 1 session at [100s..106s]; user 2 at [200s..202s]
    f1 = [
        (1, 1, base + 100_000, 5), (2, 1, base + 103_000, 5), (3, 1, base + 106_000, 5),
        (4, 2, base + 200_000, 7), (5, 2, base + 202_000, 7),
    ]
    # file 2 (late, within watermark delay): 95s extends user1's session
    # start; 60s opens a separate EARLIER session; 111s extends the end
    f2 = [
        (6, 1, base + 95_000, 5),
        (7, 1, base + 60_000, 5),
        (8, 1, base + 111_000, 5),
    ]
    all_events = spark.createDataFrame(
        f1 + f2, "event_id long, user_id long, ts_ms long, cents long"
    )
    want = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"], r["sum_cents"])
        for r in sessionize_batch(all_events, GAP_MS).collect()
    }
    # sanity on the scenario itself: user1 -> [60s,60s] and [95s..111s]
    assert (1, base + 60_000, base + 60_000, 1, 5) in want
    assert (1, base + 95_000, base + 111_000, 5, 25) in want

    src = tmp_path / "stream"
    src.mkdir()
    for i, batch in enumerate((f1, f2)):
        spark.createDataFrame(
            batch, "event_id long, user_id long, ts_ms long, cents long"
        ).withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop(
            "ts_ms"
        ).coalesce(1).write.parquet(str(src / f"batch_0000{i}"))
    for i, uid in enumerate((9998, 9999)):  # watermark advancers
        spark.createDataFrame(
            [(100 + i, uid, base + 900_000 + i * 1000, 0)],
            "event_id long, user_id long, ts_ms long, cents long",
        ).withColumn("ts", F.timestamp_millis(F.col("ts_ms"))).drop(
            "ts_ms"
        ).coalesce(1).write.parquet(str(src / f"batch_0001{i}"))

    stream = (
        spark.readStream.schema("event_id long, user_id long, cents long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "batch_*"))
    )
    # watermark delay 120s: file-2 events (up to 46s late vs file-1 max)
    # are admissible
    sessions = sessionize_stream(stream, GAP_MS, watermark_delay="120 seconds")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"], r["sum_cents"])
        for r in spark.read.parquet(out_dir).filter(F.col("user_id") < 9000).collect()
    }
    assert got == want
