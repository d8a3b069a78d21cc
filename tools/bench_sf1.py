"""sf1 end-to-end replay (VERDICT r4 #8).

The MoR cost curve (``bench_mor_curve.py``) measured a fixed 200k-event
batch against tables grown to the sf1-scale 21.5M-row point; this run
drives the FULL 40M-event stream through the engine as an ordered batched
replay — the headline-throughput shape at a large-table data point, not
only the flat-apply-cost curve. Reports overall events/s plus the
per-batch wall series (the flatness of which, as the table grows from 0
to ~21M rows under the replay itself, is the O(batch)-not-O(table)
evidence at full scale).

Usage: python tools/bench_sf1.py [--events 40000000] [--batches 8]
                                 [--buckets 64] [--cpus 32]
Prints one JSON line per batch plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=40_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    spark = bench.make_spark(args.cpus, "bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    from debezium_spark.plans.table import LakeTable
    from debezium_spark.schema import REPO_KEY_COLS, REPO_PAYLOAD_SCHEMA
    from debezium_spark.streaming.engine import CdcEngine

    work = tempfile.mkdtemp(prefix="sf1_", dir="/dev/shm")
    num_jobs = lambda: spark._jsc.sc().dagScheduler().numTotalJobs()  # noqa: E731
    try:
        # per-batch directories so each replay call is one timed batch
        per = args.events // args.batches
        gen_t0 = time.perf_counter()
        from debezium_spark.generator import ChangeLogGenerator

        # keyspace matches bench_mor_curve's sf1 bootstrap (50M keys →
        # ~21.5M distinct after 40M events), so the table genuinely grows
        # to the sf1-scale point UNDER the replay
        ChangeLogGenerator(
            spark, seed=42, n_repos=5000, dirs_per_repo=100,
            files_per_dir=100, content_words=64,
        ).write_batches(os.path.join(work, "binlog"), args.events, args.batches)
        gen_sec = time.perf_counter() - gen_t0
        print(json.dumps({"phase": "generate", "events": args.events,
                          "sec": round(gen_sec, 1)}), flush=True)

        table = LakeTable(spark, os.path.join(work, "table"),
                          list(REPO_KEY_COLS), n_buckets=args.buckets, mode="mor")
        table.create(REPO_PAYLOAD_SCHEMA)
        engine = CdcEngine(spark, table)
        batch_rows = []
        total_t0 = time.perf_counter()
        for b in range(args.batches):
            src = os.path.join(work, "binlog", f"batch_{b:05d}.parquet")
            # stage the single batch file into its own replay dir: replay()
            # scans a directory; moving (same tmpfs) is free
            bdir = os.path.join(work, f"replay_{b}")
            os.makedirs(bdir)
            shutil.move(src, os.path.join(bdir, f"batch_{b:05d}.parquet"))
            j0, t0 = num_jobs(), time.perf_counter()
            engine.replay(bdir, final=(b == args.batches - 1))
            dt = time.perf_counter() - t0
            rec = {"batch": b, "events": per, "sec": round(dt, 2),
                   "events_per_sec": round(per / dt, 1),
                   "jobs": num_jobs() - j0}
            batch_rows.append(rec)
            print(json.dumps(rec), flush=True)
            shutil.rmtree(bdir, ignore_errors=True)
        total = time.perf_counter() - total_t0
        n_final = table.read().count()
        print(json.dumps({
            "summary": "sf1_replay",
            "events": args.events,
            "batches": args.batches,
            "sec": round(total, 1),
            "events_per_sec": round(args.events / total, 1),
            "batch_secs": [r["sec"] for r in batch_rows],
            "batch_jobs": [r["jobs"] for r in batch_rows],
            "final_rows": n_final,
            "table_gb": round(sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(os.path.join(work, "table", "data"))
                for f in fs
            ) / 2**30, 2),
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
