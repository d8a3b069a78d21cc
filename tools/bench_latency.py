"""Commit-latency vs batch-size sweep — the engine analog of the
reference's E2E latency benchmark (`debezium-e2e-benchmark/README.md:1-30`:
100,000 inserts replayed at commit intervals 1 / 100 / 1,000 / 10,000,
latency = sink-record timestamp − row-insert timestamp).

In micro-batch execution an event's end-to-end latency decomposes as
(accumulation: how long the event waits for its batch to close — a
deployment knob, trigger interval × fill rate) + (commit: the apply+merge
wall for that batch — the engine's term). This sweep measures the commit
term as a function of events/batch on a warm engine, plus the throughput
each point sustains: the latency/throughput tradeoff a deployment tunes
with batch size / maxFilesPerTrigger. Small batches buy freshness at the
cost of per-commit overhead (planning, fence probe, manifest write —
the O(1)-per-batch serial term measured in BENCH.md); large batches
amortize it toward the headline throughput.

Usage: python tools/bench_latency.py [--batch-sizes 1000,10000,100000]
                                     [--batches-per-size 12]
Prints one JSON line per batch size plus a summary line.
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


def _pct(xs: list[float], q: float) -> float:
    s = sorted(xs)
    return s[min(len(s) - 1, int(round(q * (len(s) - 1))))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", default="1000,10000,100000")
    ap.add_argument("--batches-per-size", type=int, default=12)
    args = ap.parse_args()
    sizes = [int(s) for s in args.batch_sizes.split(",")]

    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
    from debezium_spark.schema import REPO_KEY_COLS
    from debezium_spark.sources.batches import list_batches, read_batch

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "latency")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cdc_latency_", dir="/dev/shm")
    results = []
    try:
        gen = ChangeLogGenerator(spark, seed=42)

        # JIT warm-up: a separate table + two applied batches
        warm_dir = os.path.join(work, "warm_log")
        gen.write_batches(warm_dir, 100_000, n_batches=2)
        warm = LakeTable(spark, os.path.join(work, "warm_t"), list(REPO_KEY_COLS), n_buckets=16)
        weng = CdcEngine(spark, warm)
        for p in list_batches(warm_dir):
            weng.apply_envelope_batch(read_batch(spark, p), batch_id=os.path.basename(p))

        for per_batch in sizes:
            n = args.batches_per_size
            log_dir = os.path.join(work, f"log_{per_batch}")
            gen.write_batches(log_dir, per_batch * n, n_batches=n)
            table = LakeTable(
                spark, os.path.join(work, f"t_{per_batch}"), list(REPO_KEY_COLS),
                n_buckets=16,
            )
            engine = CdcEngine(spark, table)
            commits = []
            t_all0 = time.perf_counter()
            for p in list_batches(log_dir):
                env = read_batch(spark, p)
                t0 = time.perf_counter()
                engine.apply_envelope_batch(env, batch_id=os.path.basename(p))
                commits.append(time.perf_counter() - t0)
            total_s = time.perf_counter() - t_all0
            row = {
                "events_per_batch": per_batch,
                "batches": n,
                "commit_p50_s": round(_pct(commits, 0.50), 3),
                "commit_p95_s": round(_pct(commits, 0.95), 3),
                "commit_max_s": round(max(commits), 3),
                "events_per_sec": round(per_batch * n / total_s, 1),
            }
            print(json.dumps(row), flush=True)
            results.append(row)

        lo, hi = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": "latency-sweep",
                    "batch_growth_x": round(
                        hi["events_per_batch"] / lo["events_per_batch"], 1
                    ),
                    "p50_growth_x": round(hi["commit_p50_s"] / lo["commit_p50_s"], 2),
                    "throughput_growth_x": round(
                        hi["events_per_sec"] / lo["events_per_sec"], 2
                    ),
                    "smallest_batch_p50_s": lo["commit_p50_s"],
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
