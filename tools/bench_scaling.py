"""Standalone scaling-efficiency experiment (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors, evidenced here by the same
replay job at two pinned parallelism levels on identical input).

Usage: python tools/bench_scaling.py [--events 4000000] [--n 2] [--trials 2]

Wraps bench.py's worker mode: generates one binlog on tmpfs, then runs
`taskset -c 0..N-1 bench.py --worker N` and the 4N equivalent, interleaved,
reporting best-of-trials throughput and efficiency as one JSON line.
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
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--n", type=int, default=2, help="low parallelism level (high = 4n)")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--cooldown", type=int, default=15)
    args = ap.parse_args()
    lo, hi = args.n, 4 * args.n

    work = tempfile.mkdtemp(prefix="cdc_scaling_", dir="/dev/shm")
    try:
        spark = bench.make_spark(os.cpu_count() or 8, "scaling-gen")
        spark.sparkContext.setLogLevel("ERROR")
        bench.gen_binlog(spark, os.path.join(work, "binlog"), args.events, args.batches)
        spark.stop()

        best: dict[int, dict] = {}
        for trial in range(args.trials):
            for cpus in (lo, hi):
                w = bench.run_worker_subprocess(cpus, os.path.join(work, "binlog"), args.events)
                print(f"# trial {trial} local[{cpus}]: {w['sec']:.1f}s "
                      f"{w['events_per_sec']:,.0f} events/s", file=sys.stderr)
                if cpus not in best or w["sec"] < best[cpus]["sec"]:
                    best[cpus] = w
                time.sleep(args.cooldown)

        print(json.dumps({
            "events": args.events,
            "cpus_n": lo,
            "cpus_4n": hi,
            "sec_n": round(best[lo]["sec"], 3),
            "sec_4n": round(best[hi]["sec"], 3),
            "eps_n": round(best[lo]["events_per_sec"], 1),
            "eps_4n": round(best[hi]["events_per_sec"], 1),
            "efficiency": round(
                (best[hi]["events_per_sec"] / best[lo]["events_per_sec"]) / (hi / lo), 3
            ),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
