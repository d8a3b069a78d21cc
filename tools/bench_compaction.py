"""Compaction-cadence experiment: MoR apply + read cost vs compact_depth.

MoR's trade: apply is O(batch) but read cost grows with delta depth;
compaction folds deltas back at rewrite cost. This measures, on a growing
table (many batches, repeated key updates so deltas stack on the same
buckets), total replay wall, end-state read wall, and the work compaction
did — across cadences.

Usage: python tools/bench_compaction.py [--events 2000000] [--batches 8]
                                        [--depths 0,2,4,8]
Prints one JSON line per cadence plus a summary line.
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
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--depths", default="0,2,4,8")
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()
    depths = [int(d) for d in args.depths.split(",")]

    from debezium_spark import ChangeLogGenerator, CdcEngine, LakeTable
    from debezium_spark.schema import REPO_KEY_COLS, REPO_PAYLOAD_SCHEMA

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "compaction-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cdc_compact_", dir="/dev/shm")
    results = []
    try:
        # small key space → every batch updates mostly-existing keys, so
        # deltas stack (the growing-table regime compaction exists for)
        gen = ChangeLogGenerator(
            spark, seed=42, n_repos=50, dirs_per_repo=20, files_per_dir=40,
            content_words=64,
        )
        bdir = os.path.join(work, "b")
        gen.write_batches(bdir, args.events, args.batches)

        # warm-up once (JIT), shared across cadences — a SMALL separate
        # binlog, not the full measured workload
        wdir = os.path.join(work, "warm_b")
        ChangeLogGenerator(spark, seed=7, content_words=64).write_batches(wdir, 100_000, 2)
        wt = LakeTable(spark, os.path.join(work, "warm"), list(REPO_KEY_COLS), n_buckets=8)
        wt.create(REPO_PAYLOAD_SCHEMA)
        CdcEngine(spark, wt).replay(wdir)

        for depth in depths:
            root = os.path.join(work, f"t{depth}")
            table = LakeTable(spark, root, list(REPO_KEY_COLS), n_buckets=args.buckets)
            table.create(REPO_PAYLOAD_SCHEMA)
            engine = CdcEngine(spark, table, compact_depth=depth)
            t0 = time.perf_counter()
            engine.replay(bdir)
            replay_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = table.read().count()
            read_s = time.perf_counter() - t0
            compactions = sum(
                1 for r in table.lineage() if "compacted_deltas" in r
            )
            row = {
                "compact_depth": depth,
                "replay_sec": round(replay_s, 3),
                "events_per_sec": round(args.events / replay_s, 1),
                "final_read_sec": round(read_s, 3),
                "rows": n,
                "residual_delta_depth": table.delta_depth(),
                "compaction_commits": compactions,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(root, ignore_errors=True)
        rows0 = {r["compact_depth"]: r for r in results}
        # "most aggressive" enabled cadence = SMALLEST non-zero depth
        # (depth 0 disables; review r4: depths[-1] compared against the
        # LEAST aggressive cadence, understating compaction's read benefit)
        enabled = sorted(d for d in depths if d > 0)
        print(json.dumps({"summary": results,
                          "consistent_rows": len({r["rows"] for r in results}) == 1,
                          "never_vs_most_aggressive_read_ratio":
                          round(rows0[0]["final_read_sec"] /
                                max(rows0[enabled[0]]["final_read_sec"], 1e-9), 2)
                          if 0 in rows0 and enabled else None}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
