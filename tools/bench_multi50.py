"""50-table-width replay bench (VERDICT r4 #2).

The reference publishes its table-parallel sink number at 50 tables
(``/root/reference/README.md:407``, ~30k tps); the driver bench's
``multi_table_replay`` query uses 3. This experiment replays mixed wire
batches into 50 registered captures and reports:

- wall time + events/s at the reference's own table-width config;
- Spark JOBS per batch, measured via the DAGScheduler's monotone job
  counter (job groups miss the thread-pooled per-table merges), across
  three phases: 50 registered/50 touched, 50 registered/5 touched, and
  200 registered/5 touched — the per-batch job count must track
  tables-TOUCHED, not registered specs (the flat single-expression
  pre-pass + one fused probe job make the spec count free; the per-table
  merge pipeline is the only linear term).

Usage: python tools/bench_multi50.py [--events 500000] [--batches 3]
                                     [--tables 50] [--threads 16]
Prints one JSON line per phase plus a summary line.
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


def make_wire(spark, n_events: int, touched: int):
    """Deterministic mixed wire stream: generator envelope → wire rows,
    table identity = pos % touched (so `touched` of the registered
    `n_tables` specs see traffic)."""
    from pyspark.sql import functions as F

    from debezium_spark.generator import ChangeLogGenerator
    from debezium_spark.streaming.multi import envelope_to_wire

    gen = ChangeLogGenerator(
        spark, seed=42, n_repos=200, dirs_per_repo=50, files_per_dir=100,
        content_words=64,
    )
    env = gen.events(n_events)
    wire = envelope_to_wire(env)
    tbl = F.concat(
        F.lit("t"),
        F.lpad((F.col("source.pos") % touched).cast("string"), 2, "0"),
    )
    return wire.withColumn(
        "source", F.col("source").withField("table", tbl).withField("db", F.lit("app"))
    )


def run_phase(spark, lake: str, wire_dir: str, n_events: int, n_batches: int,
              n_tables: int, touched: int, threads: int) -> dict:
    from debezium_spark.streaming.multi import MultiTableEngine, TableSpec

    from debezium_spark.schema import REPO_PAYLOAD_SCHEMA

    schema = REPO_PAYLOAD_SCHEMA
    specs = [
        TableSpec("app", f"t{i:02d}", schema, ["repo", "path"], n_buckets=4,
                  mode="mor")
        for i in range(n_tables)
    ]
    mte = MultiTableEngine(
        spark, lake, specs, max_parallel_tables=threads, auto_register=False,
        compact_depth=0,
    )
    # job counting: the DAGScheduler's monotone job counter sees EVERY
    # submitted job including the per-table merges fanned out from the
    # dispatcher's thread pool — job groups don't, because pinned-thread
    # py4j maps each pool thread to a fresh JVM thread that never inherits
    # the driver thread's group property
    num_jobs = lambda: spark._jsc.sc().dagScheduler().numTotalJobs()  # noqa: E731
    jobs_per_batch = []
    batches = [
        spark.read.parquet(os.path.join(wire_dir, f"batch_{b:05d}.parquet"))
        for b in range(n_batches)
    ]
    t0 = time.perf_counter()
    for b, batch in enumerate(batches):
        j0 = num_jobs()
        mte.apply_wire_batch(batch, batch_id=f"b{b}")
        jobs_per_batch.append(num_jobs() - j0)
    mte.flush_tx_carry()  # end-of-log closes the deferred tail transaction
    sec = time.perf_counter() - t0
    total_rows = sum(
        mte.table("app", f"t{i:02d}").read().count() for i in range(touched)
    )
    return {
        "registered_tables": n_tables,
        "touched_tables": touched,
        "events": n_events,
        "batches": n_batches,
        "sec": round(sec, 3),
        "events_per_sec": round(n_events / sec, 1),
        "jobs_per_batch": jobs_per_batch,
        "final_rows": total_rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=500_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--tables", type=int, default=50)
    ap.add_argument("--threads", type=int, default=16)
    args = ap.parse_args()

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "bench-multi50")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="m50_", dir="/dev/shm")
    results = []
    sparse = max(1, args.tables // 10)
    # (registered, touched): headline at the reference's 50-table width,
    # then touched held constant while registered specs vary — per-batch
    # jobs must not move with the spec count (O(touched), not O(specs))
    phases = [
        (args.tables, args.tables),
        (args.tables, sparse),
        (args.tables * 4, sparse),
    ]
    try:
        for pi, (n_tables, touched) in enumerate(phases):
            wdir = os.path.join(work, f"wire_{touched}")
            if not os.path.exists(wdir):
                wire = make_wire(spark, args.events, touched)
                per = args.events // args.batches
                for b in range(args.batches):
                    lo = b * per
                    hi = (b + 1) * per if b < args.batches - 1 else args.events
                    from pyspark.sql import functions as F
                    wire.filter(
                        (F.col("source.pos") >= lo) & (F.col("source.pos") < hi)
                    ).write.mode("overwrite").parquet(
                        os.path.join(wdir, f"batch_{b:05d}.parquet")
                    )
            if pi == 0:
                # warm-up: JIT the whole dispatch/merge pipeline once
                run_phase(spark, os.path.join(work, "lake_warm"), wdir,
                          args.events, args.batches, n_tables, touched,
                          args.threads)
            r = run_phase(spark, os.path.join(work, f"lake_{pi}"), wdir,
                          args.events, args.batches, n_tables, touched,
                          args.threads)
            results.append(r)
            print(json.dumps(r), flush=True)
        full, sp, sp4x = results
        # steady-state jobs (first batch pays one-off planning)
        steady = lambda r: r["jobs_per_batch"][-1]  # noqa: E731
        # --tables 1 makes sparse == tables: no second width to fit a
        # slope through — report null rather than dividing by zero after
        # the whole benchmark has run
        denom = args.tables - sparse
        slope = (steady(full) - steady(sp)) / denom if denom else None
        print(json.dumps({
            "summary": "multi50",
            "events_per_sec_50_tables": full["events_per_sec"],
            "jobs_per_batch_50_touched": full["jobs_per_batch"],
            "jobs_per_batch_sparse": sp["jobs_per_batch"],
            "jobs_per_batch_sparse_4x_specs": sp4x["jobs_per_batch"],
            "jobs_fixed_overhead": (
                round(steady(sp) - slope * sparse, 1)
                if slope is not None else None
            ),
            "jobs_per_touched_table": (
                round(slope, 2) if slope is not None else None
            ),
            "jobs_independent_of_spec_count": (
                abs(steady(sp4x) - steady(sp)) <= 1
            ),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
