"""spark-submit entrypoint for the CDC replay job.

Usage (cluster):
  zip -r debezium_spark.zip debezium_spark
  spark-submit --master <cluster> --py-files debezium_spark.zip \
      tools/run_replay_job.py --batch-dir <binlog> --table <root> \
      [--buckets 32] [--snapshot-rows N] [--gen-events N] \
      [--properties connector.properties]

``--properties`` accepts a Debezium-style property file (key=value lines);
snapshot.mode, table/database include lists, maskers, skipped operations
etc. wire straight into the engine (see debezium_spark.config).

The job is idempotent: re-submitting after any failure resumes from the
table's committed offset fence (already-applied batches are skipped), which
is the checkpoint-resumable-replay requirement. Parallelism comes entirely
from the cluster (`--num-executors`/`--executor-cores`); the engine itself
has no tunable thread pools — Spark's shuffle is the router.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs resolve the package from the repo root; on a cluster
# --py-files debezium_spark.zip makes this a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-dir", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--salt-factor", type=int, default=4)
    ap.add_argument("--snapshot-rows", type=int, default=0,
                    help="bootstrap an initial op='r' snapshot of N generated rows")
    ap.add_argument("--gen-events", type=int, default=0,
                    help="generate a synthetic binlog of N events into --batch-dir first")
    ap.add_argument("--properties", default=None,
                    help="Debezium-style connector property file (key=value lines)")
    ap.add_argument("--gen-batches", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("debezium-spark-replay").getOrCreate()

    from debezium_spark import ChangeLogGenerator, LakeTable
    from debezium_spark.schema import REPO_KEY_COLS, REPO_PAYLOAD_SCHEMA

    from debezium_spark import EngineConfig

    cfg = EngineConfig()
    if args.properties:
        from debezium_spark.config import parse_properties

        cfg = EngineConfig.from_properties(parse_properties(args.properties))

    if args.gen_events:
        ChangeLogGenerator(spark, seed=42).write_batches(
            args.batch_dir, args.gen_events, args.gen_batches
        )
        # source-side progress line (迁移进度上报): the generation step is
        # this job's source analog — produced = converted = polled; the
        # published create count feeds the sink reporter's overallPipe
        src = cfg.build_committer("source")
        if src is not None:
            src.record_source_batch(created=args.gen_events)
            src.commit(force=True)

    key_cols = cfg.key_cols_for("inventory", "repo_files", list(REPO_KEY_COLS))
    table = LakeTable(spark, args.table, key_cols, n_buckets=args.buckets)
    if not table.exists():
        table.create(REPO_PAYLOAD_SCHEMA)
    # build_engine wires the SMT chain AND tombstones.on.delete (review r4:
    # constructing CdcEngine directly silently dropped the tombstone flag)
    engine = cfg.build_engine(spark, table, salt_factor=args.salt_factor)

    # snapshot rows only for the modes that actually consume them —
    # snapshot.mode semantics (incl. schema_only fence-only commits and
    # initial_only's snapshot-and-STOP) live in CdcEngine.run (review r4:
    # reimplementing the coordination here loaded full rows under
    # schema_only and streamed under initial_only)
    snap = None
    if args.snapshot_rows and cfg.snapshot_mode in (
        "initial", "initial_only", "when_needed"
    ):
        gen = ChangeLogGenerator(spark, seed=42)
        snap = gen.snapshot(args.snapshot_rows)
        from debezium_spark.config import apply_snapshot_override
        # property keys may be db-qualified (overrides.<db>.<table>) or bare
        tbl = "inventory.repo_files" if cfg.snapshot_where("inventory.repo_files") else "repo_files"
        snap = apply_snapshot_override(cfg, tbl, snap)

    t0 = time.perf_counter()
    if snap is None and cfg.snapshot_mode in ("initial", "initial_only", "when_needed"):
        # no snapshot source supplied (--snapshot-rows absent): stream only
        versions = engine.replay(args.batch_dir)
    else:
        versions = engine.run(
            args.batch_dir,
            snapshot_env=snap,
            snapshot_mode=cfg.snapshot_mode,
            snapshot_fence=cfg.snapshot_offset or ("binlog.000000", -1),
        )
    dt = time.perf_counter() - t0
    print(json.dumps({
        "applied_batches": len(versions),
        "final_version": table.manifest()["version"],
        "fence": table.fence(),
        "rows": table.read().count(),
        "replay_sec": round(dt, 3),
        "lineage_rows": len(table.lineage()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
