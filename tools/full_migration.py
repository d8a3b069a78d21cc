"""Full-migration tool — the openGauss fork's whole-table migration path
(snapshot → CSV slices → load → stream handoff), Spark-first.

The fork's migration tool exports each source table as CSV slices carried
in envelope messages (Envelope.java:126-148 csv/msgType/index/totalSlice/
sliceSize) and loads them on the sink before switching to incremental
capture. This tool drives the same three phases with the engine:

    1. export : source rows -> slice records (sources/slices.py), written
                as parquet under --slices (the transfer medium)
    2. load   : slice records -> typed rows -> fence-pinned bootstrap
                (CdcEngine.bootstrap, op='r' semantics) — verified complete
                against the eof record before any row lands
    3. stream : replay the binlog directory from the pinned fence
                (snapshot-then-stream handoff)

Run via spark-submit --py-files (same contract as run_replay_job.py):

    spark-submit tools/full_migration.py export --source <parquet> \
        --key repo,path --slices /x/slices [--slice-size 10000]
    spark-submit tools/full_migration.py load --slices /x/slices \
        --table /lake/t --key repo,path [--binlog /x/binlog]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_spark(app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _parquet_row_count(path: str) -> int | None:
    """Exact row count from parquet FOOTERS only — zero data scan (the
    "known count" path of export_csv_slices; a catalog statistic would
    serve the same way). Local filesystem only: on a remote store this
    returns None and the export falls back to its one narrow count scan."""
    import glob

    try:
        import pyarrow.parquet as pq

        files = (
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            if os.path.isdir(path)
            else ([path] if os.path.isfile(path) else [])
        )
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def cmd_export(args) -> None:
    from debezium_spark.sources.slices import export_csv_slices

    spark = make_spark("full-migration-export")
    df = spark.read.parquet(args.source)
    slices = export_csv_slices(df, args.key.split(","),
                               slice_size=args.slice_size,
                               n=_parquet_row_count(args.source))
    slices.write.mode("overwrite").parquet(args.slices)
    n = spark.read.parquet(args.slices).filter("msgType = 'full'").count()
    print(f"exported {n} slices to {args.slices}")


def cmd_load(args) -> None:
    from debezium_spark.plans.table import LakeTable
    from debezium_spark.sources.slices import load_csv_slices, snapshot_envelope
    from debezium_spark.streaming.engine import CdcEngine

    spark = make_spark("full-migration-load")
    rows = load_csv_slices(spark.read.parquet(args.slices))
    key_cols = args.key.split(",")
    table = LakeTable(spark, args.table, key_cols, n_buckets=args.buckets)
    if not table.exists():
        table.create(rows.schema)
    engine = CdcEngine(spark, table)
    # snapshot rows -> op='r' envelope pinned at the handoff fence
    env = snapshot_envelope(rows, args.fence_file, args.fence_pos)
    engine.bootstrap(env, fence=(args.fence_file, args.fence_pos))
    print(f"loaded {table.read().count()} rows, fence={table.fence()}")
    if args.binlog:
        versions = engine.replay(args.binlog)
        print(f"streamed {len(versions)} batches, fence={table.fence()}")
    if getattr(args, "delete_slices", False):  # optional (default off)
        # the fork's delete.full.csv.file knob (opengauss connector, full-
        # migration params): reclaim the transfer medium once the load
        # committed — only reachable after a successful bootstrap (any
        # slice-set verification failure raised above)
        import shutil

        shutil.rmtree(args.slices, ignore_errors=True)
        print(f"deleted slice dir {args.slices}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("export")
    pe.add_argument("--source", required=True)
    pe.add_argument("--key", required=True)
    pe.add_argument("--slices", required=True)
    pe.add_argument("--slice-size", type=int, default=10_000)
    pl = sub.add_parser("load")
    pl.add_argument("--slices", required=True)
    pl.add_argument("--table", required=True)
    pl.add_argument("--key", required=True)
    pl.add_argument("--buckets", type=int, default=32)
    pl.add_argument("--binlog", default=None)
    pl.add_argument("--fence-file", default="binlog.000001")
    pl.add_argument("--fence-pos", type=int, default=-1)
    pl.add_argument("--delete-slices", action="store_true",
                    help="remove the slice files after a successful load "
                         "(the fork's delete.full.csv.file, default off)")
    args = p.parse_args()
    if args.cmd == "export":
        cmd_export(args)
    else:
        cmd_load(args)


if __name__ == "__main__":
    main()
