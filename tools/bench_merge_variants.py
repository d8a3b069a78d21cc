"""Micro-bench of the MoR merge pipeline variants over the exact bench batch
shape (guide §1 first-principles vs empirical): isolates dedupe shuffle,
write, Observation lineage, and the fused single-exchange layout so the
round-6 merge changes target the real cost.

Run: python tools/bench_merge_variants.py [n_events]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from bench import make_spark
    from debezium_spark.generator import ChangeLogGenerator
    from debezium_spark.operators.apply import compute_changes, split_pk_changes
    from debezium_spark.functions.core import salted_key
    from debezium_spark.plans.table import bucket_expr

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "merge-variants")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mvar_", dir="/dev/shm")
    keys = ["repo", "path"]
    n_buckets, salt_factor = 32, 4

    try:
        gen = ChangeLogGenerator(
            spark, seed=42, n_repos=200, dirs_per_repo=50, files_per_dir=100,
            content_words=64,
        )
        gen.write_batches(os.path.join(work, "binlog"), n, 1)
        env = spark.read.parquet(os.path.join(work, "binlog", "batch_00000.parquet"))

        def timed(label, fn, warm=1, reps=2):
            for _ in range(warm):
                fn()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(round(time.perf_counter() - t0, 2))
            print(f"{label:44s} {ts}", flush=True)

        split = split_pk_changes(env, keys)

        # A. split+dedupe only (classic), noop sink
        ch = compute_changes(split, keys)
        timed("A dedupe-classic noop", lambda: ch.write.format("noop").mode("overwrite").save())

        # B. split+dedupe fused distribution, noop sink
        chf = compute_changes(split, keys, distribute=(n_buckets, salt_factor))
        timed("B dedupe-fused noop", lambda: chf.write.format("noop").mode("overwrite").save())

        # C. classic + repartition + parquet write (current write path, no obs)
        def run_c():
            d = os.path.join(work, "out_c")
            shutil.rmtree(d, ignore_errors=True)
            (ch.withColumn("_bucket", bucket_expr(keys, n_buckets))
               .repartition(F.col("_bucket"), salted_key(keys, salt_factor))
               .write.partitionBy("_bucket").mode("overwrite").parquet(d))
        timed("C classic+repartition+parquet", run_c)

        # D. fused + parquet write (no repartition)
        def run_d():
            d = os.path.join(work, "out_d")
            shutil.rmtree(d, ignore_errors=True)
            chf.write.partitionBy("_bucket").mode("overwrite").parquet(d)
        timed("D fused+parquet", run_d)

        # E. C plus the r5 Observation (3*n_buckets conditional sums)
        from pyspark.sql import Observation

        def run_e():
            d = os.path.join(work, "out_e")
            shutil.rmtree(d, ignore_errors=True)
            obs = Observation()
            out = ch.withColumn("_bucket", bucket_expr(keys, n_buckets))
            in_b = lambda b: F.col("_bucket") == b  # noqa: E731
            aggs = []
            for b in range(n_buckets):
                aggs.append(F.sum(F.when(in_b(b), 1).otherwise(0)).cast("long").alias(f"e{b}"))
                aggs.append(F.sum(F.when(in_b(b) & (F.col("_op") == "d"), 1).otherwise(0)).cast("long").alias(f"d{b}"))
                aggs.append(F.sum(F.when(in_b(b) & (F.col("_op") != "d"), 1).otherwise(0)).cast("long").alias(f"u{b}"))
            out = out.observe(obs, aggs[0], *aggs[1:])
            (out.repartition(F.col("_bucket"), salted_key(keys, salt_factor))
                .write.partitionBy("_bucket").mode("overwrite").parquet(d))
            obs.get
        timed("E classic+repartition+parquet+obs96", run_e)

        # F. driver-side footer lineage cost over D's output
        def run_f():
            import pyarrow.parquet as pq
            import pyarrow.compute as pc
            d = os.path.join(work, "out_d")
            tot = {}
            for sub in os.listdir(d):
                if not sub.startswith("_bucket="):
                    continue
                ev = dl = 0
                for fn in os.listdir(os.path.join(d, sub)):
                    if fn.endswith(".parquet"):
                        f = pq.ParquetFile(os.path.join(d, sub, fn))
                        ev += f.metadata.num_rows
                        col = f.read(columns=["_op"]).column("_op")
                        dl += pc.sum(pc.equal(col, "d")).as_py() or 0
                tot[sub] = (ev, dl)
            return tot
        timed("F footer+pyarrow lineage (driver)", run_f)

        # G. split-only materialization cost (posexplode weight), noop
        timed("G split-only noop", lambda: split.write.format("noop").mode("overwrite").save())

        # H. raw scan noop
        timed("H raw scan noop", lambda: env.write.format("noop").mode("overwrite").save())
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
