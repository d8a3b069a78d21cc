"""Micro-bench of bench.py §3c sink statement generation (guide §1): times
the full statement_stream over the generated binlog, then its components
(DML map only, tx-wrap agg only, DDL Python node) to locate the cost.

Run: python tools/bench_sinkgen_variants.py [n_events]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from bench import gen_binlog, make_spark
    from debezium_spark.schema import REPO_KEY_COLS, REPO_PAYLOAD_SCHEMA
    from debezium_spark.sink import statement_stream, table_meta_from_schema
    from debezium_spark.sink.replay import _dml_stmt_rows, _wrap_tx
    from debezium_spark.sink.sqlgen import dml_statements

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "sinkgen-variants")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sgvar_", dir="/dev/shm")
    try:
        gen_binlog(spark, os.path.join(work, "binlog"), n, 2)
        env = spark.read.parquet(os.path.join(work, "binlog", "*"))
        meta = table_meta_from_schema(
            "sink", "repo_files", REPO_PAYLOAD_SCHEMA, list(REPO_KEY_COLS)
        )

        def timed(label, df, warm=1, reps=2):
            fn = lambda: df.write.format("noop").mode("overwrite").save()  # noqa: E731
            for _ in range(warm):
                fn()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(round(time.perf_counter() - t0, 2))
            print(f"{label:44s} {ts}", flush=True)

        timed("full statement_stream", statement_stream(env, meta))
        timed("dml_statements only", dml_statements(env, meta))
        dml_rows = _dml_stmt_rows(env, meta, "opengauss")
        timed("dml_stmt_rows only", dml_rows)
        timed("wrap_tx(dml_rows)", _wrap_tx(dml_rows))
        timed("scan only", env)
        timed("scan+to_json(after)", env.select(F.to_json("after")))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
