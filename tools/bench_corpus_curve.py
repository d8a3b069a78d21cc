"""100×-scale rehearsal for corpus maintenance: incremental cost vs corpus size.

The CDC → corpus bridge's claim is one asymptotic property: applying a
fixed-size delta through `incremental_corpus_update` is O(delta) — the
only standing state it touches is the digest census (one (sha, id) row
per doc) — while the census-free alternative (`dedup_against_corpus`
straight against the lake) re-reads and re-hashes ALL corpus text per
delta, O(corpus). This experiment measures exactly that curve: corpora
of growing size (×4 steps), the SAME delta applied to each, both paths
timed, both decisions asserted identical.

Evidence beyond wall time (host capacity wobbles ±50%):
- bytes: the standing state each path must read — census parquet bytes
  grow only with doc COUNT (one 64-char digest + id per doc), never with
  text size, so the census fraction shrinks as documents get realistic;
- the incremental path's outputs are O(delta) rows at every corpus size
  (the census MUTATION is touched-removals + admissions; production
  applies it as a MERGE on the census lake table, never a rewrite —
  the timed section therefore covers the decision + upsert/delete
  outputs, not a full census rewrite no deployment would do);
- both paths' admission decisions are asserted identical per size.

Usage: python tools/bench_corpus_curve.py [--sizes 200000,800000,3200000]
                                          [--delta 20000] [--words 80]
Prints one JSON line per size plus a summary line.
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
from pyspark.sql import functions as F


_dir_bytes = bench.dir_bytes


_WORDS = 80


def _text_expr(seed: int, id_col):
    """Deterministic text as a pure formula of (seed, id) — so delta
    events can duplicate corpus content without ever joining against it."""
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.lit(seed), F.lit(i), id_col), F.lit(50_000))
                .cast("string"),
            )
            for i in range(_WORDS)
        ],
    )


def _corpus(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), _text_expr(1, F.col("id")).alias("text")
    )


def _delta_env(spark, n_corpus: int, b: int):
    """Fixed-size delta: 10% updates of standing docs (fresh text), 10%
    deletes, 40% creates duplicating standing corpus content, 40% fresh
    creates. Shapes every routing the operator has."""
    r = spark.range(b).select(F.col("id").alias("i"))
    tenth = b // 10
    ev = r.select(
        (F.col("i") + 1).alias("pos"),
        F.when(F.col("i") < tenth, F.lit("u"))
        .when(F.col("i") < 2 * tenth, F.lit("d"))
        .otherwise(F.lit("c"))
        .alias("op"),
        F.when(F.col("i") < 2 * tenth, F.col("i")).alias("bid"),
        F.when(F.col("i") < tenth, F.col("i"))
        .when(F.col("i") >= 2 * tenth, F.col("i") + n_corpus)
        .alias("aid"),
        F.col("i").alias("tid"),
    )
    # creates in [2T, 6T) duplicate corpus doc (i*7 mod n); the rest are fresh
    dup_src = F.pmod(F.col("tid") * 7, F.lit(n_corpus))
    atext = (
        F.when(F.col("op") == "d", F.lit(None).cast("string"))
        .when(
            (F.col("op") == "c") & (F.col("tid") < 6 * tenth),
            _text_expr(1, dup_src),
        )
        .otherwise(_text_expr(2, F.col("tid")))
    )
    return ev.select(
        F.when(
            F.col("op") != "c",
            F.struct(F.col("bid").alias("doc_id"), F.lit(None).cast("string").alias("text")),
        ).alias("before"),
        F.when(
            F.col("op") != "d",
            F.struct(F.col("aid").alias("doc_id"), atext.alias("text")),
        ).alias("after"),
        F.col("op"),
        F.col("pos").alias("ts_ms"),
        F.struct(
            F.lit("b1").alias("file"),
            F.col("pos").alias("pos"),
            F.lit(None).cast("string").alias("snapshot"),
        ).alias("source"),
        F.struct(F.lit("tx").alias("id")).alias("transaction"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="200000,800000,3200000")
    ap.add_argument("--delta", type=int, default=20_000)
    ap.add_argument("--words", type=int, default=80)
    args = ap.parse_args()
    global _WORDS
    _WORDS = args.words
    sizes = [int(s) for s in args.sizes.split(",")]

    from debezium_spark.dataops import corpus_census, incremental_corpus_update
    from debezium_spark.dataops.dedup import dedup_against_corpus
    from debezium_spark.operators.apply import compute_changes, split_pk_changes

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "corpus-curve")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cdc_corpcurve_", dir="/dev/shm")
    results = []
    try:
        # JIT warm-up on a small corpus (separate dirs, both paths)
        wc = os.path.join(work, "warm")
        _corpus(spark, 20_000).write.mode("overwrite").parquet(f"{wc}/corpus")
        wdf = spark.read.parquet(f"{wc}/corpus")
        corpus_census(wdf).write.mode("overwrite").parquet(f"{wc}/census")
        _delta_env(spark, 20_000, args.delta).write.mode("overwrite").parquet(
            f"{wc}/delta"
        )
        wd = spark.read.parquet(f"{wc}/delta")
        d = incremental_corpus_update(wd, spark.read.parquet(f"{wc}/census"))
        d.upserts.write.mode("overwrite").parquet(f"{wc}/ups")
        ch = compute_changes(split_pk_changes(wd, ["doc_id"]), ["doc_id"])
        dedup_against_corpus(
            ch.where(F.col("_op") == "u").select("doc_id", "text"), wdf
        ).write.mode("overwrite").parquet(f"{wc}/rescan")

        for size in sizes:
            root = os.path.join(work, f"c_{size}")
            _corpus(spark, size).write.mode("overwrite").parquet(f"{root}/corpus")
            cdf = spark.read.parquet(f"{root}/corpus")
            corpus_census(cdf).write.mode("overwrite").parquet(f"{root}/census")
            corpus_bytes = _dir_bytes(f"{root}/corpus")
            census_bytes = _dir_bytes(f"{root}/census")
            # materialize the delta as the stream would deliver it (a
            # micro-batch on disk) — timing an unmaterialized generator
            # plan would charge the synthetic text formula to every
            # subtree traversal instead of to the source scan
            _delta_env(spark, size, args.delta).write.mode("overwrite").parquet(
                f"{root}/delta"
            )
            delta = spark.read.parquet(f"{root}/delta")

            t0 = time.perf_counter()
            d = incremental_corpus_update(delta, spark.read.parquet(f"{root}/census"))
            d.upserts.write.mode("overwrite").parquet(f"{root}/out_ups")
            d.deletes.write.mode("overwrite").parquet(f"{root}/out_del")
            t_incremental = time.perf_counter() - t0

            t0 = time.perf_counter()
            ch = compute_changes(split_pk_changes(delta, ["doc_id"]), ["doc_id"])
            marks = dedup_against_corpus(
                ch.where(F.col("_op") == "u").select("doc_id", "text"),
                cdf.join(ch.select("doc_id"), "doc_id", "left_anti"),
            )
            marks.where(~F.col("is_duplicate")).select("doc_id").write.mode(
                "overwrite"
            ).parquet(f"{root}/out_rescan")
            t_rescan = time.perf_counter() - t0

            ups = spark.read.parquet(f"{root}/out_ups")
            n_ups = ups.count()
            n_del = spark.read.parquet(f"{root}/out_del").count()
            # both paths must reach the SAME admission decision
            resc = spark.read.parquet(f"{root}/out_rescan")
            diff = ups.select("doc_id").exceptAll(resc).count() + resc.exceptAll(
                ups.select("doc_id")
            ).count()
            row = {
                "corpus_rows": size,
                "corpus_bytes": corpus_bytes,
                "census_bytes": census_bytes,
                "census_frac_of_corpus": round(census_bytes / corpus_bytes, 4),
                "delta_events": args.delta,
                "incremental_s": round(t_incremental, 2),
                "rescan_s": round(t_rescan, 2),
                "upserts": n_ups,
                "deletes": n_del,
                "decision_mismatches": diff,
            }
            print(json.dumps(row), flush=True)
            results.append(row)
            shutil.rmtree(root, ignore_errors=True)

        lo, hi = results[0], results[-1]
        print(
            json.dumps(
                {
                    "summary": "corpus-curve",
                    "corpus_growth_x": round(hi["corpus_rows"] / lo["corpus_rows"], 1),
                    "incremental_growth_x": round(
                        hi["incremental_s"] / lo["incremental_s"], 2
                    ),
                    "rescan_growth_x": round(hi["rescan_s"] / lo["rescan_s"], 2),
                    "census_frac_of_corpus": hi["census_frac_of_corpus"],
                    "all_decisions_match": all(
                        r["decision_mismatches"] == 0 for r in results
                    ),
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
