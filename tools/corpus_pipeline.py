"""Training-corpus pipeline entrypoint — the dataops analog of
run_replay_job.py: clean → filter → dedup → decontaminate → annotate a
document corpus into a training-ready parquet, stage-checkpointed.

Run via spark-submit --py-files (same contract as the replay job):

    spark-submit tools/corpus_pipeline.py \
        --input /data/documents.parquet --output /data/corpus_clean \
        --checkpoint /data/_pipeline_stages \
        [--benchmark /data/eval_docs.parquet] [--no-c4] [--no-gopher] \
        [--substr-k 50] [--line-min-docs 2] [--min-stop-words 2]

Prints one JSON line with the per-stage survivor counts (the audit
funnel) and the final corpus size. The stage checkpoint dir is the
restart unit: each stage is a plain parquet directory, and rerunning
with ``--resume`` skips every stage whose ``_SUCCESS`` marker exists and
recomputes only the unfinished tail (same input and flags assumed;
completed stages are never rewritten).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input documents parquet")
    p.add_argument("--output", required=True, help="final corpus parquet dir")
    p.add_argument("--checkpoint", default=None, help="stage materialization dir")
    p.add_argument(
        "--resume", action="store_true",
        help="reuse completed stages in --checkpoint (same input/flags)",
    )
    p.add_argument("--benchmark", default=None, help="eval-set parquet to decontaminate against")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--no-c4", action="store_true")
    p.add_argument("--no-gopher", action="store_true")
    p.add_argument("--no-annotate", action="store_true")
    p.add_argument("--substr-k", type=int, default=50)
    p.add_argument("--line-min-docs", type=int, default=2)
    p.add_argument("--min-stop-words", type=int, default=2)
    p.add_argument("--min-words", type=int, default=50)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from debezium_spark.dataops.pipeline import training_corpus_pipeline

    spark = (
        SparkSession.builder.appName("corpus_pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    res = training_corpus_pipeline(
        docs,
        bench,
        id_col=args.id_col,
        text_col=args.text_col,
        checkpoint_dir=args.checkpoint,
        resume=args.resume,
        line_dedup_min_docs=args.line_min_docs,
        substr_k=args.substr_k,
        annotate=not args.no_annotate,
        c4=not args.no_c4,
        gopher=not args.no_gopher,
        gopher_opts={
            "min_stop_words": args.min_stop_words,
            "min_words": args.min_words,
        },
    )
    res.corpus.write.mode("overwrite").parquet(args.output)
    final = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "input": docs.count(),
                "stages": dict(res.audit()),
                "final": final,
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
