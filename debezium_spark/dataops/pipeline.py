"""Composed training-corpus pipeline — the capstone over the dataops
operators: the stage order every large-scale LLM-data recipe converges on
(C4 §2.2 line cleaning → Gopher A.1 doc quality → RefinedWeb §3.4 line
dedup → ExactSubstr span dedup (Lee et al. 2022) → MinHash near-dup
survivors → benchmark decontamination (GPT-3 appendix C) → annotation),
as one callable with a per-stage materialization option.

Scale design (the 100 TB shape):

- Every stage consumes and produces the SAME narrow contract —
  ``(id_col, text_col)`` — so stages compose by construction; all other
  input columns rejoin ONCE at the end by id (ids never change, text
  does).
- With ``checkpoint_dir`` set, each stage writes parquet and reads it
  back before the next stage runs — the production mode. Corpus-census
  stages (line dedup, ExactSubstr, MinHash) traverse their input through
  SEVERAL subtrees (census + removal + totals), and Catalyst does not
  common-subexpression-eliminate whole subplans: in a fully lazy chain
  each traversal would recompute every upstream stage, multiplying the
  scan cost once per subtree per stage. Materializing between stages
  makes each stage's input a plain parquet scan, truncates shuffle
  lineage (a lost executor replays one stage, not the chain), and makes
  the stage the unit of restart: rerunning with ``resume=True`` skips
  every stage whose parquet ``_SUCCESS`` marker exists and recomputes
  only the unfinished tail.
- Without ``checkpoint_dir`` the chain stays lazy but every stage
  boundary is a non-eager ``localCheckpoint`` — lineage truncation into
  executor storage. This is a correctness-of-scale requirement, not an
  optimization: census stages fan their input into several subtrees and
  the raw composed logical plan grows combinatorially (the driver OOMs
  in Catalyst before a single task runs). Single-session mode; for
  durable, restartable runs use ``checkpoint_dir``.

Stage boundaries are where a real pipeline parks its audit counts; see
``PipelineResult.audit()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_spark.dataops.dedup import (
    decontaminate,
    dedup_survivors,
    exact_substring_dedup,
)
from debezium_spark.dataops.text import (
    c4_clean,
    gopher_doc_filter,
    language_id,
    line_dedup,
    quality_score,
    token_stats,
)


@dataclass
class PipelineResult:
    """Final corpus + the per-stage outputs that produced it.

    ``corpus`` carries the surviving documents: the input's non-text
    columns, the fully cleaned ``text``, and (with ``annotate=True``)
    ``predicted_lang`` / ``quality`` / ``bpe_est_tokens``. ``stages`` is
    the ordered list of (name, DataFrame) corpus states after each
    stage — each a plain ``(id, text)`` frame, checkpointed when the
    pipeline ran with ``checkpoint_dir``."""

    corpus: DataFrame
    stages: list[tuple[str, DataFrame]] = field(default_factory=list)

    def audit(self) -> list[tuple[str, int]]:
        """Docs surviving each stage, in order — one count job per stage
        (cheap parquet-footer counts when checkpointed). A validation
        pass, not part of the data path."""
        return [(name, df.count()) for name, df in self.stages]


def _stage_io(
    df: DataFrame, name: str, checkpoint_dir: str | None, resume: bool
) -> DataFrame:
    if checkpoint_dir is None:
        # lineage truncation is NOT optional: census stages reference
        # their input through several subtrees and Catalyst re-expands
        # the full upstream tree under each one, so a raw lazy chain
        # grows the logical plan combinatorially per stage (the driver
        # OOMs building the near-dup component joins before any task
        # runs). Non-eager localCheckpoint caps every stage's plan at
        # O(stage) while staying lazy — the single-session mode; parquet
        # checkpoints are the durable production mode.
        return df.localCheckpoint(eager=False)
    path = f"{checkpoint_dir}/{name}"
    spark = df.sparkSession
    if resume:
        # a stage is complete iff its parquet commit marker exists — the
        # unit of restart. Reuse REQUIRES the same input and stage config
        # as the interrupted run (the caller's contract, as with any
        # checkpoint); a completed stage is never rewritten, so a second
        # failure can't destroy finished work
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jvm_path):
            return spark.read.parquet(path)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def training_corpus_pipeline(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    resume: bool = False,
    line_dedup_min_docs: int = 2,
    substr_k: int = 50,
    min_chars: int = 1,
    decon_k: int = 13,
    decon_min_hits: int = 1,
    annotate: bool = True,
    c4: bool = True,
    gopher: bool = True,
    c4_opts: dict | None = None,
    gopher_opts: dict | None = None,
) -> PipelineResult:
    """Run the full cleaning/dedup/decontamination chain over ``docs``.

    Stage order is load-bearing and matches the published recipes:
    per-document cleaning FIRST (C4 line rules, then Gopher quality
    gates on the cleaned text — a doc is judged on what would actually
    ship), corpus-census dedup SECOND over only the survivors (boiler
    lines and duplicated spans from dropped junk must not count), exact/
    near-dup survivor election THIRD over the final text (two docs that
    became identical after span excision ARE duplicates), benchmark
    decontamination LAST (dedup must not resurrect a contaminated copy
    by electing it survivor). ``min_chars`` drops documents whose text
    the dedup stages emptied out (Lee et al. drop empties the same way).

    ``benchmark=None`` skips decontamination; ``annotate=False`` skips
    the final language/quality/token join (pure cleaning mode);
    ``c4=False`` / ``gopher=False`` skip a cleaning stage whose rules
    don't fit the corpus (C4's terminal-punctuation line rule assumes
    prose — on code or log corpora it removes every line; recipes tune
    or drop stages per corpus, so the pipeline must too).

    ``resume=True`` (requires ``checkpoint_dir``) reuses every stage
    whose parquet commit marker already exists and recomputes only the
    rest — the restart path after a mid-pipeline failure. It assumes the
    input and stage configuration are unchanged since the interrupted
    run; completed stages are never rewritten."""
    if resume and checkpoint_dir is None:
        raise ValueError("resume=True requires checkpoint_dir")
    work = docs.select(F.col(id_col), F.col(text_col))
    stages: list[tuple[str, DataFrame]] = []

    def push(name: str, df: DataFrame) -> DataFrame:
        df = _stage_io(df, name, checkpoint_dir, resume)
        stages.append((name, df))
        return df

    # 1. C4 line-level cleaning (keep gated, text replaced by clean_text)
    if c4:
        cleaned = c4_clean(work, id_col=id_col, text_col=text_col, **(c4_opts or {}))
        work = push(
            "01_c4_clean",
            cleaned.where(F.col("keep")).select(
                F.col(id_col), F.col("clean_text").alias(text_col)
            ),
        )

    # 2. Gopher document-level quality gates on the CLEANED text
    if gopher:
        gop = gopher_doc_filter(
            work, id_col=id_col, text_col=text_col, **(gopher_opts or {})
        )
        work = push(
            "02_gopher",
            work.join(
                gop.where(F.col("keep")).select(id_col), on=id_col, how="inner"
            ),
        )

    # 3. corpus-level boilerplate line dedup over the survivors
    ld = line_dedup(work, min_docs=line_dedup_min_docs, id_col=id_col, text_col=text_col)
    work = push(
        "03_line_dedup",
        ld.select(F.col(id_col), F.col("clean_text").alias(text_col)),
    )

    # 4. ExactSubstr span dedup, then drop emptied docs
    es = exact_substring_dedup(work, k=substr_k, id_col=id_col, text_col=text_col)
    work = push(
        "04_exact_substring",
        es.select(F.col(id_col), F.col("clean_text").alias(text_col)).where(
            F.length(text_col) >= min_chars
        ),
    )

    # 5. exact + MinHash near-dup components → keep elected survivors
    surv = dedup_survivors(work, id_col=id_col, text_col=text_col)
    work = push(
        "05_neardup_survivors",
        work.join(
            surv.where(~F.col("is_duplicate")).select(id_col), on=id_col, how="inner"
        ),
    )

    # 6. benchmark decontamination (anti-join on contaminated ids)
    if benchmark is not None:
        cont = decontaminate(
            work, benchmark, k=decon_k, min_hits=decon_min_hits,
            id_col=id_col, text_col=text_col,
        )
        work = push(
            "06_decontaminate",
            work.join(cont.select(id_col), on=id_col, how="left_anti"),
        )

    # 7. annotate in ONE pass — the three annotators are stateless per-row
    # projections, so with keep_input_cols they chain into one collapsed
    # map stage (three separate id-joins would add three full-corpus
    # exchanges for columns computable in place) — then one join rejoins
    # the input's passthrough columns
    if annotate:
        ann = token_stats(
            quality_score(
                language_id(
                    work, id_col=id_col, text_col=text_col, keep_input_cols=True
                ),
                id_col=id_col, text_col=text_col, keep_input_cols=True,
            ),
            id_col=id_col, text_col=text_col, keep_input_cols=True,
        )
        work = ann.select(
            id_col, text_col, "predicted_lang", "quality", "bpe_est_tokens"
        )
    out = docs.drop(text_col).join(work, on=id_col, how="inner")
    return PipelineResult(corpus=out, stages=stages)
