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
    content_digest,
    decontaminate,
    dedup_survivors,
    exact_substring_dedup,
    survivors_by_digest,
)
from debezium_spark.operators.apply import compute_changes, split_pk_changes
from debezium_spark.plans.merge import OP_COL, merge_changes
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


# --------------------------------------------------------------------------
# Incremental corpus maintenance (the CDC → training-corpus bridge)
# --------------------------------------------------------------------------


@dataclass
class CorpusDelta:
    """The corpus mutation one CDC delta produces, plus the new census.

    ``upserts`` — admitted documents (new or re-cleaned updated text, with
    the delta payload's passthrough columns and, when requested, the
    language/quality/token annotations): MERGE these into the corpus by id.
    ``deletes`` — one ``(id_col)`` row per standing corpus document that
    must be removed (explicit CDC delete, an update that now fails the
    quality gates or duplicates other standing content, or a PK change
    away from the old id). ``census`` — the post-delta digest census,
    ``(content_sha, id_col)`` with one row per corpus document; persist it
    (it is a lake table in production) and feed it to the next delta."""

    upserts: DataFrame
    deletes: DataFrame
    census: DataFrame


def corpus_census(
    corpus: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bootstrap the digest census from a standing corpus: one
    ``(content_sha, id_col)`` row per document. Run once over the lake
    (a map + projection — no shuffle); after that
    ``incremental_corpus_update`` maintains it per delta without ever
    rescanning corpus text."""
    return corpus.select(
        content_digest(text_col).alias("content_sha"), F.col(id_col)
    )


def incremental_corpus_update(
    delta: DataFrame,
    census: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    c4: bool = False,
    gopher: bool = False,
    annotate: bool = False,
    c4_opts: dict | None = None,
    gopher_opts: dict | None = None,
    min_chars: int = 1,
) -> CorpusDelta:
    """Apply one CDC delta to a standing cleaned corpus WITHOUT
    recomputing the pipeline over the lake — the production shape at the
    10^10-document design point, where data arrives as change events and
    a full-corpus pass per micro-batch is off the table.

    ``delta`` is a Debezium-envelope frame (before/after/op/ts_ms/source/
    transaction) over a documents payload whose key is ``id_col``;
    ``census`` is the digest census from ``corpus_census`` (or the
    previous delta's ``CorpusDelta.census``). Steps, each with the exact
    incremental-≡-batch argument:

    1. The delta collapses to one final state per document id —
       ``split_pk_changes`` + ``compute_changes``, the engine's own
       last-writer-wins collapse (one partial-agg shuffle; PK-changing
       updates become delete(old)+create(new) exactly as in the CDC
       apply path).
    2. Per-document stages (C4 line cleaning, Gopher quality gates,
       ``min_chars``) run on upserted docs only. These are
       corpus-independent pure maps, so the incremental decision is
       IDENTICAL to a full recompute.
    3. Exact dedup runs against the census, not the corpus: touched ids
       leave the census first (an updated doc's OLD content no longer
       suppresses anything — including other docs in this same delta),
       then a candidate is admitted iff its digest matches no standing
       census row and it is the min-id holder of its digest within the
       delta (``survivors_by_digest`` — the same election rule, one
       definition, that ``dedup_against_corpus`` applies; null-safe on
       the digest). Only digests move: the join is digest-equi with the
       micro-batch side broadcast; corpus text is never rescanned.
    4. ``deletes`` = touched ids present in the old census and not
       re-admitted. ``census`` (output) = standing rows minus touched
       plus admitted.

    First-arrival-wins is the declared dedup semantic: documents
    suppressed as duplicates at ingest were never stored, so deleting a
    survivor does NOT resurrect them — but the survivor's census row
    leaves with it, so the same content arriving in a LATER delta is
    re-admitted fresh. Admission is BATCH-ATOMIC: candidates are judged
    against the batch-END standing set (a doc departing in this delta no
    longer suppresses a creation in the same delta, whatever their event
    order). Cross-key dedup has no chunking-invariant collapse — whether
    doc B's create lands in the same micro-batch as doc A's delete or
    one batch later decides whether B was ever suppressed — so unlike
    the per-key table apply (``operators/apply.py``'s batch ≡ sequential
    theorem), WHICH id holds a piece of content can depend on batch
    boundaries. The batch-end convention is the data-preserving choice
    (content arriving while its duplicate departs is admitted, never
    dropped against a doc that no longer stands), and the periodic full
    pipeline pass re-canonicalizes survivorship corpus-wide.
    Corpus-GLOBAL hygiene (boilerplate line dedup,
    ExactSubstr spans, MinHash near-dup election) is deliberately not
    per-delta — those censuses shift with every admitted doc; run
    ``training_corpus_pipeline`` as the periodic full-pass compaction,
    the standard online-filter/offline-dedup split (same split as the
    reference's streaming-apply vs full-migration paths).

    Like the reference's quality gates, ``c4``/``gopher`` default OFF
    here and opt IN per corpus (an update that stops passing a gate
    deletes the doc — only enable gates the corpus is actually curated
    under).
    """
    env = delta if "_sub" in delta.columns else split_pk_changes(delta, [id_col])
    # the collapse (a posexplode + shuffle over the delta) feeds all three
    # outputs; the documented consumption is three actions (MERGE upserts,
    # MERGE deletes, persist census), and Spark reuses exchanges only
    # within one action — truncate here so the delta collapses ONCE
    ch = compute_changes(env, [id_col]).drop("_pos").localCheckpoint(eager=False)
    touched = ch.select(id_col)
    final_state = ch.where(F.col(OP_COL) == "u").drop(OP_COL)

    work = final_state.select(F.col(id_col), F.col(text_col))
    if c4:
        cleaned = c4_clean(work, id_col=id_col, text_col=text_col, **(c4_opts or {}))
        work = cleaned.where(F.col("keep")).select(
            F.col(id_col), F.col("clean_text").alias(text_col)
        )
    if gopher:
        gop = gopher_doc_filter(
            work, id_col=id_col, text_col=text_col, **(gopher_opts or {})
        )
        work = work.join(
            gop.where(F.col("keep")).select(id_col), on=id_col, how="inner"
        )
    work = work.where(F.coalesce(F.length(F.col(text_col)), F.lit(0)) >= min_chars)

    census_rest = census.join(touched, on=id_col, how="left_anti")
    cand = work.select(
        F.col(id_col), F.col(text_col), content_digest(text_col).alias("content_sha")
    )
    admitted = (
        survivors_by_digest(
            cand, census_rest.select("content_sha", id_col), id_col=id_col
        )
        .where(F.col("survivor_id") == F.col(id_col))
        .select(F.col(id_col), F.col(text_col), F.col("content_sha"))
        .localCheckpoint(eager=False)  # shared by upserts, deletes AND census
    )

    census_out = census_rest.select("content_sha", id_col).unionByName(
        admitted.select("content_sha", id_col)
    )
    deletes = (
        census.join(touched, on=id_col, how="left_semi")
        .select(id_col)
        .join(admitted.select(id_col), on=id_col, how="left_anti")
    )

    body = admitted.select(F.col(id_col), F.col(text_col))
    if annotate:
        body = token_stats(
            quality_score(
                language_id(body, id_col=id_col, text_col=text_col, keep_input_cols=True),
                id_col=id_col, text_col=text_col, keep_input_cols=True,
            ),
            id_col=id_col, text_col=text_col, keep_input_cols=True,
        ).select(id_col, text_col, "predicted_lang", "quality", "bpe_est_tokens")
    upserts = final_state.drop(text_col).join(body, on=id_col, how="inner")
    return CorpusDelta(upserts=upserts, deletes=deletes, census=census_out)


def apply_corpus_delta(
    corpus_table,
    census_table,
    d: CorpusDelta,
    fence: tuple[str, int],
    batch_id: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[int | None, int | None]:
    """Commit a ``CorpusDelta`` through the engine's own fenced MERGE: the
    corpus and its census are ``LakeTable``s keyed by ``id_col``, and the
    mutation rides ``plans.merge.merge_changes`` — so corpus maintenance
    inherits the CDC tables' exactly-once contract (a replayed micro-batch
    whose offset is behind the fence is a no-op), per-bucket lineage, MoR
    O(delta) appends, and time travel, instead of the caller hand-rolling
    versioned parquet directories.

    ``fence`` is the delta's max ``(source.file, source.pos)`` — the same
    offset the CDC engine would fence this batch with. All change rows
    carry the fence pos as ``_pos``: keys are unique within a batch (the
    delta was collapsed per id) and fences are stream-monotone, so MoR
    read-time resolution orders cross-batch versions correctly.

    The census mutation derives from the delta alone — ``deletes`` rows
    become census deletes (census rows exist exactly for standing corpus
    docs) and admitted upserts overwrite their census row with the fresh
    digest — so the census table is maintained by O(delta) change rows,
    never rewritten. The two commits are separate atomic manifests; a
    crash between them replays the batch, the corpus commit no-ops on its
    fence and the census commit re-applies idempotently — the same
    converge-on-replay argument as the engine's fence-in-commit.

    For a PRE-EXISTING corpus, seed the census table ONCE with
    ``seed_census`` (committing only O(delta) census rows per batch means
    nothing else ever writes the standing corpus's digests — an unseeded
    census silently re-admits duplicates of standing docs and never
    deletes them). Returns the two new table versions (either may be
    ``None`` when the fence already covers the batch). Feed
    ``census_table.read()`` to the next delta's
    ``incremental_corpus_update`` call."""
    pos = _resolution_pos_lit(fence)
    up = d.upserts.withColumn(OP_COL, F.lit("u"))
    dl = d.deletes.withColumn(OP_COL, F.lit("d"))
    corpus_changes = up.unionByName(dl, allowMissingColumns=True).withColumn(
        "_pos", pos
    )
    v_corpus = merge_changes(corpus_table, corpus_changes, fence, batch_id)

    census_up = d.upserts.select(
        F.col(id_col), content_digest(text_col).alias("content_sha")
    ).withColumn(OP_COL, F.lit("u"))
    census_changes = census_up.unionByName(dl, allowMissingColumns=True).withColumn(
        "_pos", pos
    )
    v_census = merge_changes(census_table, census_changes, fence, batch_id)
    return v_corpus, v_census


def _resolution_pos_lit(fence: tuple[str, int]):
    """The fence pos in the ENGINE's encoded resolution order (``pos*2``,
    ``operators/apply.resolution_pos``). MoR read-time resolution takes
    ``max_by(_pos)`` per key, and rows written through the CDC apply path
    (a corpus bootstrapped via ``CdcEngine``) carry encoded positions —
    stamping raw positions here would lose to any encoded row with
    ``pos > fence/2`` and make committed corpus updates invisible on
    read."""
    return F.lit(int(fence[1]) * 2).cast("long")


def seed_census(
    census_table,
    corpus: DataFrame,
    fence: tuple[str, int],
    batch_id: str = "census-seed",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int | None:
    """One-time census bootstrap for a PRE-EXISTING corpus: commit every
    standing document's ``(id, content_sha)`` into the census LakeTable
    through the same fenced merge (one full-corpus pass — the analog of
    ``corpus_census``, which this wraps). ``fence`` should be the offset
    the corpus state corresponds to (the corpus table's own fence after
    bootstrap); subsequent ``apply_corpus_delta`` batches must carry
    later offsets. Idempotent like any fenced commit: re-seeding behind
    the fence is a no-op."""
    rows = corpus_census(corpus, id_col=id_col, text_col=text_col).withColumn(
        OP_COL, F.lit("u")
    ).withColumn("_pos", _resolution_pos_lit(fence))
    return merge_changes(census_table, rows, fence, batch_id)
