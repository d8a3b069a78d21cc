"""Composed training-corpus pipeline: the stage chain must equal the
manual application of its operators in the documented order, survive the
checkpointed/lazy mode switch bit-for-bit, and run the full funnel on the
real corpus fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.dataops.pipeline import training_corpus_pipeline

SF = "/root/testdata/sf0.001"

# the synthetic corpus is stopword-sparse word soup: no terminal
# punctuation (C4's line rule assumes prose) and <2 distinct stopwords
# per doc — so the corpus-appropriate recipe skips C4 and relaxes the
# two Gopher gates, exactly the per-corpus tuning the published recipes
# themselves do
GOPHER_OPTS = {"min_stop_words": 0, "min_words": 20}


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_pipeline_funnel_on_real_corpus(spark, tmp_path):
    docs = _docs(spark)
    bench = docs.orderBy("doc_id").limit(2)
    res = training_corpus_pipeline(
        docs, bench, c4=False, gopher_opts=GOPHER_OPTS,
        checkpoint_dir=str(tmp_path / "stages"),
    )
    audit = res.audit()
    names = [n for n, _ in audit]
    assert names == [
        "02_gopher", "03_line_dedup", "04_exact_substring",
        "05_neardup_survivors", "06_decontaminate",
    ]
    counts = [c for _, c in audit]
    # monotone funnel, nothing fabricated
    n_in = docs.count()
    assert all(a >= b for a, b in zip([n_in] + counts, counts))
    assert counts[-1] > 0
    out = res.corpus
    # passthrough columns + annotations survive; ids are a subset
    for col in ("doc_id", "lang", "source", "text",
                "predicted_lang", "quality", "bpe_est_tokens"):
        assert col in out.columns
    assert out.count() == counts[-1]
    ids_in = {r[0] for r in docs.select("doc_id").collect()}
    ids_out = {r[0] for r in out.select("doc_id").collect()}
    assert ids_out <= ids_in
    # dedup stages never emit empty docs past the min_chars gate
    assert out.where(F.length("text") < 1).count() == 0


def test_pipeline_checkpointed_equals_lazy(spark, tmp_path):
    docs = _docs(spark)
    lazy = training_corpus_pipeline(
        docs, c4=False, gopher_opts=GOPHER_OPTS, annotate=False
    ).corpus
    ckpt = training_corpus_pipeline(
        docs, c4=False, gopher_opts=GOPHER_OPTS, annotate=False,
        checkpoint_dir=str(tmp_path / "s"),
    ).corpus
    a = sorted(map(tuple, lazy.collect()))
    b = sorted(map(tuple, ckpt.collect()))
    assert a == b


def test_pipeline_stages_equal_manual_composition(spark):
    """Each stage output must be exactly what calling the operator on the
    previous stage's output produces — the pipeline adds plumbing, never
    semantics."""
    from debezium_spark.dataops.dedup import exact_substring_dedup
    from debezium_spark.dataops.text import gopher_doc_filter, line_dedup

    docs = _docs(spark).limit(30)
    res = training_corpus_pipeline(
        docs, c4=False, gopher_opts=GOPHER_OPTS, annotate=False
    )
    stages = dict(res.stages)

    work = docs.select("doc_id", "text")
    gop = gopher_doc_filter(work, **GOPHER_OPTS)
    manual_g = work.join(gop.where(F.col("keep")).select("doc_id"), "doc_id")
    assert sorted(map(tuple, stages["02_gopher"].collect())) == sorted(
        map(tuple, manual_g.collect())
    )
    manual_ld = line_dedup(manual_g).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert sorted(map(tuple, stages["03_line_dedup"].collect())) == sorted(
        map(tuple, manual_ld.collect())
    )
    manual_es = (
        exact_substring_dedup(manual_ld, k=50)
        .select("doc_id", F.col("clean_text").alias("text"))
        .where(F.length("text") >= 1)
    )
    assert sorted(map(tuple, stages["04_exact_substring"].collect())) == sorted(
        map(tuple, manual_es.collect())
    )


def test_pipeline_c4_stage_on_prose_corpus(spark):
    """Assembled prose (terminal-punctuated ≥5-word sentences) flows
    through the full default chain including C4; junk lines are cleaned
    from surviving docs rather than the docs being dropped."""
    docs = _docs(spark).limit(20).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("This corpus line carries the payload words "),
                     F.col("text"), F.lit(" and ends properly.")),
            F.lit("short junk"),
            F.lit("Another full sentence with enough words to satisfy the line rule."),
            F.lit("A third full sentence with enough words to satisfy the rule too."),
        ).alias("text"),
    )
    res = training_corpus_pipeline(
        docs, gopher_opts=GOPHER_OPTS, annotate=False,
        c4_opts={"min_sentences": 3},
        # the two trailer sentences are shared by every doc: line_dedup
        # strips them as boilerplate, which is the point of the order
    )
    stages = dict(res.stages)
    assert stages["01_c4_clean"].count() == 20
    kept_text = stages["01_c4_clean"].select("text").first()[0]
    assert "short junk" not in kept_text
    out = res.corpus
    assert out.count() > 0
    # boilerplate trailer sentences removed by the line-dedup stage
    sample = out.select("text").first()[0]
    assert "Another full sentence" not in sample


def test_pipeline_decontaminate_removes_seeded_overlap(spark):
    docs = _docs(spark)
    # benchmark = verbatim copies of two docs: 13-gram overlap guaranteed
    bench = docs.orderBy("doc_id").limit(2).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text"
    )
    contaminated = {r[0] for r in docs.orderBy("doc_id").limit(2).collect()}
    res = training_corpus_pipeline(
        docs, bench, c4=False, gopher_opts=GOPHER_OPTS, annotate=False
    )
    ids_out = {r[0] for r in res.corpus.select("doc_id").collect()}
    assert not (contaminated & ids_out)


def test_pipeline_resume_reuses_completed_stages(spark, tmp_path):
    """resume=True must reuse a completed stage verbatim (its files are
    never rewritten — a second failure cannot destroy finished work) and
    recompute only stages whose commit marker is missing."""
    import os
    import shutil

    import pytest

    docs = _docs(spark).limit(40)
    ckpt = str(tmp_path / "stages")
    first = training_corpus_pipeline(
        docs, c4=False, gopher_opts=GOPHER_OPTS, annotate=False,
        checkpoint_dir=ckpt,
    )
    want = sorted(map(tuple, first.corpus.collect()))
    g_success = os.path.join(ckpt, "02_gopher", "_SUCCESS")
    mtime_before = os.path.getmtime(g_success)
    # simulate a crash after stage 03: stage 04 onward incomplete
    shutil.rmtree(os.path.join(ckpt, "04_exact_substring"))
    shutil.rmtree(os.path.join(ckpt, "05_neardup_survivors"))
    second = training_corpus_pipeline(
        docs, c4=False, gopher_opts=GOPHER_OPTS, annotate=False,
        checkpoint_dir=ckpt, resume=True,
    )
    got = sorted(map(tuple, second.corpus.collect()))
    assert got == want
    # the completed stage was reused, not rewritten
    assert os.path.getmtime(g_success) == mtime_before
    # resume without a checkpoint dir is a contract violation
    with pytest.raises(ValueError):
        training_corpus_pipeline(docs, resume=True)


def test_null_text_fails_gates_with_audited_reasons(spark):
    """Final review r5: NULL text three-valued every rule to keep=NULL
    with EMPTY reasons — the doc vanished from the pipeline with no audit
    trail (the exact class line_dedup pins by coalescing to ''). Both gate
    stages must drop NULL text as an ordinary False with rule names."""
    from debezium_spark.dataops.text import c4_clean, gopher_doc_filter

    docs = spark.createDataFrame(
        [("d1", None), ("d2", "A real sentence ends here.")],
        "doc_id string, text string",
    )

    c4 = {r.doc_id: r for r in c4_clean(docs, min_sentences=1).collect()}
    assert c4["d1"].keep is False
    assert "too_few_sentences" in c4["d1"].reasons

    gop = {r.doc_id: r for r in gopher_doc_filter(docs, min_words=2).collect()}
    assert gop["d1"].keep is False
    assert "word_count" in gop["d1"].reasons
    # non-null rows unaffected
    assert c4["d2"].keep is True and gop["d2"].reasons.startswith("")
