"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting. Pure Catalyst; float ratios come from
int/int double division (IEEE-deterministic) rounded at emission."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from debezium_spark.dataops.dedup import tokens_col

# Marker-word lists for the n-gram language heuristic. Tiny on purpose —
# a real deployment swaps in per-language frequency tables; the operator
# shape (score per language → argmax with fixed tie order) is what scales.
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_input_cols: bool = False,
) -> DataFrame:
    """Marker-word language heuristic: score per language = number of token
    hits against its marker list; argmax with deterministic tie order
    (en > de > es > fr by list order, ties to the earlier language).

    ``keep_input_cols=True`` passes the input's other columns through, so
    stateless annotators CHAIN into one collapsed projection instead of
    each forcing an id-equi join (the composed pipeline's annotate
    step)."""
    # NULL text pins to zero tokens (module convention — see c4_clean):
    # a NULL array would ripple NULL scores where empty text scores 0
    toks = F.coalesce(tokens_col(text_col), F.array().cast("array<string>"))
    scores = []
    for lang, words in _LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(words)))
        scores.append((lang, hits))
    passthru = (
        [F.col(c) for c in docs.columns if c != id_col] if keep_input_cols else []
    )
    out = docs.select(
        F.col(id_col), *passthru, *[s.alias(f"score_{l}") for l, s in scores]
    )
    # argmax with the documented tie order: build the when-chain so the
    # EARLIEST language is tested first against the max, and a zero max
    # stays 'unknown' (review r5: the previous strict-> fold resolved ties
    # to the LAST language and made 'unknown' unreachable — and the oracle
    # mirrored the bug, so only a semantics read caught it)
    m = F.greatest(*[F.col(f"score_{lang}") for lang, _ in scores])
    pred = F.lit("unknown")
    for lang, _ in reversed(scores):
        pred = F.when(
            (F.col(f"score_{lang}") == m) & (m > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("predicted_lang", pred)


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_input_cols: bool = False,
) -> DataFrame:
    """Heuristic quality features + composite score:
    token count, mean token length, stopword ratio, non-alnum ratio.
    ``keep_input_cols`` as on ``language_id``."""
    # NULL text pins to zero-signal: F.least() SKIPS a NULL token-count
    # term and returned 1.0, so a contentless doc scored 0.4 — above a
    # real short-prose doc (final review r5); with the pin it scores 0.0
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.coalesce(tokens_col(text_col), F.array().cast("array<string>"))
    n_tok = F.size(toks)
    n_char = F.length(txt)
    alnum_chars = F.length(F.regexp_replace(txt, "[^a-zA-Z0-9]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(["the", "a", "of", "and", "to", "is", "in"])))
    mean_tok_len = F.when(n_tok > 0, F.round(alnum_chars / n_tok, 4)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, F.round(stop / n_tok, 4)).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_char > 0, F.round(alnum_chars / n_char, 4)).otherwise(F.lit(0.0))
    score = F.round(
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4 + stop_ratio * 0.2 + alnum_ratio * 0.4, 4
    )
    return docs.select(
        F.col(id_col),
        *([F.col(c) for c in docs.columns if c != id_col] if keep_input_cols else []),
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alnum_ratio.alias("alnum_ratio"),
        score.alias("quality"),
    )


def token_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_input_cols: bool = False,
) -> DataFrame:
    """Token counting three ways: whitespace split, word-regex count, and a
    BPE-ish subword proxy (ceil of alnum chars / 4 — the classic chars/4
    token estimate). ``keep_input_cols`` as on ``language_id``."""
    # split('') yields [""] — an empty/whitespace-only doc must report 0
    # whitespace tokens, not 1 (review r4); NULL text is the same class
    # and pins to '' so every count is 0, never NULL (final review r5:
    # NULL counts vanish from SUMs and fail both sides of thresholds)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.trim(txt)
    ws = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )
    words = F.size(F.coalesce(tokens_col(text_col), F.array().cast("array<string>")))
    alnum_chars = F.length(F.regexp_replace(txt, "[^a-zA-Z0-9]", ""))
    bpe_est = F.ceil(alnum_chars / F.lit(4.0)).cast("long")
    return docs.select(
        F.col(id_col),
        *([F.col(c) for c in docs.columns if c != id_col] if keep_input_cols else []),
        ws.alias("ws_tokens"),
        words.alias("word_tokens"),
        bpe_est.alias("bpe_est_tokens"),
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020, §2.2 — the
    published heuristics behind the C4 corpus), per document:

    - keep only lines that end in terminal punctuation (``. ! ? "``);
    - drop lines with fewer than ``min_words_per_line`` whitespace words;
    - drop lines containing the word "javascript" (any case);
    - drop the WHOLE document if it contains "lorem ipsum" (any case) or
      a ``{`` anywhere, or if the cleaned text has fewer than
      ``min_sentences`` sentences (terminal-punctuation marks in the kept
      lines — the paper counts sentences; punctuation marks are the
      deterministic engine-agnostic proxy).

    Returns ``(id_col, clean_text, n_lines_kept, n_lines_total,
    n_sentences, keep, reasons)`` — the cleaned text is emitted even for
    dropped docs so a pipeline can audit what the filter saw. Stateless
    per-row Catalyst (split → filter → re-join): a map over the corpus
    scan, no shuffle, no UDF."""
    # NULL text pins to '' so every rule stays two-valued: a NULL riding
    # through lower()/contains() would make keep NULL — dropped by the
    # pipeline's where(keep) but with EMPTY reasons, vanishing without an
    # audit trail (same class line_dedup fixed; final review r5)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")
    kept = F.filter(
        lines,
        lambda l: F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.length(clean) - F.length(F.regexp_replace(clean, r"[.!?]", ""))
    rules = [
        ("lorem_ipsum", ~F.lower(txt).contains("lorem ipsum")),
        ("curly_brace", ~txt.contains("{")),
        ("too_few_sentences", n_sent >= min_sentences),
    ]
    reasons = F.concat_ws(",", *[F.when(~ok, F.lit(name)) for name, ok in rules])
    keep = rules[0][1]
    for _, ok in rules[1:]:
        keep = keep & ok
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        F.size(lines).cast("long").alias("n_lines_total"),
        n_sent.cast("long").alias("n_sentences"),
        keep.alias("keep"),
        reasons.alias("reasons"),
    )


#: Gopher's stop-word list for the "must contain ≥2 of these" rule
#: (Rae et al. 2021, A1.1) — a presence check, not a frequency table.
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_doc_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
) -> DataFrame:
    """Gopher's document-level quality rules (Rae et al. 2021, A1.1 — the
    published heuristic filter set), as a keep/drop decision with the
    failed-rule names, so a pipeline can both filter and audit WHY:

    - word count in [min_words, max_words] (whitespace words);
    - mean word length in [min_mean_word_len, max_mean_word_len];
    - symbol-to-word ratio (``#`` and ``...`` occurrences) ≤ max;
    - ≥ min_alpha_word_frac of words contain an alphabetic character;
    - ≥ min_stop_words DISTINCT stop words present (the/be/to/of/and/
      that/have/with).

    Everything is a per-row Catalyst expression over the split word array
    — stateless map over a corpus scan, no shuffle, no UDF; ratios are
    emitted rounded to 4 for engine-agnostic comparison. ``reasons`` is a
    comma-joined string in fixed rule order (empty = keep)."""
    # NULL text pins to '' — see c4_clean: NULL must fail rules with their
    # names in reasons, not three-value its way to keep=NULL/reasons=''
    txt = F.coalesce(F.col(text_col), F.lit(""))
    trimmed = F.trim(txt)
    words = F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )
    wc = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.when(wc > 0, word_chars / wc).otherwise(F.lit(0.0))
    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    n_ellipsis = (
        F.length(txt) - F.length(F.regexp_replace(txt, r"\.\.\.", ""))
    ) / F.lit(3)
    sym_ratio = F.when(wc > 0, (n_hash + n_ellipsis) / wc).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        wc > 0,
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))) / wc,
    ).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
        )
    )

    rules = [
        ("word_count", (wc >= min_words) & (wc <= max_words)),
        ("mean_word_len", (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)),
        ("symbol_ratio", sym_ratio <= max_symbol_ratio),
        ("alpha_word_frac", alpha_frac >= min_alpha_word_frac),
        ("stop_words", n_stop >= min_stop_words),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(~ok, F.lit(name)) for name, ok in rules]
    )
    keep = rules[0][1]
    for _, ok in rules[1:]:
        keep = keep & ok
    return docs.select(
        F.col(id_col),
        wc.cast("long").alias("word_count"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stop_words"),
        keep.alias("keep"),
        reasons.alias("reasons"),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", table A1 — the published quality-filter
    family): per document,

    - ``dup_line_frac`` — fraction of non-empty lines that are repeats of
      an earlier line (first occurrence NOT counted: n_lines − n_distinct
      over n_lines); ``dup_line_char_frac`` — fraction of characters
      contained in duplicated lines counting ALL their occurrences,
      including the first (the paper's "characters within duplicate
      lines" reading — deliberately a different convention from the count
      metric, pinned by the test suite and the SQL oracle; final review
      r5 flagged the docstring for lumping them under one rule);
    - ``top{n}_char_frac`` for each n in ``top_ns`` — characters covered
      by the single most frequent word n-gram (occurrences × gram length
      over the space-joined token-stream length, overlaps counted as the
      paper does); ties break deterministically on (count, gram length,
      gram) descending;
    - ``dup{n}_char_frac`` for each n in ``dup_ns`` — characters covered
      by ALL n-grams occurring more than once.

    Scale shape: both signal families are explode → count-by-(doc, key) →
    re-aggregate-by-doc — two partial-aggregable shuffles keyed on doc id,
    no cross-document term at all (this is per-doc analysis), so the cost
    is a constant factor over a corpus scan at any corpus size. Zero-token
    or single-line docs report 0.0 everywhere, never null."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = tokens_col(text_col)
    base = docs.select(
        F.col(id_col).alias("did"),
        F.col(text_col).alias("_t"),
        toks.alias("_toks"),
        F.length(F.array_join(toks, " ")).alias("stream_chars"),
    )

    # one explode carries every requested n: array of (n, gram) structs.
    # The per-n lambda MUST be built by a single-argument closure factory:
    # a two-parameter lambda (even via a default arg like ``lambda i, n=n``)
    # is bound by ``F.transform`` as its (element, index) form, silently
    # turning the captured n into the array index
    def _gram_array(n):
        m = F.size(F.col("_toks")) - F.lit(n - 1)

        def mk(i):
            return F.struct(
                F.lit(n).alias("n"),
                F.array_join(F.slice(F.col("_toks"), i, n), " ").alias("g"),
            )

        return F.when(m >= 1, F.transform(F.sequence(F.lit(1), m), mk)).otherwise(
            F.array().cast("array<struct<n:int,g:string>>")
        )

    gram_arrays = [_gram_array(n) for n in all_ns]
    grams = base.select("did", F.explode(F.concat(*gram_arrays)).alias("gr")).select(
        "did", F.col("gr.n").alias("n"), F.col("gr.g").alias("g")
    )
    gc = (
        grams.groupBy("did", "n", "g")
        .agg(F.count("*").alias("cnt"))
        .withColumn("gl", F.length("g"))
    )
    per = (
        gc.groupBy("did", "n")
        .agg(
            F.max(F.struct("cnt", "gl", "g")).alias("top"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("gl") * F.col("cnt")).otherwise(F.lit(0))
            ).alias("dupc"),
        )
        .select("did", "n", (F.col("top.cnt") * F.col("top.gl")).alias("topc"), "dupc")
    )
    piv = per.groupBy("did").pivot("n", all_ns).agg(
        F.first("topc").alias("topc"), F.first("dupc").alias("dupc")
    )

    lines = base.select(
        "did",
        F.explode(F.filter(F.split(F.col("_t"), "\n"), lambda x: x != "")).alias("l"),
    )
    lc = lines.groupBy("did", "l").agg(F.count("*").alias("cnt")).withColumn(
        "ll", F.length("l")
    )
    lstats = lc.groupBy("did").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("ll") * F.col("cnt")).alias("chars_total"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("ll") * F.col("cnt")).otherwise(F.lit(0))
        ).alias("chars_dup"),
    )

    out = (
        base.select("did", "stream_chars")
        .join(piv, "did", "left")
        .join(lstats, "did", "left")
    )

    def _frac(num, den):
        return F.when(den > 0, F.round(num / den, 4)).otherwise(F.lit(0.0))

    cols = [
        F.col("did").alias(id_col),
        _frac(
            F.coalesce(F.col("n_lines"), F.lit(0))
            - F.coalesce(F.col("n_distinct"), F.lit(0)),
            F.coalesce(F.col("n_lines"), F.lit(0)),
        ).alias("dup_line_frac"),
        _frac(
            F.coalesce(F.col("chars_dup"), F.lit(0)),
            F.coalesce(F.col("chars_total"), F.lit(0)),
        ).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        cols.append(
            _frac(
                F.coalesce(F.col(f"`{n}_topc`"), F.lit(0)), F.col("stream_chars")
            ).alias(f"top{n}_char_frac")
        )
    for n in dup_ns:
        cols.append(
            _frac(
                F.coalesce(F.col(f"`{n}_dupc`"), F.lit(0)), F.col("stream_chars")
            ).alias(f"dup{n}_char_frac")
        )
    return out.select(*cols)


def doc_fingerprint(
    docs: DataFrame, k: int = 16, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Winnowing-style fingerprint over character k-grams: the document
    fingerprint is the lexicographic-min sha256 of its k-grams plus the
    distinct k-gram count (rolling-hash analog with an engine-agnostic
    hash)."""
    n = F.length(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(k) + 1))
    grams = F.transform(idx, lambda i: F.sha2(F.col(text_col).substr(i, F.lit(k)), 256))
    return docs.select(
        F.col(id_col),
        F.array_min(grams).alias("fingerprint"),
        F.size(F.array_distinct(grams)).alias("n_grams"),
    )


def pii_scrub(docs, id_col: str = "doc_id", text_col: str = "text"):
    """PII redaction — the compliance pass every training-data pipeline runs
    before tokenization: emails, NANP-style phone numbers and IPv4 literals
    replace with typed markers. One chained ``regexp_replace`` per class,
    whole-stage codegen (regex execution is JVM-side); patterns restricted
    to syntax shared by Java regex and RE2 so oracles replicate exactly.
    Emits the scrubbed text plus per-class redaction counts (the audit
    numbers a pipeline reports)."""
    from pyspark.sql import functions as F

    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(email), 0)).cast("long")
    scrubbed1 = F.regexp_replace(t, email, "[EMAIL]")
    n_phone = F.size(F.regexp_extract_all(scrubbed1, F.lit(phone), 0)).cast("long")
    scrubbed2 = F.regexp_replace(scrubbed1, phone, "[PHONE]")
    n_ip = F.size(F.regexp_extract_all(scrubbed2, F.lit(ipv4), 0)).cast("long")
    scrubbed3 = F.regexp_replace(scrubbed2, ipv4, "[IP]")
    return docs.select(
        F.col(id_col),
        scrubbed3.alias("scrubbed"),
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
        n_ip.alias("n_ips"),
    )


def chunk_documents(
    docs,
    chunk_chars: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """RAG-style document chunking: fixed character windows with overlap,
    as a pure Catalyst sequence+substring explode (per-row map — embarrasses
    parallel at 100 TB, no state, no Python). Emits (doc_id, chunk_idx,
    chunk, n_chars); byte-stable chunk boundaries so re-runs and the oracle
    agree exactly. Tokenizer-aware chunking swaps the window arithmetic for
    token offsets from token_stats without changing the plan shape."""
    from pyspark.sql import functions as F

    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int")
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (
        docs.select(F.col(id_col), t.alias("_t"), F.explode(idx).alias("chunk_idx"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("_t").substr(F.col("chunk_idx") * step + 1, F.lit(chunk_chars)).alias("chunk"),
        )
        .withColumn("n_chars", F.length("chunk").cast("long"))
    )


def vocab_topk(docs, k: int = 100, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus vocabulary: top-k terms by document frequency (the stop-word /
    tokenizer-vocab pass). explode → two partial-aggregable groupBys; ties
    broken lexicographically so results are total-ordered and reproducible."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("term")
    )
    df_counts = tok.groupBy("term").agg(F.countDistinct(id_col).cast("long").alias("df"))
    # Top-k pushdown: orderBy().limit(k) plans TakeOrderedAndProject — each
    # partition keeps its local top-k, the driver merges k·p rows. The old
    # unpartitioned row_number window sorted the ENTIRE vocabulary in one
    # task (billions of terms at corpus scale). Rank is derived afterwards
    # over the k surviving rows only — bounded, never corpus-sized.
    top = df_counts.orderBy(F.desc("df"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "term", "df")
    )


def unigram_logprob(
    docs,
    ref=None,
    top_k: int = 50_000,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """CCNet-style language-model quality signal: score every document by
    its mean negative log-likelihood under an add-``alpha``-smoothed
    unigram model trained on a reference corpus (CCNet filters CommonCrawl
    by Wikipedia-LM perplexity; this is the same signal with the LM
    reduced to its order-1 form, trainable in two aggregations — the
    operator SHAPE is what scales, and a higher-order external LM would
    slot in as a scoring UDF).

    Model: ``p(t) = (c(t) + alpha) / (N + alpha * V)`` where ``c`` counts
    token occurrences in ``ref`` (default: ``docs`` itself — self-scoring
    flags outlier documents), ``N`` is the total reference token count and
    ``V`` is the distinct-term count plus one OOV bucket. Only the
    ``top_k`` most frequent terms keep their counts (count desc, term asc
    tie order — deterministic); tail terms score as OOV. That cap is the
    scale knob: the scoring join stays broadcastable at any corpus size,
    exactly how production pipelines bound their LM vocab.

    Returns (id_col, n_tokens, avg_nll): natural-log NLL averaged per
    token, rounded to 6 dp (float parity margin: cross-engine libm and
    summation-order noise is ~1e-13 relative). Zero-token docs get
    n_tokens 0 and null avg_nll. Shape: explode → broadcast-join vocab →
    one partial-aggregable groupBy(doc); the model side is two
    aggregations to O(top_k) and O(1) rows."""
    from pyspark.sql import functions as F

    ref = docs if ref is None else ref
    ref_tok = ref.select(F.explode(tokens_col(text_col)).alias("term"))
    counts = ref_tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(top_k)
    model = counts.agg(
        F.sum("cnt").alias("_n"),
        (F.count(F.lit(1)) + F.lit(1)).alias("_v"),  # +1 = the OOV bucket
    )
    tok = docs.select(
        F.col(id_col), F.explode_outer(tokens_col(text_col)).alias("term")
    )
    nll = -F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(alpha)))
        / (F.col("_n") + F.lit(float(alpha)) * F.col("_v"))
    )
    return (
        tok.join(F.broadcast(top), "term", "left")
        .crossJoin(F.broadcast(model))
        .groupBy(id_col)
        .agg(
            F.count("term").cast("long").alias("n_tokens"),
            F.round(
                F.avg(F.when(F.col("term").isNotNull(), nll)), 6
            ).alias("avg_nll"),
        )
    )


def quantize_embeddings(
    emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
):
    """Symmetric int8-style embedding quantization (the storage/serving
    compression step): per-vector scale = max|x| / (2^(bits-1)-1), elements
    round to integers in [-q, q]. Pure array expressions; scale emitted so
    dequantization is exact to the rounding. Integer outputs make the
    result engine-reproducible bit-for-bit."""
    from pyspark.sql import functions as F

    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    absmax = F.aggregate(
        F.transform(v, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    # round scale so both engines agree on the divisor bit-for-bit
    scale = F.round(absmax / qmax, 9)
    # clamp to [-q, q]: dividing by the ROUNDED scale can push the max
    # element past qmax when absmax is tiny (scale rounds DOWN) — the
    # documented range is a hard contract for downstream int8 casts
    q = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-qmax),
            F.least(F.lit(qmax), F.round(x.cast("double") / scale, 0).cast("int")),
        ),
    )
    # Gate on the ROUNDED scale: for 0 < absmax < ~6.4e-8 the 9dp rounding
    # collapses scale to 0.0 and x/scale would emit Infinity garbage even
    # though absmax > 0. Sub-quantum vectors quantize to zero vectors.
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        F.when(scale > 0, q).otherwise(
            F.transform(v, lambda x: F.lit(0))
        ).alias("qvec"),
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level exact line deduplication — the RefinedWeb/CCNet
    boilerplate-removal pass (Penedo et al. 2023 §3.4 run line-wise;
    CCNet, Wenzek et al. 2020 §3.1, dedupes hashed lines across shards):
    a line whose trimmed form appears in >= ``min_docs`` DISTINCT
    documents is boilerplate (headers, nav bars, cookie banners) and is
    removed from EVERY document; the rest of each document re-joins in
    original line order. Blank lines never count as duplicates (they
    would trivially collide corpus-wide and shred formatting).

    ``sep`` is a LITERAL unit separator (escaped before the regex split;
    reassembly joins with it verbatim): the default ``"\\n"`` is the
    line-wise pass; ``"\\n\\n"`` gives paragraph-level exact dedup — the
    Dolma recipe (Soldaini et al. 2024 §2, Bloom-filter paragraph
    dedup), here with an exact census instead of a probabilistic
    filter.

    Scale shape: lines ride as sha256 digests, not strings, through the
    heavy operations — the duplicate census is distinct(digest, doc) →
    count per digest (two partial-aggregable shuffles on a 32-byte key),
    the removal is an equi-join on the digest (Catalyst broadcasts it
    when the boilerplate set is small; at corpus scale it degrades to a
    hash join, never a cartesian), and reassembly is one groupBy(doc)
    over (pos, line) structs. No window over the full corpus, no UDF.

    Output: (id_col, clean_text, n_lines_kept, n_lines_dropped) — one row
    per input document (a fully-boilerplate doc survives with
    clean_text = ''; NULL text reads as '' — splitting NULL explodes to
    ZERO rows, which would silently drop the document from the output
    (review r5), so it is pinned to the empty-string behavior: one blank
    line, kept)."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would drop every line)")
    if not sep:
        raise ValueError("sep must be a non-empty literal separator")
    import re as _re

    lines = docs.select(
        F.col(id_col).alias("did"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep))
        ).alias("pos", "line"),
    ).withColumn(
        "h",
        F.when(F.trim(F.col("line")) != "", F.sha2(F.trim(F.col("line")), 256)),
    )
    dup = (
        lines.where(F.col("h").isNotNull())
        .select("h", "did").distinct()
        .groupBy("h").agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("h")
    )
    # anti-join drops boilerplate lines; null-h (blank) lines survive it
    kept = lines.join(dup, on="h", how="left_anti")
    agg = kept.groupBy("did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy("did").agg(F.count(F.lit(1)).alias("_nt"))
    return (
        totals.join(agg, on="did", how="left")
        .select(
            F.col("did").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long").alias("n_lines_kept"),
            (F.col("_nt") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )
