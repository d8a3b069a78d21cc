"""Document deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard. All pure Catalyst (higher-order array functions + sha2); built to
scale: shingling is a per-row map, candidate generation goes through
equi-joins on hash buckets (shuffle on short keys), and verification only
touches candidate pairs — never the full n² cross product.

Determinism: every hash is sha256 over explicit strings, so results are
identical across runs, partitionings, and engines (the DuckDB oracle
replicates them byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text") -> "F.Column":
    """Lowercased word tokens."""
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)


def shingles_col(k: int, text_col: str = "text") -> "F.Column":
    """Distinct k-word shingles (space-joined); short docs (0 < n < k)
    yield one shorter shingle; docs with NO tokens yield an EMPTY set —
    they then generate no signatures and no candidate pairs. Without this,
    every distinct zero-token document (CJK/Cyrillic/symbol-only text under
    the [a-z0-9] tokenizer) collapsed onto the single shingle [""] and
    near-dup marked them all as verified duplicates of one survivor
    (review r4). Token-less docs are exact-dedup territory (identical
    content still groups by sha256); near-dup similarity over an empty
    token set is undefined, so they opt out of LSH/SimHash entirely."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(k) + 1))
    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
        )
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by sha256(text): the survivor per content hash is the
    smallest id. Hash-groupBy: map-side combinable, one shuffle on the
    digest."""
    h = F.sha2(F.col(text_col), 256)
    return (
        docs.select(F.col(id_col), h.alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("survivor_id"), F.count("*").alias("dup_count"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    k: int = 8,
    n_hashes: int = 8,
    band_size: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash + LSH banding.

    MinHash trick that needs no integer hash family: for seed i, the
    signature element is the *lexicographic min* of sha256(i || ':' ||
    shingle) — a uniformly random permutation of shingle space per seed,
    hence a valid min-hash. Bands of ``band_size`` signature elements are
    concatenated; documents sharing any band bucket become candidate pairs
    (the classic banding join). Scale: explode-to-shingles → groupBy(doc)
    partial-aggregated mins → short-key equi-join on (band_idx, band_val);
    no cross product.
    """
    if band_size <= 0 or n_hashes % band_size != 0:
        # a non-dividing band_size silently discarded trailing signature
        # elements (recall loss) and band_size > n_hashes crashed — same
        # pigeonhole-style validation as the SimHash banding path
        raise ValueError(
            f"band_size ({band_size}) must divide n_hashes ({n_hashes})"
        )
    sh = docs.select(F.col(id_col).alias("did"), F.explode(shingles_col(k, text_col)).alias("s"))
    mins = [
        F.min(F.sha2(F.concat(F.lit(f"{i}:"), F.col("s")), 256)).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("did").agg(*mins)
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            sig.select("did", F.lit(b).alias("band"), F.concat(*cols).alias("bval"))
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    a, b2 = allb.alias("a"), allb.alias("b")
    pairs = (
        a.join(b2, on=["band", "bval"])
        .filter(F.col("a.did") < F.col("b.did"))
        .select(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 8,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs with an exact rational threshold
    (default 4/5 = 0.8): den*|A∩B| >= num*|A∪B| in integer arithmetic — no
    floating point, so the oracle matches bit-for-bit. Candidate generation
    = self-join on shared shingles (inverted index), verification on
    integer counts.

    ``max_df`` caps the posting-list length: shingles shared by more than
    ``max_df`` documents are dropped from the *join* (set sizes stay exact).
    Without the cap one stop-shingle shared by 10^6 docs makes 10^12 join
    pairs — the standard production prune (the same reason search engines
    drop stop-words from inverted indexes). Intersections lose the mass of
    the pruned shingles, so pairs that overlap ONLY on ultra-common
    shingles stop matching — which is the point: such overlap is not
    evidence of duplication. None disables the cap."""
    # Round-6 shape (guide §2.3/§2.4): ONE exchange over the exploded
    # (doc, shingle) pairs builds per-shingle posting lists; the df cap is
    # the list-size filter, and candidate pairs are generated in place from
    # each (sorted) list — the classic inverted-index pair walk, but
    # without a self-join, so the explode/shingle computation runs once
    # instead of once per join side, and no ``.distinct()`` shuffle
    # (``shingles_col`` is already array_distinct per doc, so (did, s)
    # pairs are unique by construction). Set sizes come from a map-only
    # ``size(shingles)`` projection (no second explode). Semantics are
    # bit-identical to the join formulation: same df counts (distinct docs
    # per shingle), same pair set (i<j over sorted posting lists ≡
    # a.did < b.did), same integer threshold. The per-list pair array is
    # bounded by C(max_df, 2), so the walk is safe at any corpus size;
    # ONLY the uncapped max_df=None mode keeps the old streaming self-join
    # (a posting array of an unbounded hot shingle would materialize its
    # whole pair set in one row).
    sh = docs.select(
        F.col(id_col).alias("did"), F.explode(shingles_col(k, text_col)).alias("s")
    )
    sizes = docs.select(
        F.col(id_col).alias("did"),
        F.size(shingles_col(k, text_col)).cast("long").alias("n"),
    )
    if max_df is None:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, on="s")
            .filter(F.col("a.did") < F.col("b.did"))
            .groupBy(F.col("a.did").alias("doc_a"), F.col("b.did").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        posting = (
            sh.groupBy("s")
            .agg(F.array_sort(F.collect_list("did")).alias("dids"))
            .filter((F.size("dids") >= 2) & (F.size("dids") <= max_df))
        )
        dids = F.col("dids")
        n = F.size(dids)
        # all ordered pairs (dids[i], dids[j]) with i<j over the sorted list
        pair_arr = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(1)),
                lambda i: F.transform(
                    F.slice(dids, i + F.lit(1), n),
                    lambda x: F.struct(
                        F.element_at(dids, i).alias("doc_a"), x.alias("doc_b")
                    ),
                ),
            )
        )
        inter = (
            posting.select(F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
    # a plain join: the planner broadcasts the map-only sizes projection at
    # bench scale (parquet size estimate) and falls back to a shuffle at
    # corpus sizes where a billion-doc broadcast would be fatal
    sa = sizes.select(F.col("did").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("did").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select("doc_a", "doc_b", "inter", "na", "nb")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    ``min_hits`` distinct k-token shingles with ANY document of an
    evaluation/benchmark set — the published n-gram-overlap protocol for
    training-set hygiene (GPT-3's appendix uses 13-gram collisions; The
    Pile and successors use the same shape). ``k`` defaults to that 13.

    Scale shape (100 TB corpus): the benchmark side is an eval suite —
    10^4–10^6 documents, at most a few million distinct shingles — so its
    shingle set BROADCASTS (``broadcast_benchmark``, on by default; flip
    off for an unusually large right side and the join degrades to a
    plain hash join on the shingle key). The corpus side is a stateless
    per-row shingle explode, joined against the broadcast set and
    re-aggregated on doc id: one shuffle, map-side combinable, no corpus
    self-join, no all-pairs term. Rows with zero benchmark overlap drop
    AT the join, so the output is O(contaminated docs), not O(corpus).

    Returns ``(id_col, hits, bench_docs)``: the number of distinct
    contaminated shingles and of distinct benchmark documents hit. No
    reference analog (the reference is a CDC engine); this is
    training-data-pipeline surface like the rest of this module."""
    sh = docs.select(
        F.col(id_col).alias("did"), F.explode(shingles_col(k, text_col)).alias("s")
    )
    bsh = benchmark.select(
        F.col(bench_id_col).alias("bid"),
        F.explode(shingles_col(k, bench_text_col)).alias("s"),
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    return (
        sh.join(bsh, on="s")
        .groupBy("did")
        .agg(
            F.count_distinct("s").alias("hits"),
            F.count_distinct("bid").alias("bench_docs"),
        )
        .filter(F.col("hits") >= min_hits)
        .select(F.col("did").alias(id_col), "hits", "bench_docs")
    )


# SimHash bit extraction from hex chars: bit j of a hex nibble c is set iff
# c is in the j-th character class below (pure string ops — engine-agnostic).
_NIBBLE_BIT = {
    3: list("89abcdef"),
    2: list("4567cdef"),
    1: list("2367abef"),
    0: list("13579bdf"),
}


def simhash_signatures(
    docs: DataFrame, bits: int = 16, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash over word tokens: each token votes ±1 per bit of
    sha256(token); signature bit = 1 iff the vote sum >= 0. Emitted as a
    16-char '0'/'1' string. Near-dups share signatures (or low Hamming
    distance — grouping by exact signature here).

    Zero-token docs (no [a-z0-9] runs) emit NO signature — the same
    opt-out-of-near-dup policy as the MinHash path (see ``shingles_col``):
    similarity over an empty token set is undefined, and a shared default
    signature would merge every such distinct doc into one cluster; exact
    dedup still groups identical content."""
    tok = docs.select(F.col(id_col).alias("did"), F.explode(tokens_col(text_col)).alias("t"))
    h = F.sha2(F.col("t"), 256)
    votes = []
    for b in range(bits):
        p = b // 4 + 1  # hex char position (1-based)
        cls = _NIBBLE_BIT[3 - (b % 4)]
        bit_set = F.substring(h, p, 1).isin(cls)
        votes.append(
            F.sum(F.when(bit_set, 1).otherwise(-1)).alias(f"v{b}")
        )
    agg = tok.groupBy("did").agg(*votes)
    sig = F.concat(
        *[F.when(F.col(f"v{b}") >= 0, F.lit("1")).otherwise(F.lit("0")) for b in range(bits)]
    )
    return agg.select("did", sig.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    bits: int = 16,
    band_bits: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup *pairs* via bit-band LSH: split the signature into
    bits/band_bits bands; docs sharing any exact band become candidates
    (pigeonhole: any pair within Hamming ≤ bands-1 shares a band); verify
    candidates by exact Hamming distance ≤ ``max_hamming``. Equi-join on
    short (band, value) keys — never all-pairs. Banding is one
    ``posexplode`` pass over the signature. Parameters are validated
    against the pigeonhole guarantee: recall is complete only when
    ``max_hamming <= n_bands - 1`` and the bands tile the signature."""
    if bits % band_bits != 0:
        raise ValueError(f"band_bits={band_bits} must divide bits={bits}")
    n_bands = bits // band_bits
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound "
            f"{n_bands - 1} for {n_bands} bands — pairs would be silently missed"
        )
    sig = simhash_signatures(docs, bits=bits, id_col=id_col, text_col=text_col)
    band_vals = F.array(
        *[F.substring("simhash", b * band_bits + 1, band_bits) for b in range(n_bands)]
    )
    bands = sig.select("did", "simhash", F.posexplode(band_vals).alias("band", "bval"))
    a, c = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(c, on=["band", "bval"])
        .filter(F.col("a.did") < F.col("b.did"))
        .select(
            F.col("a.did").alias("doc_a"),
            F.col("b.did").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    # Hamming over the '0'/'1' strings: count differing positions
    idx = F.sequence(F.lit(1), F.lit(bits))
    ham = F.aggregate(
        F.transform(
            idx,
            lambda i: (F.col("sig_a").substr(i, F.lit(1))
                       != F.col("sig_b").substr(i, F.lit(1))).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by min-label propagation with pointer doubling —
    the survivorship step after candidate dedup pairs (every production
    dedup ends with 'group transitive duplicates, keep one'). Each
    iteration (1) pulls the min neighbor label across edges and (2) jumps
    to the label's own label (pointer doubling), so label distance halves
    per round — genuinely O(log diameter) iterations, long chains included.
    All DataFrame ops; the loop is driver-side control flow over cached
    iterates, not data movement through the driver. Raises if the graph
    has not converged within ``max_iter`` (silently-wrong components would
    mark non-duplicates for deletion). Returns (node, component) where
    component = min node id reachable."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    try:
        converged = False
        for it in range(max_iter):
            # (1) min neighbor label across edges
            prop = (
                edges.join(labels, edges.src == labels.node)
                .select(F.col("dst").alias("node"), F.col("component"))
            )
            stepped = (
                labels.select("node", "component")
                .unionByName(prop)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            # (2) pointer doubling: follow component -> its own component
            lab2 = stepped.select(
                F.col("node").alias("pnode"), F.col("component").alias("pcomp")
            )
            new_labels = (
                stepped.join(lab2, stepped.component == lab2.pnode, "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce(F.col("pcomp"), F.col("component"))
                    ).alias("component"),
                )
            )
            if (it + 1) % 4 == 0:
                # truncate the logical plan: iterative self-referencing
                # lineage otherwise deepens every round and planning time
                # starts to dominate (the GraphFrames/Pregel checkpoint rule)
                new_labels = new_labels.localCheckpoint(eager=True)
            else:
                new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} iterations "
                "(component diameter too large) — raise max_iter"
            )
        # detach the result from the working cache so repeated calls in one
        # session don't strand persisted iterates (ContextCleaner reclaims
        # the checkpoint once the returned DataFrame is unreferenced)
        out = labels.localCheckpoint(eager=True)
        labels.unpersist()
        return out.select("node", "component")
    finally:
        edges.unpersist()


def verify_pairs_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    k: int = 8,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard verification of CANDIDATE pairs only (the verify half
    of LSH: band collisions are probabilistic, so unverified candidates
    must never drive deletions). Touches pairs × their docs' shingles —
    never all-pairs. Integer rational threshold, default 4/5."""
    sh = docs.select(
        F.col(id_col).alias("did"), F.explode(shingles_col(k, text_col)).alias("s")
    ).distinct()
    sizes = sh.groupBy("did").agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col("did").alias("doc_a"), "s")
    sh_b = sh.select(F.col("did").alias("doc_b"), "s")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("did").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("did").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select("doc_a", "doc_b")
    )


def canonical_representatives(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: DataFrame | None = None,
) -> DataFrame:
    """One document per DISTINCT content (the exact-dedup survivor).

    This is the canonicalize-before-LSH step: crawled corpora are dominated
    by exact-duplicate clusters, and a cluster of s identical docs shares
    every MinHash band — O(s²) candidate pairs, each paying a shingle-join
    verification. Running LSH over one representative per content hash
    caps that at O(distinct²); the exact groups rejoin the components
    through their (member → survivor) edges.

    ``exact``: a precomputed ``exact_dedup(docs)`` frame, so a caller that
    already has one (dedup_survivors) shares it instead of recomputing."""
    if exact is None:
        exact = exact_dedup(docs, id_col=id_col, text_col=text_col)
    reps = exact.select(F.col("survivor_id").alias(id_col))
    return docs.join(reps, on=id_col, how="semi")


def dedup_survivors(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """End-to-end dedup decision: exact-hash groups ∪ (MinHash-LSH
    candidates → exact-Jaccard VERIFIED pairs) → connected components →
    survivor = min id per component. Candidates are verified before they
    become edges: an unverified band collision would transitively mark a
    non-duplicate for deletion. Docs in no component survive as themselves.
    LSH runs over canonical representatives only (one per distinct
    content); exact-duplicate members reach the components via their
    (survivor, member) edges — same final components, without the O(s²)
    band collisions inside identical-doc clusters.
    Output: (doc_id, survivor_id, is_duplicate)."""
    exact = exact_dedup(docs, id_col=id_col, text_col=text_col)
    # exact groups become pairs (member, survivor) — already transitive.
    # The digest join must be NULL-safe: sha2(NULL text) is NULL, and
    # exact_dedup groups all NULL-text docs together, but a plain
    # equi-join on the digest never matches the NULL group — those dups
    # came back is_duplicate=False here while dedup_against_corpus marked
    # them, so the full and incremental paths disagreed (final review r5)
    ids = docs.select(F.col(id_col))
    h = F.sha2(F.col(text_col), 256)
    exact_pairs = (
        docs.select(F.col(id_col).alias("doc_b"), h.alias("content_sha"))
        .join(
            exact.filter(F.col("dup_count") > 1)
            .withColumnRenamed("content_sha", "_ex_sha"),
            F.col("content_sha").eqNullSafe(F.col("_ex_sha")),
        )
        .filter(F.col("doc_b") != F.col("survivor_id"))
        .select(F.col("survivor_id").alias("doc_a"), "doc_b")
    )
    reps = canonical_representatives(docs, id_col=id_col, text_col=text_col, exact=exact)
    candidates = minhash_lsh_candidates(reps, k=k, id_col=id_col, text_col=text_col)
    near_pairs = verify_pairs_jaccard(
        reps, candidates, k=k, id_col=id_col, text_col=text_col
    )
    all_pairs = exact_pairs.unionByName(near_pairs).distinct()
    comp = connected_components(all_pairs)
    out = ids.join(comp, ids[id_col] == comp.node, "left").select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("survivor_id"),
    )
    return out.withColumn("is_duplicate", (F.col(id_col) != F.col("survivor_id")))


def dedup_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: mark each BATCH document against the
    existing CORPUS plus the batch itself — the production shape when new
    data arrives through CDC/ingest and a full-corpus recompute per delta
    is off the table. A batch doc is a duplicate iff its sha256(text)
    already exists in the corpus (survivor = min corpus id for that
    digest) or an earlier batch doc shares it (survivor = min batch id).
    Corpus wins ties by construction: the corpus survivor, when present,
    is THE survivor — matching what ``exact_dedup`` over corpus ∪ batch
    would decide when corpus ids precede batch ids (the CDC case:
    monotone ids).

    Scale shape: the corpus side reduces to one (digest, min id) row per
    distinct content — a partial-aggregable groupBy the lake can maintain
    incrementally — and the join is digest-equi (Catalyst broadcasts the
    batch side when small, which it is per micro-batch). Nothing rescans
    corpus text; only digests move. Joins are NULL-SAFE on the digest:
    sha2(NULL) is NULL, and exact_dedup's groupBy puts all NULL-text
    docs in ONE group — a plain equi-join would instead leave them
    unmatched with NULL survivor/is_duplicate (review r5), silently
    vanishing from both the keep and the drop filter.

    Output: one row per batch doc —
    (id_col, content_sha, survivor_id, is_duplicate)."""
    h = F.sha2(F.col(text_col), 256)
    out = survivors_by_digest(
        batch.select(F.col(id_col), h.alias("content_sha")),
        corpus.select(h.alias("content_sha"), F.col(id_col)),
        id_col=id_col,
    )
    return out.withColumn("is_duplicate", F.col(id_col) != F.col("survivor_id"))


def content_digest(text_col: str = "text") -> "F.Column":
    """THE census identity digest — sha256 of the raw text column. One
    definition, because the census's correctness rests on the bootstrap
    census, incremental admission, and the persisted census rows all
    hashing the SAME function of text (final review r5: the expression
    was inlined at three pipeline sites, where one drifting edit would
    silently desynchronize admission from census state)."""
    return F.sha2(F.col(text_col), 256)


def survivors_by_digest(
    batch: DataFrame,
    corpus_digests: DataFrame,
    id_col: str = "doc_id",
    sha_col: str = "content_sha",
) -> DataFrame:
    """The first-arrival-wins survivor election over precomputed digests —
    the ONE place the rule lives (``dedup_against_corpus`` hashes text and
    calls this; ``incremental_corpus_update`` feeds its maintained census).

    ``batch`` is ``(id_col, sha_col)`` rows to elect; ``corpus_digests``
    is the standing ``(sha_col, id_col)`` census. A batch row's survivor
    is the min standing id for its digest when one exists, else the min
    batch id sharing the digest. Joins are NULL-SAFE on the digest (all
    null-content rows form one group); the corpus side reduces to one
    (digest, min id) row via a partial-aggregable groupBy and the join is
    digest-equi, batch side broadcastable.

    Output: batch columns + ``survivor_id``."""
    corpus_min = corpus_digests.groupBy(F.col(sha_col).alias("_csha")).agg(
        F.min(id_col).alias("_corpus_survivor")
    )
    batch_min = batch.groupBy(F.col(sha_col).alias("_bsha")).agg(
        F.min(id_col).alias("_batch_survivor")
    )
    return (
        batch.join(corpus_min, F.col(sha_col).eqNullSafe(F.col("_csha")), "left")
        .join(batch_min, F.col(sha_col).eqNullSafe(F.col("_bsha")), "left")
        .select(
            *[F.col(c) for c in batch.columns],
            F.coalesce(F.col("_corpus_survivor"), F.col("_batch_survivor"))
            .alias("survivor_id"),
        )
    )


def exact_substring_dedup(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", the ExactSubstr
    variant): any length-``k`` character window that occurs MORE THAN
    ONCE in the corpus — across documents or within one — is duplicated
    text; every occurrence except the corpus-first one (smallest
    ``(doc_id, pos)``) is cut out of its document. Overlapping and
    adjacent cut windows merge into maximal spans before removal, so a
    long duplicated passage is excised once as a whole, exactly like the
    paper's span semantics. The paper builds a corpus suffix array on one
    big-memory machine; this is the distributed equivalent — a
    rolling-window hash census — which finds the same duplicated windows
    (matches shorter than ``k`` are below the threshold in both).

    Scale shape: the exploded window table is O(total chars) rows but
    only (doc, pos, 2x64-bit hash) wide — the full text never leaves its
    map task (the substring/hash projection pipelines inside the scan
    stage). The census is one partial-aggregable shuffle on the hash
    pair (count + min(struct)); flagging is one equi-join back on the
    same key; span-merge and stitching are gaps-and-islands windows plus
    aggregations that ALL cluster by document id (one exchange serves
    the chain), with per-row state bounded by one span/piece — a
    heavily-duplicated 100 MB document streams through instead of
    materializing its flag positions as one array row. No suffix array,
    no cross-product, no driver state. Windows hash to a PAIR of
    independent xxhash64 values (keyed + unkeyed): at the 10^14-window
    design point a single 64-bit key would birthday-collide ~10^8 times
    (each a wrongful cut); the 128-bit pair bounds expected collisions
    below 10^-10.

    Output: one row per input document —
    (id_col, clean_text, n_chars_removed, n_dup_spans), NULL text pinned
    to '' (explode of an empty window set yields zero rows; the final
    left join restores the document)."""
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 would dedupe the alphabet)")
    base = docs.select(
        F.col(id_col).alias("did"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    wins = (
        base.where(F.length("_t") >= k)
        .select(
            "did",
            "_t",
            F.explode(
                F.sequence(F.lit(0).cast("long"), (F.length("_t") - k).cast("long"))
            ).alias("pos"),
        )
        .select(
            "did",
            "pos",
            F.xxhash64(F.expr(f"substring(_t, pos + 1, {k})")).alias("h1"),
            F.xxhash64(F.lit(1), F.expr(f"substring(_t, pos + 1, {k})")).alias("h2"),
        )
    )
    first = (
        wins.groupBy("h1", "h2")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct("did", "pos")).alias("_first"),
        )
        .where(F.col("_n") > 1)
        .select("h1", "h2", "_first")
    )
    flagged = (
        wins.join(first, ["h1", "h2"])
        .where(
            ~(
                (F.col("did") == F.col("_first.did"))
                & (F.col("pos") == F.col("_first.pos"))
            )
        )
        .select("did", "pos")
    )
    # merge flagged starts into maximal disjoint [s, e) spans via
    # gaps-and-islands windows, NOT a per-doc collect_list + fold: a
    # heavily duplicated giant document (the exact case ExactSubstr
    # targets) has up to one flagged start per character, and one array
    # row of all of them plus accumulator-copying lambdas is O(doc) row
    # size and O(n²) per-row CPU (review r5). Windows stream the same
    # computation: fixed-length windows over sorted starts have sorted
    # ends, so "pos - lag(pos) <= k" is the full overlap-or-adjacent
    # merge condition and the island id is a running sum of breaks. All
    # window/groupBy steps below cluster by did, so one exchange serves
    # the whole chain.
    from pyspark.sql import Window

    w_pos = Window.partitionBy("did").orderBy("pos")
    isl = flagged.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w_pos) <= k, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("_isl", F.sum("_new").over(w_pos))
    spans = isl.groupBy("did", "_isl").agg(
        F.min("pos").alias("s"), (F.max("pos") + k).alias("e")
    )
    stats = spans.groupBy("did").agg(
        F.count(F.lit(1)).alias("_nsp"),
        F.sum(F.col("e") - F.col("s")).alias("_nrm"),
        F.max("e").alias("_maxe"),
    )
    # kept text = the gaps between consecutive spans plus the tail past
    # the last span; each piece is one row (no giant per-doc array), the
    # final reassembly collects only the pieces that make up the OUTPUT
    w_span = Window.partitionBy("did").orderBy("s")
    gaps = spans.select(
        "did",
        F.coalesce(F.lag("e").over(w_span), F.lit(0).cast("long")).alias("b"),
        F.col("s").alias("t"),
    )
    tails = stats.select(
        "did", F.col("_maxe").alias("b"), F.lit(None).cast("long").alias("t")
    )
    pieces = (
        gaps.unionByName(tails)
        .join(base, "did")
        .select(
            "did",
            "b",
            F.col("_t")
            .substr(F.col("b") + 1, F.coalesce(F.col("t"), F.length("_t")) - F.col("b"))
            .alias("_piece"),
        )
    )
    asm = pieces.groupBy("did").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "_piece"))),
                lambda s: s["_piece"],
            ),
            "",
        ).alias("_clean")
    )
    merged = base.join(stats, "did", "left").join(asm, "did", "left")
    return merged.select(
        F.col("did").alias(id_col),
        F.when(F.col("_nsp").isNull(), F.col("_t"))
        .otherwise(F.coalesce(F.col("_clean"), F.lit("")))
        .alias("clean_text"),
        F.coalesce(F.col("_nrm"), F.lit(0)).cast("long").alias("n_chars_removed"),
        F.coalesce(F.col("_nsp"), F.lit(0)).cast("long").alias("n_dup_spans"),
    )
