"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k baseline — broadcast the (small)
  query set against the corpus; dot products via zip_with/aggregate in the
  JVM (no Python). At 100 TB this is the per-query-batch scan path.
- ``bucketed_ann_topk``: the scale path — an IVF-style coarse partitioner
  restricts each query to its bucket(s), turning the scan into a
  bucket-pruned join. Here the coarse quantizer is the precomputed ``label``
  column (stand-in for a k-means assignment, which would be one Spark job);
  at 1000 executors each bucket is a co-partitioned shard.
- ``embedding_near_duplicates``: blocked pairwise cosine for near-dup
  detection (block = label), avoiding the full n² cross join.

Floating point: elements are cast to double before multiply/sum, matching
DuckDB's list_cosine_similarity; final scores are rounded before any
threshold/ordering so engine-level summation differences can't flip results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _guarded_cosine(a_vec, b_vec, denom):
    """Dot/denom with the zero-norm null guard, over HOISTED norms (every
    caller precomputes per-row norms before its join so the pair-side work
    is just the dot product — the guard lives here once so the NaN rule
    can't drift between call sites; review r5). Null for zero-norm inputs:
    0/0 is IEEE NaN, and Spark sorts NaN ABOVE every real value — an
    unguarded zero vector would rank as the #1 neighbor of every query and
    pass >= thresholds."""
    return F.when(denom != 0, _dot(a_vec, b_vec) / denom)


def cosine(a, b):
    """Cosine similarity of two vector columns (self-contained form: norms
    computed inline — use ``_guarded_cosine`` with hoisted norms inside
    joins). Null for zero-norm inputs — see ``_guarded_cosine``."""
    return _guarded_cosine(a, b, _norm(a) * _norm(b))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k tail of every ANN path: rank (q_id, n_id, cos_sim)
    candidates per query by rounded cosine desc with n_id tie-break —
    one place, so the three ANN variants cannot drift on the tie rule."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        # a NULL score is a zero-norm candidate the cosine guard excluded
        # from ranking — it must not re-enter as a trailing "neighbor"
        # when the candidate pool is smaller than k (final review r5)
        scored.filter(F.col("cos_sim").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id (queries drawn from the
    corpus). Broadcast the query side; rank by rounded cosine with id
    tie-break for full determinism."""
    # norms are per-ROW: compute them once per side before the join, not
    # once per pair inside it (the pair-side work drops to the dot product)
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_n"),
    )
    c = embeddings.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_n"),
    )
    denom = F.col("q_n") * F.col("n_n")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _guarded_cosine(F.col("q_vec"), F.col("n_vec"), denom), 6
            ).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k)


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Deterministic Lloyd k-means for the IVF coarse quantizer →
    (cid, cvec array<double>).

    Init: centroid j = element-wise mean of the vectors with
    ``id % n_cells == j`` (seeded by the stable id, not randomness — the
    generator rule of this repo). Each Lloyd iteration assigns every vector
    to its nearest centroid (squared L2, rounded, id tie-break) and
    re-averages. Centroid components round to ``round_dp`` so assignments
    reproduce bit-for-bit across engines and partitionings (the mean is the
    only cross-partition float reduction; rounding absorbs its ±1 ulp).

    Scale shape: the element-wise mean is posexplode → partial-aggregated
    avg per (cell, dim) → re-assembled — two narrow shuffles per iteration;
    assignment is a broadcast join against k rows. No driver-side loops
    over data."""
    e = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))

    def avg_by(assigned: DataFrame) -> DataFrame:
        per_dim = (
            assigned.select("cid", F.posexplode("v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), round_dp).alias("c"))
        )
        return per_dim.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("cvec")
        )

    cents = avg_by(e.withColumn("cid", F.pmod(F.col("vid"), F.lit(n_cells))))
    for _ in range(iters):
        assigned = assign_cells(
            e.select(F.col("vid"), F.col("v")), cents, id_col="vid", vec_col="v"
        ).withColumnRenamed("cell", "cid")
        cents = avg_by(assigned)
    return cents


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    with_dist: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment (nprobe=1) or the nprobe nearest cells
    per row (multi-probe, for the query side). Distances round to 6dp with
    centroid-id tie-break — fully deterministic. Broadcast join: k rows.
    ``with_dist`` (nprobe=1 only) also emits the rounded squared distance
    to the chosen centroid as ``cell_dist`` — callers that need it
    (semantic_dedup's exemplar rule) would otherwise re-join against the
    centroids and recompute the fold the aggregation already evaluated.

    ``id_col`` must be UNIQUE: the nprobe=1 groupBy collapses duplicate
    ids to one row (one cell per vector is the aggregation key), so a
    corpus with repeated ids silently loses the extra vectors here while
    brute_force_topk would still see them — dedupe upstream.

    nprobe=1 (the corpus side — the big one) aggregates with ``min_by``
    over the k candidate cells: partial-aggregable, map-side combined, no
    window sort of n·k rows. Multi-probe (query side, small) keeps the
    row_number window."""
    scored = df.crossJoin(F.broadcast(centroids)).select(
        "*", F.round(_sq_dist(F.col(vec_col), F.col("cvec")), 6).alias("_d")
    )
    if nprobe == 1:
        row = F.struct(*[F.col(c) for c in df.columns], F.col("cid"), F.col("_d"))
        best = (
            scored.groupBy(id_col)
            .agg(F.min_by(row, F.struct(F.col("_d"), F.col("cid"))).alias("_r"))
        )
        extra = [F.col("_r._d").alias("cell_dist")] if with_dist else []
        return best.select(
            *[F.col(f"_r.{c}").alias(c) for c in df.columns if c != id_col],
            F.col(id_col),
            F.col("_r.cid").alias("cell"),
            *extra,
        ).select(*df.columns, "cell", *(["cell_dist"] if with_dist else []))
    if with_dist:
        raise ValueError("with_dist is only defined for nprobe=1 (one cell per row)")
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.asc("_d"), F.asc("cid"))
    ranked = scored.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= nprobe)
    return ranked.select(*df.columns, F.col("cid").alias("cell"))


def bucketed_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    kmeans_iters: int = 0,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN with a real coarse quantizer: k-means cells computed from the
    data (``kmeans_centroids``), corpus vectors assigned to their nearest
    cell, queries probing their ``nprobe`` nearest cells. Approximate by
    construction (recall < 1 when true neighbors live outside the probed
    cells; raise nprobe to trade cost for recall); the candidate set
    shrinks ~n_cells/nprobe ×, and the join is an equi-join on the cell id
    — the shape that survives 100×. At cluster scale the corpus assignment
    is computed once and persisted (cells are the partition key)."""
    cents = kmeans_centroids(
        embeddings, n_cells=n_cells, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    corpus = assign_cells(
        embeddings.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")),
        cents, id_col="n_id", vec_col="n_vec",
    )
    queries = assign_cells(
        embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ),
        cents, id_col="q_id", vec_col="q_vec", nprobe=nprobe,
    )
    # per-row norms before the join (pair-side work = dot product only)
    corpus = corpus.withColumn("n_n", _norm(F.col("n_vec")))
    queries = queries.withColumn("q_n", _norm(F.col("q_vec")))
    denom = F.col("q_n") * F.col("n_n")
    scored = (
        F.broadcast(queries)
        .join(corpus, on="cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _guarded_cosine(F.col("q_vec"), F.col("n_vec"), denom), 6
            ).alias("cos_sim"),
        )
        # no dedupe needed: corpus vectors carry exactly ONE cell
        # (assign_cells nprobe=1), so a (q_id, n_id) pair appears at most
        # once however many cells the query probes — a distinct() here was
        # a full extra shuffle for zero effect (review r4)
    )
    return _rank_topk(scored, k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    min_round_sim: float = 0.0,
    max_block_size: int | None = 10_000,
    round_dp: int = 2,
) -> DataFrame:
    """Blocked pairwise cosine (a<b within a block), rounded to ``round_dp``
    decimals (default 2 — the historical "cos2" contract). Emitting the
    rounded score instead of thresholding keeps the result set exactly
    reproducible; callers filter at whatever cut they need.

    ``max_block_size`` bounds the quadratic term: a block of size s is
    deterministically sub-blocked into ceil(s/max) shards by id hash, and
    pairs form only within a shard — per-block work drops from O(s²) to
    O(s·max). Recall loss is the cross-shard pairs; at 100 TB an unbounded
    hot block (one dominant cluster) is otherwise a single-task n² bomb —
    so the cap is ON by default (10k); pass None to opt into exact
    within-block semantics when blocks are known small/balanced."""
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(block_col).alias("b")
    )
    if max_block_size is not None:
        sizes = e.groupBy("b").agg(F.count("*").alias("_n"))
        shards = F.greatest(F.lit(1), F.ceil(F.col("_n") / max_block_size)).cast("long")
        e = e.join(F.broadcast(sizes), on="b").withColumn(
            "b", F.concat(F.col("b").cast("string"), F.lit("#"),
                          F.pmod(F.xxhash64(F.col("id")), shards).cast("string"))
        ).drop("_n")
    # per-row norms before the O(s²) join — norms are per-row, not per-pair
    e = e.withColumn("_n", _norm(F.col("v")))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("_n").alias("na"), "b")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("_n").alias("nb"), "b")
    denom = F.col("na") * F.col("nb")
    return (
        a.join(b, on="b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # +0.0 canonicalizes IEEE -0.0 → 0.0 (engines render them apart)
            (
                F.round(
                    _guarded_cosine(F.col("va"), F.col("vb"), denom), round_dp
                ) + F.lit(0.0)
            ).alias("cos2"),
        )
        .filter(F.col("cos2") >= min_round_sim)
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_cells: int = 8,
    kmeans_iters: int = 0,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the IVF coarse
    quantizer (``kmeans_centroids`` — deterministic, id-seeded), compute
    pairwise cosine ONLY within a cluster, connect pairs with rounded
    cosine >= ``threshold`` into components, and keep one exemplar per
    component. Following the paper's rule ("keep the examples with the
    lowest cosine similarity to the cluster centroid"), the survivor is
    the component member FARTHEST from its centroid (max rounded squared
    L2), id-ascending tie-break — fully deterministic, so an ANSI oracle
    reproduces the decision bit-for-bit.

    Scale shape: clustering is the kmeans/assign machinery (posexplode
    partial-agg means + broadcast-k assignment); the quadratic term is
    confined to within-cell pairs and bounded by ``max_cell_size``
    (hash sub-sharding via ``embedding_near_duplicates`` — a dominant
    cluster cannot become a single-task n² bomb); survivorship is the
    O(log diameter) pointer-doubling ``connected_components``. Nothing
    touches the driver except the CC loop's control flow.

    Output: one row per input vector —
    (id_col, cell, survivor_id, is_duplicate)."""
    from debezium_spark.dataops.dedup import connected_components

    cents = kmeans_centroids(
        embeddings, n_cells=n_cells, iters=kmeans_iters,
        id_col=id_col, vec_col=vec_col,
    )
    # distance-to-own-centroid (the paper's exemplar criterion) rides out
    # of the assignment itself (with_dist) — rounded 6dp like every
    # cross-engine float, and no re-join/recompute against the centroids
    members = assign_cells(
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        cents, id_col="id", vec_col="v", with_dist=True,
    ).withColumnRenamed("cell_dist", "cdist")
    pairs = embedding_near_duplicates(
        members, id_col="id", vec_col="v", block_col="cell",
        min_round_sim=threshold, max_block_size=max_cell_size, round_dp=6,
    )
    comp = connected_components(pairs, a_col="id_a", b_col="id_b")
    # survivor per component = max (cdist, -id): farthest from centroid,
    # then lowest id — one partial-aggregable max_by, no window sort
    surv = (
        members.join(comp, members.id == comp.node)
        .groupBy("component")
        .agg(
            F.max_by(
                F.col("id"), F.struct(F.col("cdist"), (-F.col("id")).alias("negid"))
            ).alias("survivor")
        )
    )
    out = (
        members.join(comp, members.id == comp.node, "left")
        .join(surv, on="component", how="left")
        .select(
            F.col("id").alias(id_col),
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("survivor"), F.col("id")).alias("survivor_id"),
        )
    )
    return out.withColumn("is_duplicate", F.col(id_col) != F.col("survivor_id"))


def srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes: component
    (i, j) = md5-fraction of "i:j" scaled to U(-1, 1) — the same
    engine-portable md5 construction as ``dataops.sampling.hash_fraction``
    (first 32 md5 bits / 2^32 is IEEE-exact in any engine), so an ANSI
    oracle regenerates the identical planes from the formula alone. No
    RNG state, no seed to ship: the (plane, dim) index IS the seed."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
            / float(1 << 32) * 2.0 - 1.0
            for j in range(dim)
        ]
        for i in range(n_planes)
    ]


def srp_signature(vec, planes: list[list[float]]):
    """SRP-LSH signature of a vector column: bit i = sign of the dot
    product with plane i (Charikar 2002 — P[bits agree] = 1 - angle/pi,
    the cosine-LSH family). Returns a '0'/'1' string column of
    len(planes) bits. Plane weights ride as literal arrays (computed once
    on the driver, O(planes x dim), no data touched); each bit is one
    in-order zip_with fold — pure Catalyst, no shuffle. Dots round to 6dp
    before the sign so cross-engine summation-order ulps cannot flip a
    bit (the repo-wide rounding rule)."""
    bits = [
        F.when(
            F.round(
                _dot(vec, F.array(*[F.lit(w) for w in p])), 6
            ) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 12,
    hamming_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN — the hash-partitioned alternative to the IVF path
    (``bucketed_ann_topk``): corpus vectors bucket by their ``n_planes``-bit
    SRP signature; each query probes its own bucket plus every bucket
    within Hamming distance ``hamming_probe`` (0 disables multi-probe; 1
    flips each bit once -> n_planes+1 probe signatures). Candidates come
    from a signature equi-join — never an all-pairs scan — then exact
    rounded cosine ranks top-k with id tie-break.

    Approximate by construction: recall < 1 when a true neighbor's
    signature differs in more bits than the probe radius. The radius is
    capped at 1 (radius r costs C(n_planes, <=r) probe signatures per
    query — combinatorial); to trade cost for recall, LOWER ``n_planes``
    (coarser buckets hold more candidates) instead.
    Scale shape: signatures are a per-row map (no shuffle), the bucket
    join is an equi-join on a <=64-char key, the query side is
    |queries| x (n_planes+1) rows and broadcasts. Unlike IVF there is no
    training pass at all — the quantizer is the formula."""
    if hamming_probe not in (0, 1):
        raise ValueError("hamming_probe must be 0 or 1 (wider probing explodes: C(n,2)+ signatures)")
    if dim is None:
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty corpus; pass dim=")
        dim = first["d"]
    planes = srp_planes(n_planes, dim)
    corpus = embeddings.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_n"),
        srp_signature(F.col(vec_col), planes).alias("sig"),
    )
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_n"),
        srp_signature(F.col(vec_col), planes).alias("qsig"),
    )
    if hamming_probe == 1:
        # own signature + each single-bit flip, via explode(0..n_planes)
        flip = F.concat(
            F.substring(F.col("qsig"), 1, F.col("p") - 1),
            F.when(
                F.substring(F.col("qsig"), F.col("p"), 1) == "1", F.lit("0")
            ).otherwise(F.lit("1")),
            F.substring(F.col("qsig"), F.col("p") + 1, n_planes),
        )
        q = q.withColumn(
            "p", F.explode(F.sequence(F.lit(0), F.lit(n_planes)))
        ).select(
            "q_id", "q_vec", "q_n",
            F.when(F.col("p") == 0, F.col("qsig")).otherwise(flip).alias("sig"),
        )
    else:
        q = q.select("q_id", "q_vec", "q_n", F.col("qsig").alias("sig"))
    denom = F.col("q_n") * F.col("n_n")
    scored = (
        F.broadcast(q)
        .join(corpus, on="sig")
        .filter(F.col("q_id") != F.col("n_id"))
        # a (q, n) pair appears once: probe signatures are pairwise
        # distinct (self + single-bit flips) and the corpus row has ONE
        # signature — no dedupe shuffle needed (the IVF-path argument)
        .select(
            "q_id",
            "n_id",
            F.round(
                _guarded_cosine(F.col("q_vec"), F.col("n_vec"), denom), 6
            ).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k)


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    proj_col: str = "proj",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: dim -> ``out_dim`` via the
    same md5-fraction plane matrix as the SRP-LSH signatures
    (``srp_planes``), scaled by sqrt(3/out_dim) so expected squared
    distances are preserved: U(-1,1) entries have variance 1/3, and the
    JL estimator needs unit-variance rows / sqrt(out_dim) — i.e.
    E[||Rx||^2] = (out_dim * Var) * s^2 * ||x||^2 = ||x||^2 exactly when
    s = sqrt(3/out_dim) (review r5: the 1/sqrt(out_dim) draft shrank
    expected norms 3x). Deterministic and engine-portable: an ANSI oracle
    regenerates the matrix from the formula — no RNG state, no matrix to
    ship. The published use is cheap embedding compression before
    storage/ANN (JL lemma: n points embed into O(log n / eps^2) dims
    with (1 +- eps) distance distortion).

    Scale shape: a per-row map — out_dim in-order zip_with folds against
    literal weight arrays, no shuffle, no UDF; column pruning still
    reaches the scan. Replaces (id, float[dim]) with (id, double[out_dim])
    — at 100 TB the projection IS the bandwidth win."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    if dim is None:
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty corpus; pass dim=")
        dim = first["d"]
    planes = srp_planes(out_dim, dim)
    s = (3.0 / float(out_dim)) ** 0.5
    comps = [
        (_dot(F.col(vec_col), F.array(*[F.lit(w) for w in p])) * F.lit(s))
        for p in planes
    ]
    return embeddings.select(
        F.col(id_col), F.array(*comps).alias(proj_col)
    )
