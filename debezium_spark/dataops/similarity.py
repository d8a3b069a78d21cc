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


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


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
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def bucketed_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only the query's coarse bucket. Approximate by
    construction (recall < 1 when true neighbors live in other buckets);
    the candidate set shrinks by ~n_buckets×, and the join is a broadcast
    hash join on the bucket key — the shape that survives 100×."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(bucket_col).alias("b"),
    )
    c = embeddings.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), F.col(bucket_col).alias("b")
    )
    scored = (
        F.broadcast(q)
        .join(c, on="b")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    min_round_sim: float = 0.0,
) -> DataFrame:
    """Blocked pairwise cosine (a<b within a block), rounded to 2dp. Emitting
    the rounded score instead of thresholding keeps the result set exactly
    reproducible; callers filter at whatever cut they need."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col(block_col).alias("b")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col(block_col).alias("b")
    )
    return (
        a.join(b, on="b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # +0.0 canonicalizes IEEE -0.0 → 0.0 (engines render them apart)
            (F.round(cosine(F.col("va"), F.col("vb")), 2) + F.lit(0.0)).alias("cos2"),
        )
        .filter(F.col("cos2") >= min_round_sim)
    )
