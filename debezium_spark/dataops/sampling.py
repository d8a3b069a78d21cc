"""Deterministic corpus sampling and mixing.

Training-data pipelines rarely train on the raw corpus: they subsample
per source/language to hit a target mixture (temperature-scaled language
sampling is the published multilingual recipe — mBERT/XLM-R/mT5 all
sample language g with probability proportional to ``p_g ** alpha`` for
``alpha < 1``), and they carve deterministic train/holdout splits that
must stay stable across reruns and joins.

Everything here keys off ONE primitive: ``hash_fraction``, a
deterministic U(0,1) value per key derived from md5. That makes every
sample (a) reproducible run-over-run with no RNG state, (b) consistent
across tables — the same doc_id lands in the same split everywhere, and
(c) a pure per-row Catalyst filter: no shuffle, no sort, no sample()
nondeterminism under task retries (Spark's ``DataFrame.sample`` re-draws
on recompute; a lost executor can silently change the sample — the
hash filter cannot). At 100 TB each operator is a map-only scan except
``temperature_mix``'s group-count side, which aggregates to
O(n_groups) rows and broadcasts back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cap_per_group",
    "hash_fraction",
    "hash_split",
    "sample_by_rate",
    "temperature_mix",
]


def hash_fraction(col: Column) -> Column:
    """Deterministic U(0,1) per key: first 32 bits of md5(key-as-string),
    scaled by 2^32. md5 output is uniform on the hex prefix, and the
    expression is engine-portable (an ANSI oracle computes the identical
    value), unlike Spark's ``rand(seed)`` which is partition-dependent."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )


def sample_by_rate(
    docs: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic Bernoulli sample with a per-group keep rate: keep a
    row iff ``hash_fraction(id) < rates[group]``. Groups absent from
    ``rates`` fall back to ``default_rate`` (0.0 = drop, 1.0 = keep all).

    Map-only: the rate lookup is a literal map (O(1) per row at any group
    count) and the filter is a per-row expression — no shuffle, and the
    scan above it still prunes columns/partitions."""
    if not all(0.0 <= r <= 1.0 for r in rates.values()):
        raise ValueError("sample rates must be in [0, 1]")
    pairs = [F.lit(x) for kv in rates.items() for x in kv]
    rate = (
        F.coalesce(
            F.element_at(F.create_map(*pairs), F.col(group_col)),
            F.lit(float(default_rate)),
        )
        if pairs
        else F.lit(float(default_rate))
    )
    return docs.where(hash_fraction(F.col(id_col)) < rate)


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.7,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled mixing: resample so group g's share follows
    ``p_g ** alpha`` (renormalized), the multilingual-pretraining recipe.
    ``alpha = 1`` keeps the natural distribution; ``alpha -> 0``
    approaches uniform over groups.

    Per-group keep rate: ``r_g = (p_g / p_min) ** (alpha - 1)`` — the
    smallest group keeps everything (r = 1, subsampling can only DROP
    rows, never upsample) and larger groups are thinned toward the target
    share. Rows are then kept by the deterministic ``hash_fraction``
    Bernoulli, so reruns and retries select the identical rows.

    Shape at scale: one partial-agg groupBy to O(n_groups) counts, a
    scalar min over those, and a broadcast join back — the corpus itself
    is never shuffled."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    min_n = counts.agg(F.min("_n").alias("_min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        F.col(group_col).alias("_mix_g"),
        F.pow(F.col("_n") / F.col("_min_n"), F.lit(alpha - 1.0)).alias("_rate"),
    )
    # null-safe join: groupBy counts the NULL group and computes its rate,
    # so the join back must match it too — a plain equi-join would drop
    # every NULL-group doc entirely instead of sampling it (final review r5)
    return (
        docs.join(
            F.broadcast(rates), F.col(group_col).eqNullSafe(F.col("_mix_g"))
        )
        .where(hash_fraction(F.col(id_col)) < F.col("_rate"))
        .drop("_mix_g", "_rate")
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split: assign each row a split label by where
    its ``hash_fraction`` lands in the cumulative weight intervals, e.g.
    ``{"train": 0.98, "val": 0.01, "test": 0.01}``. Weights must sum to
    1 (±1e-9). Interval order follows dict insertion order, so the same
    weights always produce the same assignment. Map-only, join-stable:
    the same id is in the same split in every table it appears in."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    frac = hash_fraction(F.col(id_col))
    expr = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        case = F.when(frac < F.lit(upper), F.lit(name))
        expr = case if expr is None else expr.when(frac < F.lit(upper), F.lit(name))
    # the last interval is the catch-all: hash_fraction < 1.0 always, and
    # an explicit otherwise absorbs any float-edge residue at the seam
    last = F.lit(names[-1])
    return docs.withColumn(
        split_col, last if expr is None else expr.otherwise(last)
    )


def cap_per_group(
    docs: DataFrame,
    n: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact deterministic cap: keep at most ``n`` documents per group
    (the Common-Crawl-recipe "max docs per domain" rule), chosen by
    md5-hash order with id tie-break — reproducible run-over-run, and
    unbiased because the hash order is independent of any data column.

    Scale shape — distributed selection, NOT a per-group sort: ranking a
    whole group with ``row_number`` would hash-partition every row of a
    hot domain into ONE task and sort it there. Instead the first hash
    byte pre-buckets each group into 256 ordered slices; an O(groups ×
    256) count table (aggregated, then broadcast back) decides per
    slice: fully below the cap → keep all rows WITHOUT sorting, fully
    above → drop without sorting, and exactly ONE boundary slice per
    group gets a real ``row_number`` over ~1/256 of the group's rows.
    Because the bucket is a prefix of the hash, (bucket, hash, id) order
    equals (hash, id) order, so the kept set is exactly the global
    top-``n`` per group by (md5(id), id) — which is what a plain
    windowed oracle computes.

    Output: the surviving rows with their original schema."""
    if n < 0:
        raise ValueError("n must be >= 0")
    g, i = F.col(group_col), F.col(id_col)
    h = F.md5(i.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    tagged = docs.withColumn("_h", h).withColumn("_b", bucket)
    counts = tagged.groupBy(group_col, "_b").agg(F.count(F.lit(1)).alias("_cnt"))
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    decisions = counts.withColumn(
        "_before", F.sum("_cnt").over(w_cum) - F.col("_cnt")
    ).select(
        F.col(group_col).alias("_cap_g"),
        F.col("_b").alias("_cap_b"),
        F.when(F.col("_before") + F.col("_cnt") <= n, F.lit(None).cast("long"))
        .when(F.col("_before") >= n, F.lit(0).cast("long"))
        .otherwise((F.lit(n) - F.col("_before")).cast("long"))
        .alias("_quota"),  # NULL = keep whole slice (no sort), 0 = drop slice
    )
    # null-safe join: a NULL group (or NULL id → NULL bucket) is counted
    # by the groupBy and must be CAPPED like any other slice — a plain
    # equi-join silently deleted the whole NULL group (final review r5)
    joined = tagged.join(
        F.broadcast(decisions),
        F.col(group_col).eqNullSafe(F.col("_cap_g"))
        & F.col("_b").eqNullSafe(F.col("_cap_b")),
    ).drop("_cap_g", "_cap_b")
    whole = joined.where(F.col("_quota").isNull())
    partial = joined.where(F.col("_quota") > 0)
    w_rank = Window.partitionBy(group_col, "_b").orderBy("_h", id_col)
    ranked = partial.withColumn("_rn", F.row_number().over(w_rank)).where(
        F.col("_rn") <= F.col("_quota")
    )
    drop = ["_h", "_b", "_quota"]
    return whole.drop(*drop).unionByName(ranked.drop(*drop, "_rn"))
