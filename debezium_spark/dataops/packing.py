"""Sequence packing: lay documents end-to-end into fixed-length training
sequences (the GPT-style "concatenate then chunk every seq_len tokens"
pretraining layout) and report, per document, where it lands.

The core problem is an exact GLOBAL prefix sum over per-document token
counts under a deterministic total order. The naive expression — one
window over the whole corpus — collapses to a single partition and dies
at scale. This implements the classic two-phase distributed prefix sum
instead:

1. bucket each doc by a hash of its id (deterministic, uniform);
2. within each bucket, an ordinary partitioned window computes the
   running token offset (parallel across buckets, one shuffle);
3. bucket TOTALS aggregate to O(n_buckets) rows; an exclusive cumsum
   over those (tiny, driver-scale) yields each bucket's global base
   offset, broadcast-joined back.

global_start(doc) = bucket_base + within-bucket running sum. The total
order is (bucket, hash_fraction, id) — fully deterministic, so reruns
produce byte-identical packings (an RNG shuffle would not), and an
ANSI-SQL oracle can reproduce it with a plain global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from debezium_spark.dataops.sampling import hash_fraction

__all__ = ["pack_sequences"]


def _hash_bucket(col: Column, n_buckets: int) -> Column:
    """First 32 md5 bits mod n_buckets — same uniform source as
    hash_fraction, so bucket and within-bucket order never disagree
    between engines."""
    return F.pmod(
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(n_buckets),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document its packed position: global token offset and
    the range of fixed-length sequences it spans.

    Output columns: ``id_col``, ``n_tokens`` (long), ``global_start``
    (long, 0-based token offset in the concatenated stream), ``first_seq``
    / ``last_seq`` (long sequence ids of size ``seq_len``), ``n_seqs``
    (how many sequences the doc touches — >1 means it straddles a chunk
    boundary, the GPT packing norm). Zero-token documents are dropped
    (they occupy no position in the stream).

    Shape at scale: ONE shuffle (repartition by hash bucket for the
    window), one partial agg to ``n_buckets`` rows, and a broadcast join
    back — no global-order single-partition window, no driver collect.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    ident = F.col(id_col)
    toks = F.col(tokens_col).cast("long")
    base = (
        docs.where(toks > 0)
        .select(
            ident.alias(id_col),
            toks.alias("n_tokens"),
            _hash_bucket(ident, n_buckets).alias("_b"),
            hash_fraction(ident).alias("_frac"),
        )
    )
    # phase 1+2: per-bucket running sum under the deterministic order;
    # exclusive (start-of-doc) via rowsBetween(..., -1)
    w = (
        Window.partitionBy("_b")
        .orderBy("_frac", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn(
        "_within", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # phase 3: bucket totals → exclusive cumsum over O(n_buckets) rows
    totals = base.groupBy("_b").agg(F.sum("n_tokens").alias("_btot"))
    wt = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_btot").over(wt), F.lit(0)).alias("_base")
    )
    out = within.join(F.broadcast(offsets), "_b")
    start = F.col("_base") + F.col("_within")

    # exact integer division via decimal — `long / int` in Spark is a
    # DOUBLE divide, losing exactness above 2^53 total tokens and
    # assigning boundary documents to the wrong sequence id at the
    # module's advertised 100 TB scale (the same rule transactions.py
    # implements for tx ids; final review r5)
    def _idiv(col, d):
        c = col.cast("decimal(38,0)")
        return ((c - F.pmod(c, F.lit(d))) / F.lit(d)).cast("long")

    first = _idiv(start, seq_len)
    last = _idiv(start + F.col("n_tokens") - 1, seq_len)
    return out.select(
        id_col,
        "n_tokens",
        start.alias("global_start"),
        first.cast("long").alias("first_seq"),
        last.cast("long").alias("last_seq"),
        (last - first + 1).cast("long").alias("n_seqs"),
    )
