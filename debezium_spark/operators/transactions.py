"""Transaction metadata — the reference's TransactionMonitor
(``pipeline/txmetadata/TransactionMonitor.java:35-63,157-180``): BEGIN/END
metadata records carrying event_count and per-collection counts, plus the
per-event ``transaction{id,total_order,data_collection_order}`` block the
envelope already carries.

Under micro-batch MERGE the logical-clock parallel replay of the reference
(``sink/object/Transaction.java:152-154``) is obsolete — the lake commit is
the transaction — so this operator exists for parity of the *metadata
stream*: one summary row per source transaction per batch."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transaction_summary(env: DataFrame) -> DataFrame:
    """One END-style record per transaction: id, event_count, first/last
    offset, distinct collections touched."""
    return (
        env.filter(F.col("transaction").isNotNull())
        .groupBy(F.col("transaction.id").alias("tx_id"))
        .agg(
            F.count("*").alias("event_count"),
            F.min("source.pos").alias("first_pos"),
            F.max("source.pos").alias("last_pos"),
            F.countDistinct(
                F.concat_ws(".", F.col("source.db"), F.col("source.table"))
            ).alias("data_collections"),
        )
    )


def stamp_transaction(env: DataFrame, tx_size: int) -> DataFrame:
    """Stamp/repair the per-event transaction block from offsets (used when a
    source lacks tx framing): id = pos div tx_size, orders = pos mod.

    Deriving the id from ``pos`` alone is sound ONLY under the repo's
    offset-order contract (``schema.py``): ``pos`` is monotone ACROSS files
    within a stream (LSN semantics), so two files never reuse a pos. A
    source with per-file positions must flatten them to a stream-monotone
    pos before this stamp (same note as the contract), or file-A and
    file-B events would collide into one synthetic transaction."""
    pos = F.col("source.pos")
    # exact integer division via decimal — `long / int` in Spark is a DOUBLE
    # divide, which loses exactness above 2^53 and stamps the tail event of
    # a transaction into the next one (same rule as typeconv's ns handling)
    p = pos.cast("decimal(38,0)")
    tx_id = ((p - F.pmod(p, F.lit(tx_size))) / F.lit(tx_size)).cast("long")
    return env.withColumn(
        "transaction",
        F.struct(
            F.concat(F.lit("tx-"), tx_id.cast("string")).alias("id"),
            F.pmod(pos, F.lit(tx_size)).alias("total_order"),
            F.pmod(pos, F.lit(tx_size)).alias("data_collection_order"),
        ),
    )
