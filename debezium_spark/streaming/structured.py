"""Structured Streaming ingestion mode.

The micro-batch driver loop in ``streaming.engine`` is the deterministic
replay path (batch boundaries fixed at write time). This module is the
always-on tail path: ``spark.readStream`` over the ordered event-batch
directory → ``foreachBatch`` → the same fenced merge. It plays the role of
the reference's continuously running streaming sources + sink task
(``MySqlStreamingChangeEventSource.java:330-343`` dispatch loop;
``sink/task/MysqlSinkConnectorTask.java:66-81`` put →
``TableReplayTask.batchWrite``), with Spark supplying what the reference
hand-builds:

- the bounded queue + backpressure (``ChangeEventQueue.java:194-216``) →
  ``maxFilesPerTrigger`` / trigger pacing;
- the Kafka offset store (``EmbeddedEngine.java:105-149``) → the streaming
  checkpointLocation, *plus* our table-side fence — so exactly-once holds
  even if the checkpoint is lost: a replayed micro-batch whose max offset is
  behind the fence is a no-op (the fence rides the Iceberg-style commit).

Two independent exactly-once layers (checkpoint dedupe at the source, fence
at the sink) mirror the reference's breakpoint ledger + isExistSql read-back
(``TableReplayTask.java:351-399``) but need no read-back because the fence
commit is atomic with the data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from debezium_spark.schema import envelope_schema
from debezium_spark.streaming.engine import CdcEngine
from debezium_spark.streaming.multi import WIRE_SCHEMA, MultiTableEngine


def stream_replay(
    spark: SparkSession,
    engine: CdcEngine,
    batch_dir: str,
    checkpoint_dir: str,
    payload_schema=None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Tail ``batch_dir`` as a file stream and apply each micro-batch through
    the engine's fenced merge. Returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the directory and
    stops (the batch-replay-as-stream mode used in tests and backfills);
    ``False`` runs until ``query.stop()`` — the production tail.

    **Flush contract (tx alignment is ON by default)**: the final epoch's
    open tail transaction is DEFERRED to the engine's persisted carry — a
    drained stream has applied everything EXCEPT that tail. Call
    ``engine.flush_tx_carry()`` once the log is known complete (end of a
    binlog = every transaction in it committed), or use ``drain(query,
    engine)`` which awaits termination and flushes in one step. A reader
    before the flush sees a consistent-but-older state (whole transactions
    only) — never a partial transaction.

    Ordering contract: each ``batch_NNNNN.parquet`` directory must appear
    atomically (write elsewhere, rename in) and in offset order — then every
    trigger sees only whole batches and epochs are offset-monotone, which is
    what makes the engine's last-wins dedupe + fence equivalent to
    sequential apply (SURVEY §7.4 deterministic batch boundaries). Do NOT
    set ``max_files_per_trigger`` below the part-file count of one batch:
    a split batch breaks whole-batch atomicity (the per-key pos ordering
    inside the engine still protects upsert ordering, but a replayed prefix
    after a crash would commit a fence mid-batch).
    """
    # payload_schema is the *payload* StructType; the reader schema is the
    # envelope built from it (passing a payload verbatim would silently null
    # out every envelope column on parse)
    schema = envelope_schema(payload_schema) if payload_schema is not None else envelope_schema()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # backpressure: bounds events-in-flight per micro-batch, the
        # ChangeEventQueue max.batch.size analog
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # batch "files" are parquet directories — glob into their part files
    stream = reader.parquet(f"{batch_dir}/batch_*")

    def apply_batch(df, epoch_id: int) -> None:
        # foreachBatch may redeliver an epoch after restart; the engine's
        # fence check turns the redelivery into a no-op. Tx-aligned: the
        # epoch's open tail transaction defers via the persisted carry
        # (engine.apply_stream_batch) — flush_tx_carry() at end of stream.
        engine.apply_stream_batch(df, batch_id=f"epoch_{epoch_id:05d}")

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query


def stream_replay_multi(
    spark: SparkSession,
    engine: MultiTableEngine,
    batch_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Multi-table tail: stream the *wire-format* batch directory (payloads
    as JSON strings — the only shape a mixed-table stream can have) and fan
    each micro-batch out to the per-table engines. Same two-layer
    exactly-once as ``stream_replay``: checkpoint dedupe at the source,
    per-table offset fences at each sink (a redelivered epoch is a no-op
    per table). Idle tables heartbeat every epoch, so every fence stays
    fresh even when one table gets all the traffic.

    Same flush contract as ``stream_replay``: with tx alignment on (the
    MultiTableEngine default), the last epoch's open tail transaction sits
    in the persisted carry until ``engine.flush_tx_carry()`` — call it (or
    ``drain(query, engine)``) after an ``availableNow`` drain before
    reading final table states."""
    reader = spark.readStream.schema(WIRE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(f"{batch_dir}/batch_*")

    def apply_batch(df, epoch_id: int) -> None:
        engine.apply_wire_batch(df, batch_id=f"epoch_{epoch_id:05d}")

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query, engine) -> None:
    """Await a streaming query's termination, then flush the engine's
    deferred open-tail transaction (see the flush contract on
    ``stream_replay``/``stream_replay_multi``). Use after an
    ``availableNow`` drain when the source log is complete; works with both
    ``CdcEngine`` and ``MultiTableEngine``."""
    query.awaitTermination()
    engine.flush_tx_carry()
