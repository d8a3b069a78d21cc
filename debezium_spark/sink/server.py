"""debezium-server change consumers — envelope → per-sink record streams.

Re-creates the semantics of the reference's debezium-server sink adapters
(``debezium-server/debezium-server-{kinesis,pubsub,pulsar,redis,...}``),
which all share one contract (``debezium-server-core/.../
BaseChangeConsumer.java``): for each change record, map its Kafka topic
through a StreamNameMapper (``:31-41``, identity by default), serialize
key and value (``getBytes``/``getString`` ``:66-80``), and hand the triple
to the sink's client with per-key ordering preserved:

- Kinesis (``KinesisChangeConsumer.java:108-113``): PutRecord with
  ``partitionKey = key-string (or a null-key sentinel)``, ``streamName =
  mapped destination``, ``data = value bytes``;
- Redis Streams (``RedisStreamChangeConsumer.java:122-125``): ``XADD
  destination * {key: value}`` — one field pair per entry, stream entry
  ids assigned in arrival order;
- Pub/Sub & Pulsar: same triple with the key doubling as the
  ordering/partition key.

Spark-first: the per-record client loop becomes ONE projection producing a
*record-stream* DataFrame — (destination, partition, kafka-style offset,
key, value) — that a ``foreachBatch`` ships to whatever transport exists
(files here; the reference's HTTP/SDK clients are environment, not
semantics). Per-key order is what the sinks actually guarantee, so the
offset is a ``row_number`` per (destination, partition) in replay order —
the only window, partitioned exactly like the target system's shards.
Serialization reuses the engine's envelope JSON serde
(``functions/serde.py`` — the Kafka-wire format debezium-server consumes).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from debezium_spark.functions.serde import ENVELOPE_COLS
from debezium_spark.schema import REPO_KEY_COLS

#: BaseChangeConsumer subclasses use a literal "default" sentinel when the
#: record key is null (KinesisChangeConsumer.java:109 nullKey).
NULL_KEY = "default"


def to_change_records(
    env: DataFrame,
    topic_prefix: str = "dbserver1",
    n_partitions: int = 8,
    key_cols: list[str] | None = None,
    stream_name_mapper: Callable[[F.Column], F.Column] | None = None,
) -> DataFrame:
    """Envelope rows → the generic change-record stream every server sink
    consumes: (destination, partition, offset, key, value).

    - destination = StreamNameMapper(topic) with topic = prefix.db.table
      (TopicSelector naming, identity mapper by default);
    - partition = hash(key) mod n_partitions — Kafka's key partitioner,
      which is what gives the reference sinks their per-key order;
    - offset = arrival rank within (destination, partition) in replay
      order — the per-shard sequence number every target assigns;
    - key/value = the envelope JSON wire format (tombstones keep a null
      value, null keys become the ``default`` sentinel).
    """
    topic = F.concat_ws(".", F.lit(topic_prefix), F.col("source.db"), F.col("source.table"))
    if stream_name_mapper is not None:
        topic = stream_name_mapper(topic)

    # The MongoDB connector's *document* envelope (sources/mongodb.py) has
    # no before/after structs: its key is the canonical-JSON `id` string
    # (key struct = {"id": <json>}, MongoDbCollectionSchema) and its value
    # is the document-envelope JSON — the server sinks consume both
    # connector families through this one contract (review r5).
    is_document_envelope = "id" in env.columns and "before" not in env.columns
    if is_document_envelope:
        key = F.when(
            F.col("id").isNotNull(), F.to_json(F.struct(F.col("id")))
        ).otherwise(F.lit(NULL_KEY))
        value_cols = [
            c for c in env.columns if c != "id" and not c.startswith("_")
        ]
    else:
        key_cols = key_cols or list(REPO_KEY_COLS)
        key_fields = [
            F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
            for c in key_cols
        ]
        # a record with no key material at all is the null-key case the
        # sinks replace with their sentinel (to_json of an all-null struct
        # is "{}", which would silently look like a real key)
        has_key = F.coalesce(*[f.cast("string") for f in key_fields]).isNotNull()
        key = F.when(has_key, F.to_json(F.struct(*key_fields))).otherwise(F.lit(NULL_KEY))
        value_cols = list(ENVELOPE_COLS)
    # Engine tombstones carry the `_tombstone` marker with op='d' and the
    # key still in `before` (operators/tombstones.py — the both-null test
    # never matches them; see flatten.py's identical review-r4 note). The
    # heuristic only covers externally-built envelopes without the marker.
    if "_tombstone" in env.columns:
        # null-coalesced like flatten.py's (review r5): a null marker (e.g.
        # a unionByName with a marker-less stream) must not three-value a
        # live record into a null-value tombstone.
        is_tombstone = F.coalesce(F.col("_tombstone"), F.lit(False))
    elif is_document_envelope:
        # document streams have no both-null heuristic: deletes keep op='d'
        # and control events (op=null) still ship their envelope JSON
        is_tombstone = F.lit(False)
    else:
        is_tombstone = F.col("op").isNull() & F.col("after").isNull() & F.col("before").isNull()
    value = F.when(~is_tombstone, F.to_json(F.struct(*[F.col(c) for c in value_cols])))

    # `_sub` breaks ties among rows sharing one source position (delete →
    # tombstone → pk-change insert), preserving the delete-then-tombstone
    # ordering contract (MySqlConnectorIT.java:1542-1546).
    sub = F.col("_sub") if "_sub" in env.columns else F.lit(0)
    rec = env.select(
        topic.alias("destination"),
        F.pmod(F.xxhash64(key), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("source.file").alias("_file"),
        F.col("source.pos").alias("_pos"),
        sub.alias("_sub_ord"),
        key.alias("key"),
        value.alias("value"),
    )
    w = Window.partitionBy("destination", "partition").orderBy("_file", "_pos", "_sub_ord")
    return rec.withColumn("offset", F.row_number().over(w) - 1).drop(
        "_file", "_pos", "_sub_ord"
    )


def to_kinesis_records(env: DataFrame, stream_prefix: str = "dbserver1", **kw) -> DataFrame:
    """KinesisChangeConsumer.java:108-113 — PutRecordRequest fields."""
    if "topic_prefix" in kw:  # review r5: would TypeError as a duplicate kwarg
        raise ValueError("to_kinesis_records: pass stream_prefix, not topic_prefix")
    rec = to_change_records(env, topic_prefix=stream_prefix, **kw)
    return rec.select(
        F.col("destination").alias("stream_name"),
        F.col("key").alias("partition_key"),
        F.col("value").cast("binary").alias("data"),
        F.col("offset").alias("sequence_number"),
        F.col("partition").alias("shard"),
    )


def to_redis_stream_entries(env: DataFrame, **kw) -> DataFrame:
    """RedisStreamChangeConsumer.java:122-125 — XADD entries: one
    {key: value} field pair per entry. Redis assigns ``<ms-time>-<seq>``
    entry ids at XADD time; replay-stable determinism pins the time part
    to 0 so the sequence alone orders the stream (ids are server-assigned
    state, not record content)."""
    if "n_partitions" in kw:  # review r5: a Redis stream IS one shard
        raise ValueError("to_redis_stream_entries: a stream is a single shard; n_partitions is fixed at 1")
    rec = to_change_records(env, n_partitions=1, **kw)
    # sequence starts at 1: Redis rejects XADD ids that are not > 0-0
    return rec.select(
        F.col("destination").alias("stream"),
        F.concat_ws("-", F.lit(0), (F.col("offset") + 1).cast("string")).alias("entry_id"),
        F.col("key").alias("field"),
        F.coalesce(F.col("value"), F.lit("default")).alias("value"),
    )


def to_pubsub_messages(env: DataFrame, **kw) -> DataFrame:
    """PubSub/Pulsar shape: ordering key + data + attributes."""
    rec = to_change_records(env, **kw)
    return rec.select(
        F.col("destination").alias("topic"),
        F.col("key").alias("ordering_key"),
        F.col("value").alias("data"),
        F.col("offset"),
        F.col("partition"),
    )


def write_change_records(rec: DataFrame, out_dir: str) -> None:
    """Ship a record stream to the file transport: one directory per
    destination (``partitionBy``), records ordered by (partition, offset)
    within each file set — the ``foreachBatch`` body a deployment would
    point at a real SDK client."""
    # destination leads the sort: the dynamic partitionBy write requires
    # rows ordered by destination, and sorting on it here keeps Spark from
    # inserting its own destination-only sort that would scramble the
    # (partition, offset) order within each destination.
    (
        rec.repartition("destination")
        .sortWithinPartitions("destination", "partition", "offset")
        .write.mode("overwrite")
        .partitionBy("destination")
        .parquet(out_dir)
    )
