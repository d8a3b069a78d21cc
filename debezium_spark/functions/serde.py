"""Envelope JSON serde + CloudEvents converter — pure Catalyst.

Plays the role of the reference's converters:
- ``debezium-core/.../serde/DebeziumSerdes.java`` + ``serde/json/`` (JSON
  (de)serialization of envelope records for consumers) → ``to_json`` /
  ``from_json`` over the envelope StructType;
- ``debezium-core/.../converters/CloudEventsConverter.java`` (envelope →
  CloudEvents 1.0 attributes + data) → attribute columns + a ``data`` JSON
  string, one ``select``.

Everything stays in whole-stage codegen — the JSON codec is Jackson inside
the JVM, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from debezium_spark.schema import REPO_KEY_COLS, REPO_PAYLOAD_SCHEMA, envelope_schema

ENVELOPE_COLS = ["before", "after", "op", "ts_ms", "source", "transaction"]


def envelope_to_json(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Serialize each envelope row to one JSON string (key, value) — the
    wire format a Kafka-bound deployment would produce. ``key_cols`` names
    the payload key fields (defaults to the repo-content table's key) — the
    serde is otherwise payload-generic, matching the decode side."""
    key_cols = key_cols or list(REPO_KEY_COLS)
    key = F.to_json(
        F.struct(
            *[
                F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
                for c in key_cols
            ]
        )
    )
    value = F.to_json(F.struct(*[F.col(c) for c in ENVELOPE_COLS]))
    return env.select(key.alias("key_json"), value.alias("value_json"))


def envelope_from_json(
    df: DataFrame, json_col: str = "value_json", payload: StructType = REPO_PAYLOAD_SCHEMA
) -> DataFrame:
    """Parse JSON-serialized envelopes back to typed envelope rows — the
    consume-side serde (DebeziumSerdes.serializer/deserializer pair)."""
    schema = envelope_schema(payload)
    return df.select(F.from_json(F.col(json_col), schema).alias("e")).select("e.*")


def to_cloudevents(env: DataFrame, source_uri: str = "/debezium_spark/inventory") -> DataFrame:
    """Envelope → CloudEvents 1.0 attribute columns + data payload
    (CloudEventsConverter.java's ce_* attributes; id = offset, type =
    io.debezium.<op>, time from ts_ms, data = flattened after-state)."""
    return env.select(
        F.concat(F.col("source.file"), F.lit(":"), F.col("source.pos").cast("string")).alias(
            "ce_id"
        ),
        F.lit("1.0").alias("ce_specversion"),
        F.lit(source_uri).alias("ce_source"),
        F.concat(F.lit("io.debezium.op."), F.col("op")).alias("ce_type"),
        F.col("ts_ms").alias("ce_time_ms"),
        F.lit("application/json").alias("ce_datacontenttype"),
        F.to_json(F.struct(F.col("before"), F.col("after"), F.col("op"))).alias("data"),
    )


def to_byte_buffer(env: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """ByteBufferConverter (``debezium-api/.../ByteBufferConverter``): the
    record value as raw bytes — here the UTF-8 bytes of the JSON wire form
    (key stays JSON). Pure cast, JVM-side."""
    wire = envelope_to_json(env, key_cols=key_cols)
    return wire.select(
        F.col("key_json"), F.col("value_json").cast("binary").alias("value_bytes")
    )


def from_byte_buffer(df: DataFrame, payload: StructType = REPO_PAYLOAD_SCHEMA,
                     bytes_col: str = "value_bytes") -> DataFrame:
    """Decode ByteBuffer values back to typed envelopes."""
    return envelope_from_json(
        df.select(F.col(bytes_col).cast("string").alias("value_json")), payload=payload
    )


