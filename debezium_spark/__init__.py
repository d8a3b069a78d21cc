"""debezium_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch (NOT a port) with the change-data-capture semantics of
Debezium (reference: openGauss fork of Debezium v1.8.1.Final). It turns
ordered change-log event batches into Debezium-envelope rows
(before/after/op/ts_ms/source offsets — see
``debezium-core/src/main/java/io/debezium/data/Envelope.java:103-157`` in the
reference), runs per-event transforms as pure Catalyst expressions, and
applies them as key-partitioned, salted, last-writer-wins MERGE upserts into
a bucketed copy-on-write lake table with exactly-once offset-fenced commits,
per-partition lineage metrics and checkpoint-resumable replay.

Design stance (Spark-first, 100 TB-ready):
- DataFrame/SQL only; zero per-row Python on the hot path.
- The synthetic binlog, the envelope builders, the SMT chain, the per-key
  dedupe and the MERGE are all Catalyst expressions — whole-stage codegen end
  to end.
- The apply stage shuffles once (repartition by target bucket), prunes the
  rewrite to touched buckets only, and commits atomically (fence + lineage in
  the same manifest), which is exactly Iceberg's COW MERGE shape; on a real
  cluster ``plans.merge`` swaps to ``MERGE INTO`` via the Iceberg Spark
  runtime with no change to the rest of the engine.
"""

from debezium_spark.schema import (
    REPO_PAYLOAD_SCHEMA,
    SOURCE_SCHEMA,
    TRANSACTION_SCHEMA,
    envelope_schema,
)
from debezium_spark.config import EngineConfig
from debezium_spark.generator import ChangeLogGenerator
from debezium_spark.plans.table import LakeTable
from debezium_spark.streaming.engine import CdcEngine
from debezium_spark.streaming.multi import MultiTableEngine, TableSpec
from debezium_spark.streaming.progress import ProcessCommitter

__all__ = [
    "REPO_PAYLOAD_SCHEMA",
    "SOURCE_SCHEMA",
    "TRANSACTION_SCHEMA",
    "envelope_schema",
    "ChangeLogGenerator",
    "EngineConfig",
    "LakeTable",
    "CdcEngine",
    "MultiTableEngine",
    "ProcessCommitter",
    "TableSpec",
]

__version__ = "0.1.0"
