"""Ordered event-batch source.

The engine's input is "mlog captures serialized as ordered event batches"
(north rule): a directory of parquet files ``batch_00000.parquet,
batch_00001.parquet, …`` whose lexicographic order is replay order —
the deterministic-batch-boundary requirement that makes resume reproduce
identical dedupe outcomes (SURVEY §7.4). This plays the role of the
reference's streaming sources + ChangeEventQueue poll loop
(``connector/base/ChangeEventQueue.java:230+``): batch size is fixed at
write time, so backpressure and max.batch.size are moot."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def list_batches(batch_dir: str) -> list[str]:
    """Enumerate batch files in replay order."""
    return [
        os.path.join(batch_dir, n)
        for n in sorted(os.listdir(batch_dir))
        if n.startswith("batch_")
    ]


def read_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
