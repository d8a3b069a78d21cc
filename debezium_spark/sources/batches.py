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
    """Enumerate batch files in replay order.

    Order is NUMERIC on the batch index, not lexicographic: the writer
    pads to 5 digits, so at batch 100000 a byte sort would replay
    ``batch_100000`` before ``batch_99999`` — the later fence then
    silently exactly-once-skips every earlier batch (final review r5).
    Non-numeric names fall back to name order after all numbered ones."""
    import re as _re

    def key(n: str):
        m = _re.search(r"(\d+)", n)
        return (0, int(m.group(1)), n) if m else (1, 0, n)

    return [
        os.path.join(batch_dir, n)
        for n in sorted(os.listdir(batch_dir), key=key)
        if n.startswith("batch_")
    ]


def read_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
