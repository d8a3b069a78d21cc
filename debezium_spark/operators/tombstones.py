"""Tombstone emission — after each DELETE, a (key, null-value) record when
``tombstones.on.delete=true`` (the default). Reference:
``pipeline/EventDispatcher.java:474-486`` (emission inside
StreamingChangeRecordReceiver) and the ordering contract asserted by
``MySqlConnectorIT.java:1542-1546`` (delete then tombstone).

In the DataFrame model a tombstone is an envelope row with a null ``after``
value, the key still visible in ``before``, ``_tombstone=true``, and ``_sub``
ordered just after its delete; sinks that don't need compaction markers drop
them (ExtractNewRecordState drop-tombstones)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_tombstones(env: DataFrame) -> DataFrame:
    """Append a tombstone row after every delete (ordering via _sub)."""
    if "_sub" not in env.columns:
        env = env.withColumn("_sub", F.lit(0))
    null_payload = F.lit(None).cast(env.schema["after"].dataType)
    tomb = (
        env.filter(F.col("op") == "d")
        .withColumn("after", null_payload)
        .withColumn("_sub", F.col("_sub") + F.lit(1))
        .withColumn("_tombstone", F.lit(True))
    )
    return env.withColumn("_tombstone", F.lit(False)).unionByName(tomb)
