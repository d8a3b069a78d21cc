"""ExtractNewRecordState — envelope → flat row SMT.

Re-creates ``debezium-core/.../transforms/ExtractNewRecordState.java:127-191``
in the reference (tombstone handling :128-138, delete modes :150-171,
add-source-fields :180, __deleted rewrite :183-189) as a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_new_record_state(
    env: DataFrame,
    delete_mode: str = "rewrite",  # drop | rewrite | keep (delete.handling.mode)
    add_source_fields: list[str] | None = None,
    drop_tombstones: bool = True,
) -> DataFrame:
    """Flatten the envelope: take ``after.*`` (or ``before.*`` for deletes),
    optionally rewrite deletes with ``__deleted`` and append ``__source_*``."""
    if drop_tombstones:
        # engine-emitted tombstones carry the key in `before` and the
        # `_tombstone` marker (tombstones.with_tombstones / the PK-change
        # split) — filter on the marker, not on both-null (which never
        # matched and duplicated every delete in the flat output, review
        # r4); the both-null filter stays for external key-only records
        if "_tombstone" in env.columns:
            env = env.filter(~F.coalesce(F.col("_tombstone"), F.lit(False)))
        env = env.filter(~(F.col("after").isNull() & F.col("before").isNull()))

    if delete_mode == "drop":
        env = env.filter(F.col("op") != "d")

    payload_fields = [f.name for f in env.schema["after"].dataType.fields]
    cols = [
        F.coalesce(F.col(f"after.{c}"), F.when(F.col("op") == "d", F.col(f"before.{c}"))).alias(c)
        for c in payload_fields
    ]
    out = env.select(*cols, F.col("op"), F.col("ts_ms"), F.col("source"))
    if delete_mode == "rewrite":
        out = out.withColumn("__deleted", (F.col("op") == "d").cast("string"))
    for f in add_source_fields or []:
        out = out.withColumn(f"__source_{f}", F.col(f"source.{f}"))
    return out.drop("source")
