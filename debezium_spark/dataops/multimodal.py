"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schemas, batch shapes, UDF
signatures, partitioning — while the actual media decode is STUBBED (the
image/audio libraries are not in this container): ``decode_image_features``
computes deterministic fake features from the bytes (sha-derived), and the
place a real decoder plugs in is marked. At scale these run as Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch controls batch size) with one
Python worker per core; the binary payloads never transit the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("feat0", LongType(), False),
        StructField("feat1", LongType(), False),
    ]
)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payload from sha256)."""
    df = spark.range(n)
    payload = F.sha2(F.concat(F.lit(seed), F.lit(":"), F.col("id").cast("string")), 256)
    return df.select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(payload, "utf-8").cast("binary").alias("payload"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("id") * 10).alias("duration_ms"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB for the real decoder. A real deployment replaces this body with
    e.g. PIL.Image.open(io.BytesIO(payload)) / soundfile.read(...) — the
    surrounding Arrow plumbing is unchanged. Deterministic fake features:
    first 8 bytes of sha256 as two ints."""
    d = hashlib.sha256(payload or b"").digest()
    return int.from_bytes(d[:4], "big"), int.from_bytes(d[4:8], "big")


def decode_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    Partition-parallel; no driver involvement; output schema fixed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feat0": feats.map(lambda t: t[0]).astype("int64"),
                    "feat1": feats.map(lambda t: t[1]).astype("int64"),
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (decode stubbed — the real path would emit frame bytes).
    Pure Catalyst expansion; the per-frame decode would be a second
    mapInPandas over (media_id, frame_ts)."""
    frames = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0).cast("long")),
        F.lit(every_ms).cast("long"),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts"))
    )
