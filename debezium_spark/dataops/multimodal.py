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


# ---------------------------------------------------------------------------
# REAL decode path — formats decodable with stdlib + numpy only (no PIL /
# soundfile in this container): BMP (24-bit uncompressed), PPM (P6 binary),
# WAV (16-bit PCM). Anything else falls through to a PIL-gated branch and,
# failing that, to None (quarantine-able). Encoders exist so synthetic media
# is REAL bytes: the decoder is verified against byte layouts it did not
# produce in-memory (row padding, BGR order, bottom-up rows, RIFF framing).
# ---------------------------------------------------------------------------

import struct


def encode_bmp(rgb_rows: "list[list[tuple[int, int, int]]]") -> bytes:
    """Minimal BI_RGB 24-bit BMP: BGR pixel order, rows bottom-up, each row
    padded to 4 bytes — the exact quirks a decoder must undo."""
    h = len(rgb_rows)
    w = len(rgb_rows[0]) if h else 0
    row_size = (3 * w + 3) // 4 * 4
    body = bytearray()
    for row in reversed(rgb_rows):  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))  # BGR
        line += b"\x00" * (row_size - len(line))
        body += line
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + bytes(body)


def encode_ppm(rgb_rows: "list[list[tuple[int, int, int]]]") -> bytes:
    h = len(rgb_rows)
    w = len(rgb_rows[0]) if h else 0
    body = bytes(v for row in rgb_rows for px in row for v in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def encode_wav_pcm16(samples: "list[int]", rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_media(payload: bytes) -> dict | None:
    """Sniff + decode one media payload → feature dict, or None for
    undecodable/corrupt payloads (callers quarantine them — a poison
    record must not abort the Arrow task). Pure stdlib + numpy for
    BMP/PPM/WAV; PIL-gated for everything else (JPEG/PNG/WebP...)."""
    try:
        return _decode_media_strict(payload)
    except Exception:
        return None  # truncated/corrupt frame → quarantine, never crash


def _decode_media_strict(payload: bytes) -> dict | None:
    import numpy as np

    if not payload:
        return None
    if payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        off = struct.unpack_from("<I", payload, 10)[0]
        if bpp != 24:
            return None
        row_size = (3 * w + 3) // 4 * 4
        rows = []
        for y in range(abs(h)):
            line = np.frombuffer(payload, dtype=np.uint8, count=3 * w,
                                 offset=off + y * row_size).reshape(w, 3)
            rows.append(line[:, ::-1])  # BGR -> RGB
        px = np.stack(rows[::-1] if h > 0 else rows)  # bottom-up -> top-down
        return _image_features("bmp", px)
    if payload[:2] == b"P6":
        parts = payload.split(b"\n", 3)
        w, h = (int(t) for t in parts[1].split())
        px = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
        return _image_features("ppm", px)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as wv:
            n, rate = wv.getnframes(), wv.getframerate()
            width, nch = wv.getsampwidth(), wv.getnchannels()
            raw = wv.readframes(n)
        if width != 2 or nch != 1:
            # only 16-bit mono PCM decodes here; reinterpreting 8-bit or
            # multi-channel frames as <i2 would emit garbage features —
            # undecodable payloads must yield None (quarantine), review r4
            return None
        s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        return {
            "fmt": "wav", "width": None, "height": None,
            "n_samples": int(s.size), "sample_rate": int(rate),
            "mean_c0_x1000": None,
            "sum_abs": int(np.abs(s).sum()),
        }
    try:  # library-gated fallback for compressed formats
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        px = np.asarray(img)
        return _image_features(img.format.lower() if img.format else "pil", px)
    except Exception:
        return None


def _image_features(fmt: str, px) -> dict:
    """Channel-0 mean catches BGR/RGB swaps; exact integer math so the
    DuckDB oracle can replicate from the generative formula."""
    h, w = px.shape[0], px.shape[1]
    c0 = px[:, :, 0].astype("int64")
    return {
        "fmt": fmt, "width": int(w), "height": int(h),
        "n_samples": None, "sample_rate": None,
        "mean_c0_x1000": int(c0.sum()) * 1000 // (h * w),
        "sum_abs": None,
    }


REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fmt", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("mean_c0_x1000", LongType(), True),
        StructField("sum_abs", LongType(), True),
    ]
)


def synth_real_media(spark, n: int, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic REAL media bytes, generated executor-side (mapInPandas
    over a range — bytes never visit the driver): media_id % 3 picks
    BMP / PPM / WAV. Pixels p(id,x,y,c) = (id*7 + x*13 + y*31 + c*5) % 256;
    WAV samples s(id,i) = ((id*11 + i*17) % 4096) - 2048, 100 samples."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                mid = int(mid)
                k = mid % 3
                if k == 2:
                    payload = encode_wav_pcm16(
                        [((mid * 11 + i * 17) % 4096) - 2048 for i in range(100)]
                    )
                    kind = "audio"
                else:
                    rows = [
                        [
                            tuple((mid * 7 + x * 13 + y * 31 + c * 5) % 256 for c in range(3))
                            for x in range(width)
                        ]
                        for y in range(height)
                    ]
                    payload = encode_bmp(rows) if k == 0 else encode_ppm(rows)
                    kind = "image"
                out.append({"media_id": mid, "kind": kind, "payload": payload})
            yield pd.DataFrame(out)

    return spark.range(n).mapInPandas(
        gen, schema="media_id long, kind string, payload binary"
    )


def decode_real_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched real decode: BMP/PPM byte layouts (padding, BGR,
    bottom-up) and RIFF/WAV PCM are actually parsed; undecodable payloads
    yield nulls (callers quarantine them)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_media(bytes(payload) if payload is not None else b"")
                rows.append({"media_id": int(mid), **(d or {"fmt": None})})
            yield pd.DataFrame(rows, columns=[f.name for f in REAL_FEATURE_SCHEMA.fields])

    return media.mapInPandas(gen, schema=REAL_FEATURE_SCHEMA)


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
