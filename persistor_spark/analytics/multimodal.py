"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes clearly marked below) — but everything Spark-side is
real and tested: the schema contract, the Arrow batch shape, partitioning
by media type, and the UDF signatures.  Swapping `_fake_decode_image` for a
Pillow/ffmpeg call is a one-function change that doesn't touch the plan.

Scale notes: media payloads are large — the operators below never shuffle
raw bytes (feature extraction happens before any wide transform), and
`repartition_for_decode` sizes partitions by *byte volume*, not row count,
so a partition of 4K videos and a partition of thumbnails cost similar
decode time.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_bytes long, feature array<float>"
)
FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_ts_ms long, frame array<float>"

_FEATURE_DIM = 8


def _fake_decode_image(content: bytes) -> list[float]:
    """STUB decode: deterministic byte-statistics 'feature' standing in for a
    real decoder+CNN.  Replace with Pillow + a vision model in production —
    the surrounding plan is unchanged."""
    if content is None:
        raise NotImplementedError("real image decode requires a codec library")
    n = len(content) or 1
    return [
        float(n % 251),
        float(sum(content[:64]) % 997),
        float(content[0] if n else 0),
        float(content[-1] if n else 0),
        float(min(content) if n else 0),
        float(max(content) if n else 0),
        float(n),
        float(sum(content) % 7919),
    ]


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one feature row per
    media row out.  Runs fully parallel per partition; no shuffle."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _fake_decode_image(bytes(c)) if c is not None else [0.0] * _FEATURE_DIM
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = "media_id string, duration_ms long, n_bytes long, mfcc array<float>"


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction over audio rows (MFCC-shaped output).  Decode
    is stubbed like the image path — deterministic byte statistics standing in
    for a real codec+DSP chain; batch shape and schema are real."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _fake_decode_image(bytes(c)) if c is not None else [0.0] * _FEATURE_DIM
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["duration_ms"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "mfcc": feats,
                }
            )

    return df.filter(F.col("media_type") == "audio").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled timestamp.
    Decode is stubbed (deterministic fake frames); the row-explosion shape and
    timestamp arithmetic are real."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                dur = int(row["duration_ms"] or 0)
                content = bytes(row["content"]) if row["content"] is not None else b""
                for i, ts in enumerate(range(0, dur, every_ms)):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame"].append(_fake_decode_image(content[ts % max(len(content), 1) :] or b"\0"))
            yield pd.DataFrame(out)

    return df.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, width int, height int, content binary"
)


def resize_images(df: DataFrame, max_width: int = 224, max_height: int = 224) -> DataFrame:
    """Image resize kernel: aspect-preserving downscale to fit the target box.
    The geometry (real) runs per Arrow batch; the pixel resample is STUBBED —
    content passes through untouched (a Pillow `Image.resize` drop-in) —
    while output dimensions are computed exactly as a real resizer would."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            widths, heights = [], []
            for w, h in zip(pdf["width"], pdf["height"]):
                w, h = int(w or 1), int(h or 1)
                scale = min(max_width / w, max_height / h, 1.0)
                widths.append(max(int(w * scale), 1))
                heights.append(max(int(h * scale), 1))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "content": pdf["content"],  # STUB: real impl resamples pixels
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(run, RESIZED_SCHEMA)


def repartition_for_decode(df: DataFrame, target_bytes_per_partition: int = 256 << 20) -> DataFrame:
    """Range-partition by cumulative payload size so decode partitions are
    byte-balanced (row-count partitioning is pathological for mixed media)."""
    sized = df.withColumn("__bytes", F.coalesce(F.length("content"), F.lit(0)))
    total = sized.agg(F.sum("__bytes")).collect()[0][0] or 1
    n_parts = max(int(total / target_bytes_per_partition), 1)
    return sized.repartitionByRange(n_parts, F.col("media_type"), F.col("__bytes")).drop("__bytes")


def synthesize_media(spark, documents: DataFrame, n: int | None = None) -> DataFrame:
    """Deterministic fake media table derived from `documents` payload text —
    test/fixture glue (no media fixture ships with the driver)."""
    base = documents.select(
        F.concat(F.lit("media-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 10000).cast("long").alias("duration_ms"),
    )
    return base.limit(n) if n else base
