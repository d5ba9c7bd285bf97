"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` — the Spark pattern for decode / resize /
feature-extract at 100 TB (each batch is one Arrow RecordBatch; no per-row
Python). The image/audio codec libraries are NOT in this container, so the
actual decode is STUBBED (``decode_image_stub``) with a deterministic fake
whose outputs are pure functions of the bytes — making the Spark-side plumbing
(schema, batching, UDF signature) real and oracle-checkable while the codec
call is a drop-in replacement later.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary payload column from text (the testdata has no real
    media; utf-8 bytes stand in for an encoded image)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decode — replace with PIL/ffmpeg in production.

    Raises NotImplementedError for payloads that would need a real codec
    (magic bytes of real formats), else derives fake dimensions from length.
    """
    if payload[:4] in (b"\x89PNG", b"\xff\xd8\xff\xe0", b"RIFF"):
        raise NotImplementedError("real codecs are not available in this container")
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else 0,
        "fake_width": 64 + n % 512,
        "fake_height": 64 + (n * 7) % 512,
        "fake_channels": 3,
    }


IMAGE_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("first_byte", LongType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
    StructField("fake_channels", LongType()),
])


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Batch shape: each
    Arrow batch becomes one pandas DataFrame; output rows align 1:1."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("fake_sample_rate", LongType()),
    StructField("fake_duration_ms", LongType()),
    StructField("fake_channels", LongType()),
    StructField("rms_proxy", LongType()),
])


def extract_audio_features_stub(df: DataFrame, id_col: str = "doc_id",
                                payload_col: str = "payload") -> DataFrame:
    """Audio-modality plumbing (mapInPandas over binary): deterministic fake
    sample-rate/duration/loudness derived from the bytes — swap in
    soundfile/ffprobe for real decode. rms_proxy = mean byte value, the
    cheapest 'loudness' stand-in that is a pure function of the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                b = bytes(p)
                n = len(b)
                rate = 8000 * (1 + n % 3)  # 8/16/24 kHz fake tiers
                out.append({
                    "n_bytes": n,
                    "fake_sample_rate": rate,
                    "fake_duration_ms": (n * 1000) // (rate * 2) if n else 0,
                    "fake_channels": 1 + n % 2,
                    "rms_proxy": sum(b) // n if n else 0,
                })
            res = pd.DataFrame(out)
            res.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield res

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_bytes", LongType()),
    StructField("resized_md5", StringType()),
])


def resize_image_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 32,
    target_h: int = 32,
) -> DataFrame:
    """Resize plumbing over binary payloads (mapInPandas, binary in → derived
    bytes out). The deterministic stand-in 'resize' is a prefix crop to the
    target byte budget (w·h·3/8); a real implementation swaps in
    PIL.Image.resize on the decoded array. Output carries the md5 of the
    resized payload so results are comparable across engines without shipping
    raw bytes through the comparator."""
    import hashlib

    budget = target_w * target_h * 3 // 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p)[:budget] for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "out_bytes": [len(r) for r in resized],
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_stub(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload", every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled offset per doc —
    the explode shape a video pipeline produces (doc → frames). Offsets are
    byte positions; a real implementation would seek keyframes."""
    n = F.length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), F.floor((n - 1) / F.lit(every_n_bytes)).cast("long"))
    return df.select(
        F.col(id_col),
        F.explode(offsets).alias("frame_no"),
    ).select(
        F.col(id_col),
        F.col("frame_no").cast("long").alias("frame_no"),
        (F.col("frame_no") * every_n_bytes).cast("long").alias("byte_offset"),
    )
