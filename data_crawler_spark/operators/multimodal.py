"""Multimodal plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
actual codec step is stubbed two ways (per the build directive):
``decode=\"strict\"`` raises NotImplementedError at the exact seam where
a real decoder plugs in; ``decode=\"fake\"`` derives deterministic
pseudo-metadata/features from the bytes so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.

At 100 TB the rules encoded here: binary payloads never enter a
shuffle (feature-extract FIRST, carry only features + keys), and the
pipeline is mapInPandas so each task streams Arrow batches instead of
materializing rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, declared_format: string>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, width int, height int, "
    "channels int, feature array<double>"
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's utf-8 bytes as an
    opaque payload with typed metadata — the stand-in corpus for the
    multimodal path (no external data allowed in this sandbox)."""
    payload = F.encode("text", "utf-8")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("doc_id"), F.lit(3)) + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.upper(F.substring("source", 1, 4)).alias("declared_format"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic pseudo-decode: dims from byte length, 8-bin byte
    histogram as the 'feature' — a stand-in with real data flow."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    if n:
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 5, minlength=8).astype(np.float64) / n
    else:
        hist = np.zeros(8)
    return width, height, channels, np.round(hist, 6)


def decode_and_featurize(media: DataFrame, decode: str = "fake",
                         batch_limit: int = 1024) -> DataFrame:
    """binary payloads -> (dims, feature vector) via mapInPandas.

    ``decode="strict"`` marks the real-codec seam: it raises
    NotImplementedError (image/audio libs absent in this container).
    Unknown modes fail fast on the DRIVER — a typo must not silently
    run the fake decoder. Null payloads (a failed fetch) yield null
    dims/features, not a task crash.
    """
    if decode not in ("fake", "strict"):
        raise ValueError(
            f"decode must be 'fake' or 'strict', got {decode!r}")
    if decode == "strict":
        raise NotImplementedError(
            "real media decoding requires codec libraries not "
            "present in this environment; use decode='fake' for "
            "the deterministic stand-in")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(p) if p is not None else None
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pd.array(
                    [len(p) if p is not None else None
                     for p in pdf["payload"]], dtype="Int64"),
                "width": pd.array(
                    [r[0] if r else None for r in rows], dtype="Int32"),
                "height": pd.array(
                    [r[1] if r else None for r in rows], dtype="Int32"),
                "channels": pd.array(
                    [r[2] if r else None for r in rows], dtype="Int32"),
                "feature": [list(r[3]) if r else None for r in rows],
            })

    # project payload as late as possible; features leave, bytes don't
    return media.select("media_id", "media_type", "payload") \
                .mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (posexplode of a native sequence — the decode of each frame
    is the same strict/fake seam). Demonstrates the fan-out schema."""
    n_frames = (F.length("payload") / 1024).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.posexplode(idx).alias("pos", "frame_idx"))
        .select("media_id", "frame_idx")
    )
