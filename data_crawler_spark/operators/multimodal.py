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


# ---------------------------------------------------------------------------
# Perceptual hashing: DCT pHash + hamming near-dup over media payloads
# ---------------------------------------------------------------------------

_PHASH_N = 32  # grayscale side length the DCT runs on (standard pHash)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the standard image-hash
    transform), as a plain numpy matmul — no scipy in this container."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(_PHASH_N)


def phash64(gray: np.ndarray) -> int:
    """The REAL pHash math (the part that is pure published algorithm,
    independent of any codec): 32x32 grayscale -> 2-D DCT-II -> keep
    the 8x8 low-frequency block -> threshold each coefficient at the
    median of the 63 AC coefficients (DC excluded from the median — it
    is pure mean brightness; its own bit uses the same threshold) ->
    64 bits, bit i = coefficient_i > median. A uniform brightness
    shift changes ONLY the DC coefficient, so at most one bit moves —
    the invariance that makes pHash a *perceptual* hash. Returns a
    signed int64 (Spark's long), row-major bit order."""
    if gray.shape != (_PHASH_N, _PHASH_N):
        raise ValueError(
            f"phash64 wants a {_PHASH_N}x{_PHASH_N} grayscale array, "
            f"got {gray.shape}")
    d = _DCT32 @ gray.astype(np.float64) @ _DCT32.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])
    bits = np.uint64(0)
    for i, v in enumerate(block):
        if v > med:
            bits |= np.uint64(1) << np.uint64(i)
    return int(np.int64(bits))


def _fake_gray(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-grayscale for the stubbed codec seam: the
    payload bytes tiled into a 32x32 float array. Identical bytes give
    identical 'images' — the property the plumbing tests need."""
    if not payload:
        return np.zeros((_PHASH_N, _PHASH_N))
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return np.resize(arr, _PHASH_N * _PHASH_N).reshape(_PHASH_N, _PHASH_N)


def phash_media(media: DataFrame, decode: str = "fake") -> DataFrame:
    """(media_id, phash) per payload — the 64-bit perceptual hash a
    media crawl dedups on. The codec step (bytes -> 32x32 grayscale)
    is the same strict/fake seam as decode_and_featurize (a real
    deployment plugs PIL/ffmpeg in at ``_fake_gray``'s position); the
    DCT/median/threshold math downstream of the seam is the real
    published algorithm and is tested directly on synthetic grayscale.
    One Arrow-batched mapInPandas pass; payload bytes never shuffle —
    only (media_id, phash) leaves the scan. Null payloads -> null
    phash."""
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
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": pd.array(
                    [phash64(_fake_gray(bytes(p))) if p is not None
                     else None for p in pdf["payload"]],
                    dtype="Int64"),
            })

    return (media.select("media_id", "payload")
            .mapInPandas(fn, "media_id long, phash long"))


def media_near_dups(media: DataFrame, max_hamming: int = 6,
                    decode: str = "fake") -> DataFrame:
    """Perceptual near-duplicate media pairs: phash_media then EXACT
    hamming blocking (dedup.hamming_near_dups — by pigeonhole,
    max_hamming+1 chunks guarantee zero false negatives), the image
    analogue of simhash_near_dups. Emits (id_a, id_b, hamming) with
    id_a < id_b; the payload bytes feed exactly one Arrow stage and
    never ride the blocking shuffle."""
    from data_crawler_spark.operators.dedup import hamming_near_dups

    hashes = phash_media(media, decode).where(F.col("phash").isNotNull())
    return hamming_near_dups(hashes, "media_id", "phash", max_hamming)
