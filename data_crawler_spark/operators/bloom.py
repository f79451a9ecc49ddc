"""Partitioned bloom URL-seen sidecar (SURVEY.md §2 op 31; the
"partitioned cuckoo/bloom URL-seen filter keyed on canonicalized-URL
xxhash64" of BASELINE.json:6,14).

Role at 10^10 URLs: the exact seen-set anti-join (op 10) must shuffle
every candidate against the full seen table. The bloom sidecar is a
*partitioned accelerator* in front of it: per url_hash bucket, a bitmap
over the bucket's seen hashes. Candidates probe the (broadcast) bitmaps
and only *maybe-seen* candidates enter the anti-join; definitely-unseen
candidates (the overwhelming majority in a growing crawl) skip it.
Exactness never depends on the filter — no false negatives, property-
tested — it only shrinks the anti-join's left side.

Bitmaps are built per bucket with a grouped applyInPandas (vectorized
numpy bit ops — no per-row Python, BASELINE.json:15) and stored as
array<bigint> word rows in a snapshot table: state lives in tables, so
the filter is as resumable as the rest of the crawl, and probes are
JVM-native bit tests over the broadcast table (probe_native).

PySpark exposes no DataFrame-level bloomFilter builder (df.stat has
none), hence hand-rolled; Spark's runtime bloom-join
(spark.sql.optimizer.runtime.bloomFilter.enabled) complements but
cannot persist across rounds.

Bloom over cuckoo (the north star allows either, BASELINE.json:6
"cuckoo/bloom"): a cuckoo filter's advantages are deletion support and
better space at low FPR targets — but the discovered/seen set is
MONOTONE (urls are never un-discovered), so deletions buy nothing,
while bloom bitmaps OR-merge associatively, which is exactly what the
per-round incremental update and the crash-rollback story need
(re-merging a replayed round is idempotent; cuckoo inserts are not).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from data_crawler_spark.functions.hashing import bloom_positions_np

# bitmap as array<bigint> (little-endian 64-bit words; bit p of the
# filter = bit p%64 of word p//64): lets the JVM-native probe test bits
# with element_at/getbit directly on the broadcast table — a binary
# column would need a Python hop or driver-side re-encoding every round
BLOOM_SCHEMA = "bucket int, m_bits long, k int, n_items long, bitmap array<bigint>"


def optimal_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate; m rounded UP to a
    power of two (the position scheme masks with m-1 so the JVM-native
    probe and the numpy builder agree bit-for-bit — see
    functions/hashing.bloom_positions_np). Rounding up only lowers the
    actual FPR; k is then re-derived for the rounded m. Floor is 64
    bits: the bitmap is stored as array<bigint> words, so m must be a
    multiple of 64 (smaller sizes made bitmap.view('<u8') in
    build_bloom raise on tiny inputs)."""
    n = max(n_items, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = 1 << max(6, (m - 1).bit_length())
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bucket_col(url_hash, n_buckets: int):
    return F.pmod(url_hash, F.lit(n_buckets)).cast("int")


def build_bloom(seen: DataFrame, n_buckets: int = 64,
                fpp: float = 0.01, m_bits: int | None = None,
                k: int | None = None) -> DataFrame:
    """seen(url_hash, ...) -> one bitmap row per url_hash bucket.

    Sizing: fixed per-bucket m/k (pass explicitly for a stable layout
    across rounds, or let each build size itself from bucket counts).
    """
    if m_bits is None or k is None:
        # size for the average bucket at the requested fpp, x2 headroom
        n_est = max(seen.count() // n_buckets, 1) * 2
        m_bits, k = optimal_params(n_est, fpp)

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        pos = bloom_positions_np(h, k=k, m_bits=m_bits).reshape(-1)
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(bitmap, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        words = bitmap.view("<u8").astype(np.int64)
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "m_bits": [m_bits], "k": [k], "n_items": [len(h)],
            "bitmap": [words],
        })

    return (seen.select("url_hash")
            .withColumn("bucket", bucket_col(F.col("url_hash"), n_buckets))
            .groupBy("bucket").applyInPandas(make, BLOOM_SCHEMA))


def probe_udf(bloom_rows: list, n_buckets: int):
    """maybe_seen(url_hash) scalar pandas UDF over captured bitmaps.

    ``bloom_rows`` is the collected (small: n_buckets × m/8 bytes)
    bitmap table; it ships to executors inside the UDF closure via the
    task broadcast. Missing buckets -> definitely unseen."""
    bitmaps: dict[int, np.ndarray] = {}
    params: dict[int, tuple[int, int]] = {}
    for r in bloom_rows:
        bitmaps[r["bucket"]] = _to_bytes_view(r["bitmap"])
        params[r["bucket"]] = (int(r["m_bits"]), int(r["k"]))

    @pandas_udf(BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        h = url_hash.to_numpy(dtype=np.int64)
        bucket = np.mod(h, n_buckets)  # pmod semantics for negatives
        out = np.zeros(len(h), dtype=bool)
        for b in np.unique(bucket):
            bm = bitmaps.get(int(b))
            if bm is None:
                continue
            m_bits, k = params[int(b)]
            sel = bucket == b
            pos = bloom_positions_np(h[sel], k=k, m_bits=m_bits)
            hit = np.ones(sel.sum(), dtype=bool)
            for j in range(k):
                p = pos[:, j]
                hit &= (bm[p // 8] >> (p % 8) & 1).astype(bool)
            out[sel] = hit
        return pd.Series(out)

    return maybe_seen


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two bloom sidecars with identical (m_bits, k) layout —
    the per-round incremental update: only the NEW seen rows are hashed
    each round; merged bitmaps commit as the next sidecar snapshot."""

    def orit(pdf: pd.DataFrame) -> pd.DataFrame:
        # same guard as update_bloom: same m_bits with different k
        # would merge silently and probe k positions over bitmaps
        # built with fewer — false negatives (exactness violated)
        if pdf["m_bits"].nunique() > 1 or pdf["k"].nunique() > 1:
            raise ValueError(
                "merge_blooms layout mismatch in bucket "
                f"{int(pdf['bucket'].iloc[0])}: "
                f"m_bits={sorted(pdf['m_bits'].unique().tolist())}, "
                f"k={sorted(pdf['k'].unique().tolist())}")
        acc = None
        for buf in pdf["bitmap"]:
            v = np.asarray(buf, dtype=np.int64)
            acc = v.copy() if acc is None else (acc | v)
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "m_bits": [int(pdf["m_bits"].iloc[0])],
            "k": [int(pdf["k"].iloc[0])],
            "n_items": [int(pdf["n_items"].sum())],
            "bitmap": [acc],
        })

    return a.unionByName(b).groupBy("bucket").applyInPandas(orit, BLOOM_SCHEMA)


def update_bloom(old: DataFrame, delta: DataFrame, n_buckets: int,
                 m_bits: int, k: int) -> DataFrame:
    """build_bloom(delta) OR-merged into ``old`` in ONE cogrouped pass
    (the separate build + merge formulation costs two shuffles and two
    Python stages per round; this is the per-round incremental update
    the crawl uses). ``delta`` needs a ``url_hash`` column; layout must
    match ``old``'s."""

    def upd(bloom: pd.DataFrame, hashes: pd.DataFrame) -> pd.DataFrame:
        if bloom.empty and hashes.empty:
            return pd.DataFrame(
                columns=["bucket", "m_bits", "k", "n_items", "bitmap"])
        if bloom.empty:
            bucket = int(hashes["bucket"].iloc[0])
            bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
            n_old = 0
        else:
            # layout contract: a caller-passed (m_bits, k) that differs
            # from the persisted rows' would index out of bounds when
            # growing or silently corrupt bits (bloom false negatives =
            # re-crawled URLs) — fail loudly instead.
            old_m = int(bloom["m_bits"].iloc[0])
            old_k = int(bloom["k"].iloc[0])
            if (old_m, old_k) != (m_bits, k):
                raise ValueError(
                    f"update_bloom layout mismatch: persisted (m_bits={old_m}, "
                    f"k={old_k}) != caller (m_bits={m_bits}, k={k}); resume "
                    "must reuse the persisted layout (see plans/crawl.py "
                    "open_crawl)")
            bucket = int(bloom["bucket"].iloc[0])
            bitmap = _to_bytes_view(bloom["bitmap"].iloc[0]).copy()
            n_old = int(bloom["n_items"].sum())
        h = hashes["url_hash"].to_numpy(dtype=np.int64) if len(hashes) else \
            np.empty(0, dtype=np.int64)
        if len(h):
            pos = bloom_positions_np(h, k=k, m_bits=m_bits).reshape(-1)
            np.bitwise_or.at(bitmap, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({
            "bucket": [bucket], "m_bits": [m_bits], "k": [k],
            "n_items": [n_old + len(h)],
            "bitmap": [bitmap.view("<u8").astype(np.int64)],
        })

    hashed = (delta.select("url_hash")
              .withColumn("bucket", bucket_col(F.col("url_hash"), n_buckets)))
    return (old.groupBy("bucket")
            .cogroup(hashed.groupBy("bucket"))
            .applyInPandas(upd, BLOOM_SCHEMA))


def probe_cogrouped(candidates: DataFrame, bloom_df: DataFrame,
                    n_buckets: int) -> DataFrame:
    """Distributed probe: candidates cogroup the bitmap table on
    ``bucket`` — bitmaps never transit the driver, each task holds ONE
    bucket's bitmap while probing that bucket's candidates. This is the
    10^10-seen path, where the sidecar (n_buckets × m/8 bytes) is far
    too large to collect; the cost is one O(delta) candidate shuffle on
    bucket. Returns candidates + ``_maybe`` boolean."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(list(candidates.schema.fields)
                            + [StructField("_maybe", BooleanType(), False)])
    out_cols = [f.name for f in out_schema.fields]

    def probe(cand: pd.DataFrame, bloom: pd.DataFrame) -> pd.DataFrame:
        if cand.empty:
            return pd.DataFrame(columns=out_cols)
        if bloom.empty:
            return cand.drop(columns=["_bucket"]).assign(_maybe=False)[out_cols]
        m_bits, k = int(bloom["m_bits"].iloc[0]), int(bloom["k"].iloc[0])
        bm = _to_bytes_view(bloom["bitmap"].iloc[0])
        h = cand["url_hash"].to_numpy(dtype=np.int64)
        pos = bloom_positions_np(h, k=k, m_bits=m_bits)
        hit = np.ones(len(h), dtype=bool)
        for j in range(k):
            p = pos[:, j]
            hit &= (bm[p // 8] >> (p % 8) & 1).astype(bool)
        return cand.drop(columns=["_bucket"]).assign(_maybe=hit)[out_cols]

    c = candidates.withColumn("_bucket", bucket_col(F.col("url_hash"), n_buckets))
    b = bloom_df.withColumnRenamed("bucket", "_bucket")
    return (c.groupBy("_bucket")
            .cogroup(b.groupBy("_bucket"))
            .applyInPandas(probe, out_schema))


def _to_bytes_view(words) -> np.ndarray:
    """array<bigint> bitmap -> uint8 view (little-endian words)."""
    return np.ascontiguousarray(
        np.asarray(words, dtype=np.int64)).view("<u8").view(np.uint8)


def probe_native(candidates: DataFrame, bloom_df: DataFrame,
                 n_buckets: int, m_bits: int, k: int) -> DataFrame:
    """JVM-native probe: broadcast-join the bitmap table on bucket and
    test the k bits with pure Catalyst expressions —
    ``pos_j = xxhash64(url_hash, j) & (m-1)`` indexes the array<long>
    bitmap. Zero Python workers, zero Arrow transfer, nothing transits
    the driver, and the probe fuses into whole-stage codegen with the
    (also native) canonicalize/hash pipeline upstream, so callers can
    recompute the marked frame per consumer instead of caching it.
    Requires the uniform power-of-two layout build_bloom emits."""
    if m_bits & (m_bits - 1):
        raise ValueError("probe_native needs a power-of-two m_bits")
    bm = bloom_df.select(F.col("bucket").alias("_bucket"),
                         F.col("bitmap").alias("_words"))
    joined = (candidates
              .withColumn("_bucket", bucket_col(F.col("url_hash"), n_buckets))
              .join(F.broadcast(bm), "_bucket", "left"))
    hit = F.col("_words").isNotNull()
    for j in range(k):
        p = F.xxhash64(F.col("url_hash"), F.lit(j).cast("long")) \
             .bitwiseAND(F.lit(m_bits - 1))
        word = F.element_at(F.col("_words"), F.shiftright(p, 6).cast("int") + 1)
        hit = hit & (F.getbit(word, p.bitwiseAND(F.lit(63))) == 1)
    return joined.withColumn("_maybe", hit).drop("_bucket", "_words")


# sidecars below this many bytes are broadcast + probed natively (zero
# candidate shuffle); above it they stay distributed (probe_cogrouped)
COLLECT_PROBE_MAX_BYTES = 64 << 20


def mark_candidates(candidates: DataFrame, bloom_df: DataFrame,
                    n_buckets: int,
                    distributed: bool | None = None,
                    m_bits: int | None = None,
                    k: int | None = None) -> DataFrame:
    """candidates + a ``_maybe`` boolean from the bloom sidecar.

    Probe strategy: small sidecars are broadcast and probed with native
    expressions (probe_native — no candidate shuffle, no Python, no
    driver transit); large ones stay distributed and cogroup on bucket
    (``distributed=None`` auto-picks from the sidecar's known size).
    Both paths are result-identical (tested)."""
    if distributed is None:
        size = n_buckets * (m_bits // 8) if m_bits else None
        distributed = size is None or size > COLLECT_PROBE_MAX_BYTES
    if distributed:
        return probe_cogrouped(candidates, bloom_df, n_buckets)
    if m_bits is None or k is None:
        row = bloom_df.select("m_bits", "k").limit(1).collect()
        if not row:
            return candidates.withColumn("_maybe", F.lit(False))
        m_bits, k = int(row[0]["m_bits"]), int(row[0]["k"])
    return probe_native(candidates, bloom_df, n_buckets, m_bits, k)


def prefilter_candidates(candidates: DataFrame, bloom_df: DataFrame,
                         n_buckets: int,
                         distributed: bool | None = None,
                         m_bits: int | None = None) -> tuple[DataFrame, DataFrame]:
    """Split candidates into (definitely_unseen, maybe_seen) using the
    bloom sidecar. definitely_unseen needs NO anti-join; maybe_seen
    (true seens + fpp of the rest) proceeds to the exact anti-join."""
    marked = mark_candidates(candidates, bloom_df, n_buckets,
                             distributed=distributed, m_bits=m_bits)
    return (marked.filter(~F.col("_maybe")).drop("_maybe"),
            marked.filter(F.col("_maybe")).drop("_maybe"))
