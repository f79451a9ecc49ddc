"""Streaming MinHash/LSH near-duplicate detection — the ingest-time
counterpart of batch ``dedup.minhash_near_dups``, completing the
streaming cleaning story past exact dedup (streaming/windows.py).

Contract (deliberately the honest streaming trade): the stream flags
LSH **candidates** — a document whose signature collides with an
earlier document in ≥ ``min_collisions`` bands — and keeps the FIRST
arrival per bucket as the representative. There is NO Jaccard
verification on the stream: verifying would mean holding every
retained document's shingle set in state (O(corpus text)); the batch
compaction pass (minhash_near_dups) remains the exact authority, and
ingest-time filtering at banding granularity is exactly what the LSH
parameters (bands × rows) tune the false-positive/negative rates for.

State size: one long per occupied (band, bucket) — O(docs × n_bands),
independent of document length. Signature agreement with batch is
bit-exact: shingling + xxhash64 run as the SAME native expressions,
and the splitmix64 double-hash sweep uses the same numpy kernel
(Spark 4's ANSI mode forbids native wraparound multiply, so the
sweep cannot be a JVM expression — one mapInPandas stage over the
already-hashed shingle arrays keeps the corpus text JVM-side).

Composition: Structured Streaming cannot aggregate after a stateful
operator (the watermark does not propagate through
applyInPandasWithState), so the per-document keep/drop fold is the
batch-side ``neardup_decisions`` helper, applied in foreachBatch or
over the sink table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.dedup import shingles_col

OUT_SCHEMA = ("band int, bh long, doc_id long, ts timestamp, "
              "rep_id long")
STATE_SCHEMA = "rep long"


def shingle_hashes_col(text: Column, shingle_n: int = 3) -> Column:
    """array<long>: xxhash64 of each distinct word shingle — the
    whole-stage-codegen half of the signature (shared tokenizer and
    hash with the batch sweep)."""
    # explicit 1-arg lambda: xxhash64 is variadic, and a variadic
    # callable handed to a HOF misbinds (the repo's F.trim lesson)
    return F.transform(shingles_col(text, shingle_n),
                       lambda s: F.xxhash64(s))


def _sig_of_hashes(hs, j: np.ndarray):
    """One doc's shingle-hash list -> signature (None when the doc has
    no shingles) — the same splitmix64 arithmetic as the batch sweep."""
    from data_crawler_spark.functions.hashing import splitmix64_np

    if hs is None or len(hs) == 0:
        return None
    h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
    h1 = splitmix64_np(h)
    h2 = splitmix64_np(h1) | np.uint64(1)
    with np.errstate(over="ignore"):
        g = h1[:, None] + j[None, :] * h2[:, None]
    return g.astype(np.int64).min(axis=0)


def _with_sig(rows: DataFrame, n_hashes: int) -> DataFrame:
    """(doc_id, ts, _sh) -> (doc_id, ts, _sig). mapInPandas, not a
    pandas UDF expression: a Python UDF expression upstream of
    applyInPandasWithState fails to plan in a streaming query
    ("Cannot evaluate expression: sig(...)"), while a map OPERATOR
    stages cleanly in both batch and streaming."""
    j = np.arange(n_hashes, dtype=np.uint64)

    def fn(batches):
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ts": pdf["ts"],
                "_sig": pdf["_sh"].map(lambda hs: _sig_of_hashes(hs, j)),
            })
            yield out[out["_sig"].notna()]

    return rows.mapInPandas(
        fn, "doc_id long, ts timestamp, _sig array<long>")


def band_rows(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", ts_col: str = "warc_ts",
              n_hashes: int = 64, shingle_n: int = 3,
              n_bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """(id, ts, text) -> one (band, bh, doc_id, ts) row per LSH band —
    the stateless prefix of the streaming index, also runnable on a
    batch frame (parity tests). Documents with no shingles produce no
    rows (they cannot be shingle-near-dups — batch behavior)."""
    if n_bands * rows_per_band > n_hashes:
        raise ValueError(
            f"{n_bands} bands x {rows_per_band} rows > {n_hashes} hashes")
    with_sig = _with_sig(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(ts_col).alias("ts"),
                    shingle_hashes_col(F.col(text_col), shingle_n)
                    .alias("_sh")),
        n_hashes)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("_sig")[b * rows_per_band + r]
                         for r in range(rows_per_band)]).alias("bh"))
        for b in range(n_bands)])
    return (with_sig
            .select("doc_id", "ts", F.explode(bands).alias("_b"))
            .select(F.col("_b.band").alias("band"),
                    F.col("_b.bh").alias("bh"), "doc_id", "ts"))


def streaming_lsh_index(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", ts_col: str = "warc_ts",
                        n_hashes: int = 64, shingle_n: int = 3,
                        n_bands: int = 16,
                        rows_per_band: int = 4) -> DataFrame:
    """The stateful index over a streaming page frame: every band row
    comes back with ``rep_id`` — the id of the FIRST document retained
    in that (band, bucket); ``rep_id == doc_id`` marks the retainer.
    Within a micro-batch, "first" is (ts, doc_id) order, so replays
    are deterministic. State per bucket is one long, forever (no
    timeout: a near-dup of something crawled months ago is still a
    near-dup — callers bounding state should shard the stream by
    corpus epoch instead)."""
    from collections.abc import Iterator

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    rows = band_rows(docs, id_col, text_col, ts_col,
                     n_hashes, shingle_n, n_bands, rows_per_band)

    def gate(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (rep,) = state.get if state.exists else (None,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "doc_id"],
                                  kind="mergesort").reset_index(drop=True)
        if rep is None and len(batch):
            rep = int(batch["doc_id"].iloc[0])
            state.update((rep,))
        batch["rep_id"] = rep
        yield batch[["band", "bh", "doc_id", "ts", "rep_id"]]

    return (rows.groupBy("band", "bh")
            .applyInPandasWithState(gate, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


def neardup_decisions(index_rows: DataFrame,
                      min_collisions: int = 1) -> DataFrame:
    """Fold the index's band rows into per-document decisions:
    ``(doc_id, ts, n_collisions, keep)`` with keep = fewer than
    ``min_collisions`` bands colliding with an EARLIER document. A
    batch helper (foreachBatch / sink-table side) — see the module
    docstring for why the fold cannot ride the stream."""
    hit = (F.col("rep_id") != F.col("doc_id")).cast("int")
    return (index_rows.groupBy("doc_id", "ts")
            .agg(F.sum(hit).alias("n_collisions"))
            .withColumn("keep",
                        F.col("n_collisions") < F.lit(min_collisions)))
