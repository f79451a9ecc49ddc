"""Deduplication family for large-scale training-data pipelines:

  exact (hash groupBy) · word-set Jaccard pair scoring · MinHash+LSH
  (shingle -> minhash -> band -> bucket self-join) · SimHash

Design for 100 TB: the MinHash signature sweep hashes each shingle
exactly once JVM-side (whole-stage codegen) and shuffles one int64 per
shingle; the 64 components come from a vectorized numpy double-hash
inside a partition-wise mapInPandas (see minhash_signatures for the measured
history). LSH banding turns the O(n²) pair space into a bucket
self-join whose shuffle key is (band_idx, band_hash). SimHash crosses
into a vectorized pandas UDF (bit-level majority vote has no good
Column form), with a per-batch vocabulary cache.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from data_crawler_spark.functions.hashing import xxhash64_str
from data_crawler_spark.operators.text import (WORD_RE, bind_once,
                                               fingerprint_col,
                                               tokens_col)


def _doc_partitions(df: DataFrame, override: int | None = None) -> int:
    """Explicit partition count for the pre-tokenize repartition: AQE's
    byte-based coalescing sees a few MB of text and folds the exchange
    to one partition — but downstream compute per byte (regexp
    tokenize, shingle, hash) is huge, so the exchange must keep the
    cluster's task width regardless of byte size.

    Defaults to ``spark.sql.shuffle.partitions``; a caller that tuned
    that high for unrelated aggregations and is signaturing a tiny
    corpus can pass ``override`` (surfaced as the public functions'
    ``num_partitions``) to avoid near-empty tasks."""
    if override is not None:
        return max(1, int(override))
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


def words_col(text: Column) -> Column:
    return F.array_distinct(tokens_col(text))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact dedup: normalize -> md5 -> keep the min-id representative.
    One shuffle on the content hash; md5 (not xxhash64) so the DuckDB
    oracle can verify value-for-value. The hash IS text.fingerprint_col
    — the one definition batch and streaming dedup both key on."""
    h = fingerprint_col(F.col(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  group_col: str | None = None, threshold: float = 0.8) -> DataFrame:
    """Word-set Jaccard over candidate pairs (id_a < id_b). With
    ``group_col`` the pair space is restricted to same-group (a blocked
    baseline); without it this is the O(n²) reference — use MinHash+LSH
    at scale."""
    # Round-6 shape, measured 40% faster at sf0.1 with identical
    # output: (1) tokenize ONCE into a materialized (id, words, size)
    # table — the two join sides previously each re-ran the regex
    # tokenization; (2) enumerate the pair space over SKINNY
    # (id, size) rows only, so the join never buffers word arrays;
    # (3) lossless size prefilter — the arrays are distinct, so
    # jaccard <= min(|A|,|B|)/max(|A|,|B|), and pairs failing the
    # bound can never reach the threshold (a threshold <= 0 keeps
    # every pair, as before); (4) attach the word arrays to the
    # surviving pairs via two broadcast joins and compute the
    # intersection only there, with |A ∪ B| = |A|+|B|-|A∩B| exactly
    # (one array fold per pair instead of two).
    gcols = [F.col(group_col).alias("g")] if group_col else []
    w = (df.select(F.col(id_col).alias("_id"), *gcols,
                   words_col(F.col(text_col)).alias("w"))
         .withColumn("s", F.size("w"))
         .localCheckpoint(eager=True))
    a = w.select(F.col("_id").alias("id_a"), F.col("s").alias("sa"),
                 *(["g"] if group_col else []))
    b = w.select(F.col("_id").alias("id_b"), F.col("s").alias("sb"),
                 *(["g"] if group_col else []))
    joined = a.join(b, "g") if group_col else a.crossJoin(b)
    pairs = (joined.filter(F.col("id_a") < F.col("id_b"))
             .filter(F.least("sa", "sb").cast("double")
                     >= F.lit(float(threshold)) * F.greatest("sa", "sb")))
    # un-hinted attach: Catalyst/AQE broadcast the word table while it
    # fits (it is the checkpointed frame, sized from real blocks) and
    # degrade to shuffle joins at scale — this is the labeled O(n²)
    # baseline either way
    wa = w.select(F.col("_id").alias("id_a"), F.col("w").alias("w_a"))
    wb = w.select(F.col("_id").alias("id_b"), F.col("w").alias("w_b"))
    attached = pairs.join(wa, "id_a").join(wb, "id_b")
    inter = F.size(F.array_intersect("w_a", "w_b"))
    union = F.col("sa") + F.col("sb") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        attached.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Shared HOF-binding helper (see text.bind_once: HOFs are
# CodegenFallback, so unbound subtrees re-evaluate per element).
_bind = bind_once


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, as native expressions: slide an
    index sequence over the token array and concat_ws each window.
    The token array is _bind-ed so the per-window slice reads a lambda
    variable — NOT a re-tokenization of the document per window."""
    toks = tokens_col(text)

    def sh(t: Column) -> Column:
        idx = F.when(F.size(t) >= n, F.sequence(F.lit(0), F.size(t) - n)) \
               .otherwise(F.expr("array()").cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))))

    return _bind(toks, sh)


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_hashes: int = 64,
                       shingle_n: int = 3,
                       unique_ids: bool = True,
                       num_partitions: int | None = None) -> DataFrame:
    """MinHash signature as an array<bigint>: component j = min over
    shingles of g_j(xxhash64(shingle)), with g_j the Kirsch-
    Mitzenmacher double-hash family g_j(x) = h1(x) + j*h2(x) derived
    via splitmix64 (functions/hashing.py).

    Plan shape for a 10^12-shingle corpus: SHUFFLE-FREE. One input row
    per id means any partitioning is doc-disjoint (a doc's shingles
    come from its single row; explode/project are narrow), so the
    sweep is scan -> tokenize/shingle/xxhash64 in whole-stage codegen
    -> partition-wise numpy/pandas groupby-min inside mapInPandas,
    with a repartition ONLY when the scan is under-partitioned (small
    fixture files). The round-2 formulation (shuffle one int64 per
    shingle keyed by doc) moved n_shingles x 8B > corpus-text bytes
    through the exchange every sweep. Three earlier formulations measured far
    worse: array_min-of-transform per component re-evaluates the
    shingle array 64x (CollapseProject); 64 min-aggregate columns
    allocate 64 boxed cells per shingle row (GC-bound, anti-scaled with
    cores); grouped applyInPandas pays per-GROUP python dispatch (200k
    groups = minutes). Documents with fewer than ``shingle_n`` tokens have no
    shingles and produce no signature row (they cannot be
    shingle-near-dups).
    """
    from data_crawler_spark.functions.hashing import splitmix64_np

    # CONTRACT (``unique_ids=True``, the default): one input row per id
    # (every caller here passes a deduplicated (id, text) table). Then
    # ANY partitioning is doc-disjoint — a doc's shingles come from its
    # single row and explode/project are narrow — so the corpus text
    # only needs a shuffle when the scan is UNDER-partitioned (a small
    # parquet = few/one split): at 100 TB the scan has thousands of
    # splits and the signature sweep is shuffle-FREE; at fixture scale
    # the explicit repartition buys full-width tokenization for one
    # trivially small exchange.
    #
    # ``unique_ids=False`` lifts the contract for callers whose table
    # may hold several rows per id (signature = min over the UNION of
    # the rows' shingle sets): one unconditional hash repartition on
    # id_col co-locates each id's rows, and the per-partition
    # groupby-min is then complete again. That repartition shuffles the
    # corpus text — the price of not knowing the ids are unique.
    src = df.select(F.col(id_col), F.col(text_col))
    parts = _doc_partitions(df, num_partitions)
    if not unique_ids:
        src = src.repartition(parts, id_col)
    elif src.rdd.getNumPartitions() < parts:
        src = src.repartition(parts, id_col)
    ex = src.select(F.col(id_col),
                    F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh"))
    hashed = ex.select(F.col(id_col), F.xxhash64("sh").alias("h"))
    j = np.arange(n_hashes, dtype=np.uint64)

    def sig_partition(batches):
        # partitions are hash-disjoint in id_col, and a doc's shingle
        # rows are CONTIGUOUS within a batch (explode order) — so the
        # per-batch component mins come from ONE minimum.reduceat pass
        # over id-run boundaries instead of a hash groupby of the full
        # n_shingles x 64 frame (round 6; the groupby was ~40% of the
        # signature pass). Runs split by batch boundaries (or
        # non-adjacent multi-row ids under unique_ids=False) repeat an
        # id across the run list; one pandas groupby over the tiny
        # run-level frame (O(docs/partition) rows, not O(shingles))
        # merges them — and is skipped when runs are already unique.
        rids, rmins = [], []
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            h1 = splitmix64_np(h)
            h2 = splitmix64_np(h1) | np.uint64(1)
            with np.errstate(over="ignore"):
                g = (h1[:, None] + j[None, :] * h2[:, None]) \
                    .astype(np.int64)
            ids = pdf[id_col].to_numpy()
            starts = np.concatenate(
                ([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
            rids.append(ids[starts])
            rmins.append(np.minimum.reduceat(g, starts, axis=0))
        if not rids:
            return
        frame = pd.DataFrame(np.concatenate(rmins))
        frame.index = pd.Index(np.concatenate(rids), name=id_col)
        if not frame.index.is_unique:
            frame = frame.groupby(level=0).min()
        yield pd.DataFrame({id_col: frame.index.to_numpy(),
                            "sig": list(frame.to_numpy())})

    id_dt = df.schema[id_col].dataType.simpleString()
    return hashed.mapInPandas(sig_partition,
                              f"{id_col} {id_dt}, sig array<long>")


def banded(sigs: DataFrame, id_col: str = "doc_id",
           n_bands: int = 16, rows_per_band: int = 4) -> DataFrame:
    """(id, sig) -> (id, band, bh): one row per LSH band, band hash =
    xxhash64 over the band's signature components (JVM-side)."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                         for r in range(rows_per_band)]).alias("bh"),
        )
        for b in range(n_bands)
    ])
    return (sigs.select(F.col(id_col), F.explode(bands).alias("bb"))
            .select(id_col, "bb.band", "bb.bh"))


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        n_bands: int = 16, rows_per_band: int = 4,
                        dedup: bool = True) -> DataFrame:
    """Band the signatures and self-join on (band, band_hash): the
    classic s-curve candidate generation. Shuffle key is the bucket, so
    work scales with bucket occupancy, not n².

    ``dedup=False`` skips the distinct (pairs colliding in several
    bands appear once per band): callers whose downstream is naturally
    idempotent per pair — like the verify join in minhash_near_dups —
    dedup the much smaller verified output instead, saving a full
    shuffle+aggregate over the candidate-pair stream.

    The signature frame is materialized once (eager localCheckpoint,
    round 6): the self-join's two differently-aliased sides otherwise
    each re-run the WHOLE upstream signature pipeline (tokenize +
    shingle + hash + the mapInPandas min pass) — measured as a full
    second signature sweep at sf1.0; plan-time exchange reuse does not
    unify the aliased subtrees. Signatures are O(ids x n_hashes x 8B),
    a vanishing fraction of the corpus they summarize."""
    exploded = banded(sigs.localCheckpoint(eager=True),
                      id_col, n_bands, rows_per_band)
    left = exploded.select(F.col(id_col).alias("id_a"), "band", "bh")
    right = exploded.select(F.col(id_col).alias("id_b"), "band", "bh")
    pairs = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return pairs.distinct() if dedup else pairs


def _verify_candidates(df: DataFrame, cands: DataFrame, id_col: str,
                       text_col: str, shingle_n: int,
                       broadcast_max_pairs: int, finalize) -> DataFrame:
    """Exact shingle-overlap verification of an LSH candidate-pair
    stream, shared by minhash_near_dups (Jaccard) and
    containment_pairs (asymmetric containment): re-shingle ONLY the
    documents that appear in a candidate pair (semi-join on the
    candidate id set, then one cached shingle pass), join the shingle
    sets onto the pairs, and hand ``finalize`` a frame with columns
    ``(id_a, id_b, inter, size_a, size_b)``. LSH keeps candidates a
    tiny fraction of the corpus, so this is O(candidates), not two
    more O(corpus) shingle sweeps.

    ``cands`` must already be persisted by the caller; ``finalize``
    must MATERIALIZE its result (localCheckpoint) — the shingle cache
    is released as soon as it returns."""
    # materialize the candidate cache in ONE pass before the verify
    # stage forks it (cand_ids broadcast + verify left side): two
    # branches racing an unfilled cache serialize on block locks and
    # re-run the whole signature pipeline
    n_cands = cands.count()
    cand_ids = (cands.select(F.col("id_a").alias(id_col))
                .unionByName(cands.select(F.col("id_b").alias(id_col)))
                .distinct())
    # broadcast the candidate id set and shingle rows only while the
    # candidate set is verifiably small (the LSH regime this plan is
    # built for: the semi-join then never shuffles the corpus text).
    # "candidates are a tiny fraction" is data-dependent, not
    # guaranteed — a boilerplate-heavy corpus can make the candidate
    # set corpus-scale, where a forced broadcast dies at the 8 GB
    # table cap; past the cutoff the hints drop and Catalyst/AQE
    # pick shuffle joins from measured sizes.
    small = n_cands <= broadcast_max_pairs
    maybe_b = F.broadcast if small else (lambda d: d)
    # persist: BOTH builds below (sh_a / sh_b) drain this one cache
    # instead of each re-running the semi-join + shingle pass over
    # the corpus scan
    sh = (df.join(maybe_b(cand_ids), id_col, "left_semi")
          .select(F.col(id_col),
                  shingles_col(F.col(text_col), shingle_n).alias("sh"))
          .persist())
    stats = (
        cands
        .join(maybe_b(sh.select(F.col(id_col).alias("id_a"),
                                F.col("sh").alias("sh_a"))), "id_a")
        .join(maybe_b(sh.select(F.col(id_col).alias("id_b"),
                                F.col("sh").alias("sh_b"))), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("size_a", F.size("sh_a"))
        .withColumn("size_b", F.size("sh_b"))
    )
    try:
        return finalize(stats)
    finally:
        # in a finally: a verify/localCheckpoint failure must not
        # leave the shingle cache (the largest cached object here)
        # pinned for the rest of the session
        sh.unpersist()


def minhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 64,
                      n_bands: int = 16, threshold: float = 0.7,
                      shingle_n: int = 3,
                      broadcast_max_pairs: int = 2_000_000) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures -> banded
    candidates -> exact shingle-Jaccard verification of candidates
    (the verify join is on the candidate pairs only; see
    _verify_candidates for the shared plan shape). The union size is
    derived arithmetically (|A|+|B|−|A∩B| — the shingle arrays are
    distinct by construction) instead of materializing a union array
    per pair."""
    rows = n_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    # dedup=False: multi-band collisions ride into the verify join
    # (idempotent per pair) and the DISTINCT moves to the verified
    # output — a tiny near-dup pair set instead of the full candidate
    # stream. One wide shuffle+aggregate saved per run.
    cands = lsh_candidate_pairs(sigs, id_col, n_bands, rows,
                                dedup=False).persist()

    def finalize(stats: DataFrame) -> DataFrame:
        uni = F.col("size_a") + F.col("size_b") - F.col("inter")
        verified = (stats
                    .withColumn("jaccard",
                                F.round(F.when(uni > 0,
                                               F.col("inter").cast("double")
                                               / uni)
                                        .otherwise(F.lit(0.0)), 4))
                    .filter(F.col("jaccard") >= threshold))
        # dropDuplicates: collapse multi-band candidate copies (same
        # pair, same jaccard) — over the small verified set, not the
        # candidate stream. localCheckpoint materializes it so the
        # candidate cache can be released before returning — repeated
        # invocations previously accumulated cached candidate blocks.
        return (verified.select("id_a", "id_b", "jaccard")
                .dropDuplicates(["id_a", "id_b"]).localCheckpoint())

    try:
        return _verify_candidates(df, cands, id_col, text_col, shingle_n,
                                  broadcast_max_pairs, finalize)
    finally:
        cands.unpersist()


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 64,
                      n_bands: int = 32, threshold: float = 0.8,
                      shingle_n: int = 3,
                      broadcast_max_pairs: int = 2_000_000) -> DataFrame:
    """Asymmetric containment near-dup detection (Broder 1997's
    containment coefficient): pairs where one document's shingle set
    is mostly inside the other's — the aggregator / quote-farm /
    page-plus-boilerplate relation that symmetric Jaccard under-scores
    (a 200-word article fully quoted inside a 5,000-word roundup has
    C(article→roundup)=1.0 but Jaccard≈0.04).

    Emits ``(id_a, id_b, containment_a, containment_b, jaccard)`` for
    candidate pairs with ``max(containment_a, containment_b) >=
    threshold``, where ``containment_a = |S_a ∩ S_b| / |S_a|`` (the
    fraction of a's shingles also in b). All three values are EXACT —
    computed from the verified shingle sets, not estimated from
    signatures.

    Candidate generation reuses the MinHash/LSH machinery, so recall
    is governed by the JACCARD s-curve: a doc contained in one k×
    its size has Jaccard ≈ 1/k, so the default banding is widened to
    ``n_bands=32`` (rows_per_band=2 at 64 hashes — 50%-collision point
    ≈ (1/32)^(1/2) ≈ 0.18), catching containments down to roughly a 5×
    size ratio. Pairs beyond that ratio need more/wider bands
    (``lsh_tune`` with a lower threshold) — an inherent limit of
    Jaccard-LSH candidate generation, documented rather than hidden.
    Same scale shape as minhash_near_dups: shuffle-free signatures,
    bucket-join candidates, O(candidates) exact verify."""
    rows = n_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, n_bands, rows,
                                dedup=False).persist()

    def finalize(stats: DataFrame) -> DataFrame:
        uni = F.col("size_a") + F.col("size_b") - F.col("inter")
        inter_d = F.col("inter").cast("double")
        verified = (
            stats
            # signature rows only exist for docs with >=1 shingle, so
            # size_a/size_b >= 1 for every candidate; the guards keep
            # the expressions total anyway
            .withColumn("containment_a",
                        F.round(F.when(F.col("size_a") > 0,
                                       inter_d / F.col("size_a"))
                                .otherwise(F.lit(0.0)), 4))
            .withColumn("containment_b",
                        F.round(F.when(F.col("size_b") > 0,
                                       inter_d / F.col("size_b"))
                                .otherwise(F.lit(0.0)), 4))
            .withColumn("jaccard",
                        F.round(F.when(uni > 0, inter_d / uni)
                                .otherwise(F.lit(0.0)), 4))
            .filter(F.greatest("containment_a", "containment_b")
                    >= threshold))
        return (verified.select("id_a", "id_b", "containment_a",
                                "containment_b", "jaccard")
                .dropDuplicates(["id_a", "id_b"]).localCheckpoint())

    try:
        return _verify_candidates(df, cands, id_col, text_col, shingle_n,
                                  broadcast_max_pairs, finalize)
    finally:
        cands.unpersist()


def lsh_tune(threshold: float, n_hashes: int,
             fp_weight: float = 0.5) -> tuple[int, int]:
    """Choose ``(n_bands, rows_per_band)`` for a target Jaccard
    threshold: among all factorizations b·r = n_hashes, minimize the
    weighted false-positive + false-negative mass of the LSH s-curve
    P(candidate | s) = 1 − (1 − s^r)^b (the datasketch/ MMDS §3.4
    optimizer, re-derived from the formula). FP mass = ∫₀^t P(s) ds,
    FN mass = ∫_t^1 (1 − P(s)) ds, midpoint rule on a fixed 1000-point
    grid — deterministic, pure driver-side math, no Spark.

    ``fp_weight`` ∈ (0,1): weight on the false-positive integral
    (1 − fp_weight goes to false negatives). Higher fp_weight → fewer
    candidate pairs to verify exactly; lower → better recall.
    Feeds minhash_near_dups / containment_pairs' (n_hashes, n_bands)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if not 0.0 < fp_weight < 1.0:
        raise ValueError(f"fp_weight must be in (0,1), got {fp_weight}")
    if n_hashes < 2:
        raise ValueError(f"n_hashes must be >= 2, got {n_hashes}")
    grid = (np.arange(1000, dtype=np.float64) + 0.5) / 1000.0
    best: tuple[float, int, int] | None = None
    for r in range(1, n_hashes + 1):
        if n_hashes % r:
            continue
        b = n_hashes // r
        p = 1.0 - (1.0 - grid ** r) ** b
        fp = float(p[grid < threshold].sum()) / 1000.0
        fn = float((1.0 - p)[grid >= threshold].sum()) / 1000.0
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if best is None or err < best[0]:
            best = (err, b, r)
    return best[1], best[2]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (vectorized; per-batch vocab
    cache keeps xxhash64 calls to O(|vocab|), not O(tokens))."""
    import re
    cache: dict[str, int] = {}

    def word_hash(w: str) -> int:
        h = cache.get(w)
        if h is None:
            h = xxhash64_str(w) & ((1 << 64) - 1)
            cache[w] = h
        return h

    out = np.zeros(len(text), dtype=np.int64)
    pat = re.compile(WORD_RE)
    for i, t in enumerate(text):
        if t is None:
            out[i] = 0
            continue
        words = pat.findall(t.lower())
        if not words:
            out[i] = 0
            continue
        hs = np.array([word_hash(w) for w in words], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       unique_ids: bool = True,
                       num_partitions: int | None = None) -> DataFrame:
    """Vectorized 64-bit SimHash, minhash-shaped plan: explode tokens
    (duplicates kept — every occurrence votes, same spec as
    simhash_udf), ONE JVM xxhash64 per token inside codegen, shuffle a
    single int64 per token keyed by document, then a numpy bit-vote in
    a doc-partitioned mapInPandas. No Python-level per-word loop —
    byte-identical to simhash_udf (tested on web1k documents).

    Tokenless / null documents get sim = 0 (the UDF's convention),
    restored by a left join on the id spine."""

    toks = tokens_col(F.col(text_col))
    # repartition raw text by doc BEFORE tokenizing (same rationale as
    # minhash_signatures: text bytes < per-token int64 stream, and the
    # expensive expressions run at full parallelism instead of in the
    # scan task); downstream stays doc-disjoint for the vote merge.
    # same one-row-per-id contract / conditional repartition as
    # minhash_signatures: votes are complete per partition because a
    # doc's tokens come from its single row. ``unique_ids=False``
    # co-locates multi-row ids with an unconditional hash repartition
    # (votes then sum over ALL the id's rows — every occurrence votes).
    src = df.select(F.col(id_col), F.col(text_col))
    parts = _doc_partitions(df, num_partitions)
    if not unique_ids:
        src = src.repartition(parts, id_col)
    elif src.rdd.getNumPartitions() < parts:
        src = src.repartition(parts, id_col)
    ex = src.select(F.col(id_col), F.explode(toks).alias("w"))
    hashed = ex.select(F.col(id_col), F.xxhash64("w").alias("h"))
    shifts = np.arange(64, dtype=np.uint64)

    def vote_partition(batches):
        # partitions are hash-disjoint in id_col; per-batch groupby-sum
        # of the ±1 bit votes, merged once at the end
        parts = []
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
            frame = pd.DataFrame(2 * bits - 1)
            frame.index = pd.Index(pdf[id_col].to_numpy(), name=id_col)
            parts.append(frame.groupby(level=0).sum())
        if not parts:
            return
        votes = pd.concat(parts).groupby(level=0).sum()
        pos = (votes.to_numpy() > 0).astype(np.uint64)
        sim = (pos << shifts[None, :]).sum(axis=1)  # disjoint bits: sum == or
        yield pd.DataFrame({id_col: votes.index.to_numpy(),
                            "sim": sim.astype(np.int64)})

    id_dt = df.schema[id_col].dataType.simpleString()
    sigs = hashed.mapInPandas(vote_partition,
                              f"{id_col} {id_dt}, sim long")
    spine = df.select(id_col) if unique_ids else df.select(id_col).distinct()
    return (spine.join(sigs, id_col, "left")
            .select(F.col(id_col), F.coalesce("sim", F.lit(0)).alias("sim")))


def hamming_near_dups(hashes: DataFrame, id_col: str = "doc_id",
                      hash_col: str = "sim", max_hamming: int = 3,
                      n_chunks: int | None = None) -> DataFrame:
    """EXACT hamming-neighbor pairs over any 64-bit hash column
    (SimHash text signatures, perceptual image hashes, ...) without an
    all-pairs join: split the 64 bits into ``n_chunks`` contiguous
    blocking keys — by pigeonhole, any pair within hamming <=
    n_chunks−1 agrees exactly on at least one chunk — bucket-join on
    (chunk, value), verify bit_count(xor) on the candidates. Exact
    (zero false negatives) whenever ``n_chunks > max_hamming``, which
    the default (max_hamming+1) guarantees; recall is structural, not
    probabilistic, unlike MinHash banding. More chunks = shorter keys
    = bigger buckets, so at high ``max_hamming`` expect the candidate
    stream (the join's enumeration) to grow — the standard tradeoff.

    Input contract: ONE row per id (every in-repo caller passes a
    signature table keyed by id).

    Round-6 plan shape (measured at sf1.0, where 50k templated docs
    enumerate ~530M bucket pairs for 9.3M true neighbors): the
    signature frame is materialized ONCE (eager localCheckpoint —
    before, each join side re-ran the whole upstream pipeline), and the
    candidate stream is consumed entirely INSIDE the join's codegen
    stage: hamming filter first, then multi-chunk collisions are
    dropped by keeping each pair only at its FIRST agreeing chunk — a
    pure function of h_a^h_b, so no ``distinct`` (which previously
    shuffled the full half-billion-row candidate stream) remains.
    Nothing leaves the join but true neighbor rows. (A numpy
    per-bucket XOR/popcount kernel was measured 2-4x SLOWER than the
    streaming sort-merge join here — O(block×bucket) matrix traffic vs
    codegen row streaming — and a SHUFFLE_HASH hint slower still; see
    OPTIMIZATION_r06.md.)"""
    n_chunks = n_chunks if n_chunks is not None else max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"n_chunks must be in [1, 64], got {n_chunks}")
    if n_chunks <= max_hamming:
        raise ValueError(
            f"pigeonhole needs n_chunks > max_hamming for exactness, "
            f"got {n_chunks} <= {max_hamming}")
    base, rem = divmod(64, n_chunks)
    widths = [base + (1 if i < rem else 0) for i in range(n_chunks)]
    offs, o = [], 0
    for w in widths:
        offs.append(o)
        o += w
    h = F.col(hash_col)
    # width 64 (n_chunks=1, the max_hamming=0 exact-dup call): the
    # all-ones mask is -1 as a signed long — 2**64-1 overflows the
    # Java long literal
    masks = [(1 << w) - 1 if w < 64 else -1 for w in widths]
    # one materialization of the (id, hash) table: both join sides read
    # these blocks instead of re-running the upstream pipeline (SimHash
    # votes, pHash decode) once per side — plan-time exchange reuse
    # does not cover the two differently-aliased subtrees
    sigs = hashes.select(F.col(id_col), h).localCheckpoint(eager=True)
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftrightunsigned(h, offs[c])
                 .bitwiseAND(F.lit(masks[c])).alias("ck"))
        for c in range(n_chunks)
    ])
    ex = (sigs.select(F.col(id_col), h.alias("_h"),
                      F.explode(chunks).alias("b"))
          .select(id_col, "_h", "b.chunk", "b.ck"))
    left = ex.select(F.col(id_col).alias("id_a"),
                     F.col("_h").alias("h_a"), "chunk", "ck")
    right = ex.select(F.col(id_col).alias("id_b"),
                      F.col("_h").alias("h_b"), "chunk", "ck")
    xor = F.col("h_a").bitwiseXOR(F.col("h_b"))
    # the pair's first agreeing chunk: never NULL for a surviving pair
    # (hamming <= max_hamming < n_chunks guarantees an agreeing chunk)
    first_chunk = F.when(
        F.shiftrightunsigned(xor, offs[0])
        .bitwiseAND(F.lit(masks[0])) == 0, F.lit(0))
    for c in range(1, n_chunks):
        first_chunk = first_chunk.when(
            F.shiftrightunsigned(xor, offs[c])
            .bitwiseAND(F.lit(masks[c])) == 0, F.lit(c))
    return (left.join(right, ["chunk", "ck"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", F.bit_count(xor))
            .filter(F.col("hamming") <= max_hamming)
            .filter(F.col("chunk") == first_chunk)
            .select("id_a", "id_b", "hamming"))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup: 4 16-bit chunks as blocking keys (any pair
    within hamming<=3 shares at least one exact chunk — pigeonhole), then
    verify hamming distance on candidates via bit_count(xor). The
    blocking is hamming_near_dups (shared with perceptual-hash media
    dedup); n_chunks=4 keeps the historical 16-bit chunk layout — and
    stays exact for any max_hamming <= 3."""
    sh = simhash_signatures(df, id_col, text_col)
    return hamming_near_dups(sh, id_col, "sim", max_hamming,
                             n_chunks=max(4, max_hamming + 1))


# ---------------------------------------------------------------------------
# Exact substring (n-gram span) dedup: find token spans that repeat
# ACROSS documents and cut them out — the "exact substring
# deduplication" step of modern LLM training-data pipelines (publicly
# described in Lee et al. 2021, "Deduplicating Training Data Makes
# Language Models Better"; that paper builds a single-node suffix
# array — here the same semantics at fixed span length n are a pure
# DataFrame plan: position n-grams -> hash groupBy -> covered-position
# rebuild, every stage distributed).
# ---------------------------------------------------------------------------


def ngram_pos_rows(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 8) -> DataFrame:
    """(id, pos, ngram): one row per token position that starts a full
    n-gram, over the normalized token stream (WORD_RE on lowered text —
    the same stream shingles_col uses, so span dedup and MinHash agree
    on what a token is). All native expressions: tokenize once, slide
    an index sequence, posexplode."""
    toks = tokens_col(F.col(text_col))
    # _bind: the window slide must read the token array as a lambda
    # variable, not re-tokenize the document per position
    ng = _bind(toks, lambda t: F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(0), F.size(t) - n),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))),
    ).otherwise(F.expr("array()").cast("array<string>")))
    return df.select(F.col(id_col), F.posexplode(ng).alias("pos", "ngram"))


def duplicate_ngram_spans(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 8,
                          min_docs: int = 2, by: str = "ngram") -> DataFrame:
    """Token n-grams appearing in >= ``min_docs`` DISTINCT documents.

    ``by="ngram"`` groups on the n-gram STRING and returns
    (ngram, n_docs, n_occ, first_doc) — exact, DuckDB-mirrorable (the
    driver entry dd07). ``by="hash"`` returns (ngram_hash, ...) — the
    100 TB path: the one inherent shuffle then moves 8 bytes per token
    position instead of ~8 n-gram words of text, and the map-side
    partial aggregate collapses each partition's repeats before the
    exchange. (xxhash64 collisions could merge two distinct n-grams —
    at 2^-64 per pair this is the standard trade the hash path makes;
    the string path exists precisely for exact verification.)"""
    if by not in ("ngram", "hash"):
        raise ValueError(f"by must be 'ngram' or 'hash', got {by!r}")
    rows = ngram_pos_rows(df, id_col, text_col, n)
    key_name = "ngram" if by == "ngram" else "ngram_hash"
    key = F.col("ngram") if by == "ngram" else F.xxhash64("ngram")
    return (rows.select(F.col(id_col), key.alias(key_name))
            .groupBy(key_name)
            .agg(F.countDistinct(id_col).alias("n_docs"),
                 F.count("*").alias("n_occ"),
                 F.min(id_col).alias("first_doc"))
            .filter(F.col("n_docs") >= min_docs))


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 8,
                           min_docs: int = 2) -> DataFrame:
    """Cut every cross-document duplicate n-gram occurrence out of the
    corpus: positions covered by ANY duplicated n-gram start are
    dropped, the survivors rejoin in order. Returns
    (id, clean_text, n_tokens, n_removed); ``clean_text`` is the
    normalized token stream (lowered WORD_RE tokens — the stream the
    detector matched on) re-joined with single spaces.

    Plan: detect on hashes (duplicate_ngram_spans by="hash"), semi-join
    the position rows against the duplicate-key set (equi-join on one
    int64 — Catalyst broadcasts it while small, shuffles both sides
    keyed on the hash beyond that), explode each start into its n
    covered positions, collect the per-doc covered set (bounded by the
    doc's own token count), and rebuild with a two-arg array filter.
    No stage ever holds more than one document's tokens in one value —
    the covered-set row is O(doc length), same bound as the text
    itself."""
    rows = ngram_pos_rows(df, id_col, text_col, n)
    keyed = rows.select(F.col(id_col), "pos",
                        F.xxhash64("ngram").alias("ngram_hash"))
    dup_keys = (duplicate_ngram_spans(df, id_col, text_col, n, min_docs,
                                      by="hash")
                .select("ngram_hash"))
    starts = keyed.join(dup_keys, "ngram_hash", "left_semi")
    covered = (starts
               .select(F.col(id_col),
                       F.explode(F.sequence(F.col("pos"),
                                            F.col("pos") + (n - 1)))
                       .alias("cp"))
               .groupBy(id_col)
               .agg(F.sort_array(F.collect_set("cp")).alias("cov")))
    toks = tokens_col(F.col(text_col))
    keep = F.filter(toks, lambda t, i: ~F.array_contains(
        F.coalesce(F.col("cov"), F.expr("array()").cast("array<int>")), i))
    return (df.join(covered, id_col, "left")
            .select(F.col(id_col),
                    F.array_join(keep, " ").alias("clean_text"),
                    F.size(toks).cast("long").alias("n_tokens"),
                    F.coalesce(F.size("cov"), F.lit(0)).cast("long")
                    .alias("n_removed")))


def contaminated_doc_ids(docs: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 13,
                         eval_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination detector: ids of corpus documents that
    share at least one exact token ``n``-gram with the eval set (the
    GPT-3/PaLM-style 13-gram collision rule). Returns a one-column
    (id_col) DataFrame.

    Plan shape for 100 TB: the eval set is benchmark-sized (thousands of
    documents), so its distinct n-gram hash set is built once and
    BROADCAST; the corpus side streams (id, xxhash64(ngram)) rows out of
    whole-stage codegen straight into a broadcast left-semi join — the
    corpus is never shuffled, and only the tiny matched-id set crosses a
    (Catalyst-planned, equally tiny) distinct. Matching on int64 hashes
    trades a 2^-64-per-pair false-positive rate for 8-byte keys; a
    decontamination false positive drops one clean doc, the safe
    direction."""
    ev = eval_df.select(F.lit(0).alias("_eid"),
                        F.col(eval_text_col).alias("text"))
    eval_keys = (ngram_pos_rows(ev, "_eid", "text", n)
                 .select(F.xxhash64("ngram").alias("ngram_hash"))
                 .distinct())
    doc_keys = (ngram_pos_rows(docs, id_col, text_col, n)
                .select(F.col(id_col), F.xxhash64("ngram").alias("ngram_hash")))
    return (doc_keys.join(F.broadcast(eval_keys), "ngram_hash", "left_semi")
            .select(id_col).distinct())


def decontaminate(docs: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 13, eval_text_col: str = "text") -> DataFrame:
    """Drop corpus documents that collide with the eval set on any exact
    token ``n``-gram (see contaminated_doc_ids). The contaminated-id set
    is eval-bounded (tiny), so the final anti-join broadcasts it —
    end-to-end the corpus is scanned twice (detector + filter) and
    shuffled zero times."""
    bad = contaminated_doc_ids(docs, eval_df, id_col, text_col, n,
                               eval_text_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")


# ---------------------------------------------------------------------------
# Corpus-wide paragraph dedup (CCNet-style)
# ---------------------------------------------------------------------------

def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n",
                    keep: str = "first",
                    scope_col: str | None = None) -> DataFrame:
    """CCNet-style corpus-WIDE paragraph deduplication (Wenzek et al.
    2020 dedup step): split every document on ``sep``, hash each
    trimmed paragraph, and drop repeated paragraphs across the whole
    corpus — boilerplate (nav bars, cookie banners, license footers)
    disappears from every page that carries it. Documents come back
    with their surviving paragraphs re-joined in original order, plus
    ``paras_removed`` / ``paras_total`` counts (a doc reduced to
    nothing keeps an empty string — filter on ``paras_removed <
    paras_total`` to drop hollowed-out docs).

    ``keep="first"`` keeps the single occurrence with the smallest
    (id, position) per paragraph (one copy survives corpus-wide, the
    CCNet rule); ``keep="none"`` drops every occurrence of any
    paragraph seen ≥2 times. Whitespace-only paragraphs are structural,
    not content — never counted or dropped. Paragraphs compare by
    xxhash64 of the trimmed text (2^-64-per-pair collision merges two
    distinct paragraphs — the trade every hash-keyed dedup here makes).

    ``scope_col`` narrows the dedup universe to groups of that column
    (e.g. the page HOST: per-site boilerplate — nav bars, footers —
    dedups away while legitimate cross-site repeats like quotations
    survive, the RefinedWeb line-dedup scoping). None keeps the
    corpus-wide CCNet rule. Null scope values form NO group (equi-join
    semantics): such docs pass through undeduped — coalesce a scope
    upstream if null hosts must participate.

    100 TB shape: the decision pipeline shuffles only ~20-byte
    (id, pos, hash) rows — paragraph TEXT never rides a shuffle. One
    map-side-partial groupBy(hash) finds counts + first occurrences;
    the drop positions fold back to one small array row per affected
    doc; the only corpus-scale exchange is the final join of docs
    against that drop-list frame on ``id_col`` (AQE broadcasts it when
    the duplicated-doc fraction is small). Rebuild is a doc-local
    two-arg F.filter over the original split — no re-tokenize, no
    per-row Python."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    # F.split takes a Java REGEX while array_join takes a literal —
    # escape the separator so sep='|' (or '.', '+') splits literally
    # instead of between every character
    import re as _re
    paras = F.split(F.col(text_col), _re.escape(sep))
    scope = [scope_col] if scope_col is not None else []
    keys = scope + ["h"]
    rows = (df.select(F.col(id_col), *scope,
                      F.posexplode(paras).alias("pos", "para"))
            .filter(F.trim(F.col("para")) != "")
            .select(id_col, *scope, "pos",
                    F.xxhash64(F.trim(F.col("para"))).alias("h")))
    occ = rows.groupBy(*keys).agg(
        F.count("*").alias("cnt"),
        F.min(F.struct(F.col(id_col).alias("i"),
                       F.col("pos").alias("p"))).alias("first_occ"))
    dup = occ.filter(F.col("cnt") >= 2)
    if keep == "first":
        drops = (rows.join(dup, keys)
                 .filter(~((F.col(id_col) == F.col("first_occ.i"))
                           & (F.col("pos") == F.col("first_occ.p"))))
                 .select(id_col, "pos"))
    else:
        drops = (rows.join(dup.select(*keys), keys, "left_semi")
                 .select(id_col, "pos"))
    drop_lists = drops.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("_drop_pos"))
    out = df.join(drop_lists, id_col, "left")
    dp = F.coalesce(F.col("_drop_pos"),
                    F.expr("array()").cast("array<int>"))
    kept = F.filter(paras, lambda p, i: ~F.array_contains(dp, i))
    non_ws = F.size(F.filter(paras, lambda p: F.trim(p) != ""))
    return (out.withColumn("paras_total", non_ws)
            .withColumn("paras_removed", F.size(dp))
            .withColumn(text_col, F.array_join(kept, sep))
            .drop("_drop_pos"))


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup
# ---------------------------------------------------------------------------

def sig_jaccard_est(sig_a, sig_b, n_hashes: int):
    """Signature-estimated Jaccard: fraction of equal MinHash
    components — the standard O(1)-per-pair estimate used when the
    corpus text is too large to re-shingle for verification."""
    eq = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                         lambda v: v))
    return eq.cast("double") / F.lit(float(n_hashes))


class IncrementalMinHashIndex:
    """Persisted MinHash signature table for O(delta) dedup: a 100 TB
    pipeline deduplicates each new snapshot against the corpus without
    re-signaturing the corpus (the same O(delta) design as the crawl's
    seen/bloom sidecars, plans/crawl.py).

    ``add(delta)`` computes signatures for the DELTA ONLY, appends them
    as a new snapshot version (time-travelable, crash-safe — see
    plans/snapshots.py), and returns near-dup pairs between the delta
    and the whole corpus-so-far via a banded join of delta-bands
    against all-bands: shuffle cost O(delta x n_bands + matching
    buckets), never O(corpus). Pair verification uses the signature-
    estimated Jaccard (sig_jaccard_est) so no corpus text is re-read.
    """

    def __init__(self, spark, state_dir, name: str = "minhash_sigs",
                 id_col: str = "doc_id", n_hashes: int = 64,
                 n_bands: int = 16, shingle_n: int = 3):
        from pyspark.sql.types import (ArrayType, LongType, StructField,
                                       StructType)
        from data_crawler_spark.plans.snapshots import SnapshotTable

        self.id_col = id_col
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.rows_per_band = n_hashes // n_bands
        self.shingle_n = shingle_n
        schema = StructType([
            StructField(id_col, LongType(), False),
            StructField("sig", ArrayType(LongType()), True),
        ])
        self.table = SnapshotTable(spark, state_dir, name, schema)

    def signatures(self) -> DataFrame:
        """Corpus signatures so far (current snapshot)."""
        return self.table.read()

    def add(self, delta: DataFrame, text_col: str = "text",
            threshold: float = 0.7) -> DataFrame:
        """Signature the delta only, commit, and return near-dup pairs
        (id_a < id_b, est_jaccard >= threshold) touching the delta.

        Delta ids must be NEW to the index: the table is append-only,
        so re-adding an id would leave two signature rows (one stale)
        that fan out the verify joins with conflicting estimates. The
        guard is one anti-join of delta ids against the index — an
        id-only scan the banded join below pays anyway. (A re-crawled
        page is an upsert, which this append-only index does not model;
        callers diff their snapshots first — the crawl's frontier
        guarantees url-uniqueness by construction.)"""
        dup = (delta.select(self.id_col)
               .join(self.table.read().select(self.id_col), self.id_col,
                     "left_semi").limit(1).collect())
        if dup:
            raise ValueError(
                f"IncrementalMinHashIndex.add: id {dup[0][0]} is already "
                "in the index (append-only; re-adds would leave stale "
                "duplicate signatures)")
        sigs_delta = minhash_signatures(
            delta, self.id_col, text_col,
            n_hashes=self.n_hashes, shingle_n=self.shingle_n)
        v = self.table.write(sigs_delta, mode="append")
        # band the delta from the COMMITTED segment, not the signature
        # frame: the returned pair DataFrame then has no dependency on
        # the in-session plan, and the one write pass above is the only
        # execution of the signature pipeline (no cache needed)

        all_sigs = self.table.read()
        d_band = banded(self.table.segment_df(v), self.id_col,
                        self.n_bands, self.rows_per_band)
        a_band = banded(all_sigs, self.id_col, self.n_bands, self.rows_per_band)
        cands = (
            d_band.select(F.col(self.id_col).alias("id_a"), "band", "bh")
            .join(a_band.select(F.col(self.id_col).alias("id_b"), "band", "bh"),
                  ["band", "bh"])
            .filter(F.col("id_a") != F.col("id_b"))
            .select(F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b"))
            .distinct()
        )
        s = all_sigs
        pairs = (
            cands
            .join(s.select(F.col(self.id_col).alias("id_a"),
                           F.col("sig").alias("sig_a")), "id_a")
            .join(s.select(F.col(self.id_col).alias("id_b"),
                           F.col("sig").alias("sig_b")), "id_b")
            .withColumn("est_jaccard",
                        F.round(sig_jaccard_est(F.col("sig_a"), F.col("sig_b"),
                                                self.n_hashes), 4))
            .filter(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b", "est_jaccard")
        )
        return pairs


# ---------------------------------------------------------------------------
# Duplicate-cluster extraction: connected components over a near-dup
# pair graph. Pairs tell you WHAT collides; a training-data pipeline
# keeps ONE document per component, so the component id is the useful
# artifact (keep doc_id == cluster_id, drop the rest).
# ---------------------------------------------------------------------------


def connected_components(vertices: DataFrame, edges: DataFrame,
                         id_col: str = "doc_id",
                         src_col: str = "id_a", dst_col: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(id, cluster_id) where cluster_id = min vertex id reachable in the
    undirected graph; singletons map to themselves.

    Min-label propagation WITH pointer jumping: each iteration every
    vertex takes the min of its own label and its neighbors' labels
    (one hash join + partial aggregate), then jumps through its label's
    label (one equi-join of the O(V) label table with itself) —
    pointer jumping halves the remaining label-chain depth, so even an
    adversarial PATH graph converges in O(log diameter) rounds instead
    of O(diameter) (property-tested on a 20k-node path in
    tests/test_dedup.py). Near-dup graphs are clique-like (diameter
    1-3) and converge in 2-3 rounds either way. Per-iteration state is
    one (vertex, label) row per vertex, hash-partitioned — no single
    task ever sees the graph. Labels are min-monotone and always
    vertex ids of the same component, so the fixed point is the
    component min. Raises if ``max_iter`` rounds don't converge — an
    exactness guard, never a silent truncation.
    """
    # localCheckpoint (not persist): each iteration's plan references the
    # previous one's — with plain caching the logical plan still nests
    # one join per iteration and Catalyst analysis blows up on long
    # chains; checkpointing truncates lineage to the materialized blocks
    labels = vertices.select(F.col(id_col).alias("node"),
                             F.col(id_col).alias("comp")).localCheckpoint()
    bidir = (edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
             .unionByName(
                 edges.select(F.col(dst_col).alias("src"),
                              F.col(src_col).alias("dst")))).persist()
    try:
        for _ in range(max_iter):
            neigh = (bidir.join(labels, bidir.src == labels.node)
                     .groupBy(F.col("dst").alias("node"))
                     .agg(F.min("comp").alias("ncomp")))
            stepped = (labels.join(neigh, "node", "left")
                       .select("node", F.col("comp").alias("_old"),
                               F.least("comp", "ncomp").alias("comp")))
            # pointer jump: comp <- label(comp). comp is always a vertex
            # id, and labels are min-monotone (label(c) <= c), so the
            # jump can only lower the label and never leaves the
            # component.
            jump = stepped.select(F.col("node").alias("comp"),
                                  F.col("comp").alias("jcomp"))
            # the change flag rides INTO the checkpoint (round 6): the
            # convergence probe is then a filter over materialized
            # blocks instead of a per-iteration alias-join job
            new_comp = F.coalesce(F.least("jcomp", "comp"),
                                  F.col("comp"))
            stamped = (stepped.join(jump, "comp", "left")
                       .select("node", new_comp.alias("comp"),
                               (new_comp != F.col("_old")).alias("_chg"))
                       .localCheckpoint())
            changed = stamped.filter(F.col("_chg")).limit(1).count()
            labels = stamped.select("node", "comp")
            if changed == 0:
                return labels.select(F.col("node").alias(id_col),
                                     F.col("comp").alias("cluster_id"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    finally:
        bidir.unpersist()


def duplicate_clusters(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", group_col: str | None = None,
                       threshold: float = 0.9) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: components of the exact
    n-gram-Jaccard near-dup graph (jaccard_pairs). The dedup policy
    "keep one per cluster" is then `filter(doc_id == cluster_id)`."""
    edges = jaccard_pairs(df, id_col=id_col, text_col=text_col,
                          group_col=group_col, threshold=threshold)
    return connected_components(df.select(id_col), edges, id_col=id_col)


def cluster_survivors(comps: DataFrame, metrics: DataFrame | None = None,
                      order_by: list | None = None,
                      id_col: str = "doc_id",
                      cluster_col: str = "cluster_id") -> DataFrame:
    """One survivor per duplicate cluster, chosen by ``order_by`` — the
    policy layer over ``connected_components`` output. Published
    pipelines differ here: min-id (this engine's default elsewhere,
    ``filter(id == cluster_id)``) is arbitrary-but-deterministic;
    RefinedWeb keeps the LONGEST member (``[F.desc("n_tokens")]``),
    quality-gated pipelines keep the best-scored one. ``metrics`` (an
    (id, metric...) frame, e.g. ``docs.select(id, n_tokens)``) joins in
    the ordering columns; ``id_col`` ASC is appended so the choice is
    total and deterministic under any partitioning.

    Returns (cluster_col, id_col) — one row per cluster, survivors of
    singleton clusters included (components cover every doc).

    Scale shape: only (id, cluster_id, metric) rows ride the selection
    — never text — and the per-cluster top-1 is the salted two-phase
    ``cap_per_group``, so a corpus-scale boilerplate cluster (millions
    of members behind one template) never funnels through one window
    task.

    ``metrics`` joins LEFT, and metered members ALWAYS outrank
    unmetered ones regardless of the caller's sort direction (a
    has-metric flag is prepended to the order — Spark's asc-nulls-
    FIRST default would otherwise let a missing row beat every real
    score under ``F.asc``): a cluster whose members all lack metrics
    still yields its min-id survivor instead of silently vanishing."""
    from data_crawler_spark.operators.sampling import cap_per_group

    if metrics is None:
        m = comps
        order = order_by
    else:
        m = comps.join(metrics.withColumn("_metered", F.lit(True)),
                       id_col, "left")
        order = [F.desc_nulls_last("_metered")] + list(order_by or [])
    kept = cap_per_group(m, cluster_col, 1, order_by=order,
                         id_col=id_col)
    return kept.select(cluster_col, id_col)


def ngram_novelty(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 8,
                  scope: str = "corpus", by: str = "hash") -> DataFrame:
    """Per-document n-gram novelty — the duplication-exposure signal of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better") as a dataset-card metric next to ``stats.corpus_stats``:
    (id, ngrams_total, ngrams_dup, novelty = 1 − dup/total), where an
    n-gram occurrence counts as duplicated when the same n-gram occurs
    elsewhere. ``scope="corpus"``: at any other position, own document
    included (memorization exposure); ``scope="cross_doc"``: in at
    least one OTHER document (inter-document leakage only). Documents
    with fewer than ``n`` tokens have no n-grams: total 0, novelty
    null.

    Scale shape: the token stream is ``ngram_pos_rows``' (shared with
    span dedup, so the ops agree on tokens); per-(doc, key) partial
    counts collapse map-side before the first exchange, the corpus
    count is one more map-side-partial groupBy over ~24-byte rows, and
    the attribution join + per-doc agg key on the same 8-byte hash —
    text is scanned once and never shuffled. ``by="ngram"`` keeps
    string keys for exact verification (the same 2^-64-collision trade
    ``duplicate_ngram_spans`` documents)."""
    if scope not in ("corpus", "cross_doc"):
        raise ValueError(f"scope must be 'corpus' or 'cross_doc', "
                         f"got {scope!r}")
    if by not in ("ngram", "hash"):
        raise ValueError(f"by must be 'ngram' or 'hash', got {by!r}")
    rows = ngram_pos_rows(df, id_col, text_col, n)
    key = F.xxhash64("ngram") if by == "hash" else F.col("ngram")
    per = (rows.select(F.col(id_col), key.alias("_k"))
           .groupBy(id_col, "_k")
           .agg(F.count("*").cast("long").alias("_c")))
    tot = per.groupBy("_k").agg(F.sum("_c").alias("_ct"))
    dup_pred = (F.col("_ct") > 1) if scope == "corpus" \
        else (F.col("_ct") > F.col("_c"))
    agg = (per.join(tot, "_k")
           .groupBy(id_col)
           .agg(F.sum("_c").alias("ngrams_total"),
                F.sum(F.when(dup_pred, F.col("_c")).otherwise(F.lit(0)))
                .alias("ngrams_dup")))
    return (df.select(id_col).join(agg, id_col, "left")
            .withColumn("ngrams_total",
                        F.coalesce("ngrams_total", F.lit(0)).cast("long"))
            .withColumn("ngrams_dup",
                        F.coalesce("ngrams_dup", F.lit(0)).cast("long"))
            .withColumn("novelty",
                        F.when(F.col("ngrams_total") > 0,
                               1.0 - F.col("ngrams_dup")
                               / F.col("ngrams_total"))))


def contamination_report(docs: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 13, eval_id_col: str = "eval_id",
                         eval_text_col: str = "text") -> DataFrame:
    """Per-eval-ITEM leakage audit — the report side of
    ``decontaminate``: for each benchmark item, how many corpus
    documents share at least one exact token ``n``-gram with it, how
    many distinct n-grams collide, and one example document
    (deterministic min id). One row per eval item, zeros for clean
    items — the table a dataset card publishes and an eval owner
    triages (decontaminate says THAT the corpus is clean; this says
    WHICH eval items were at risk and how badly).

    Plan shape: identical to contaminated_doc_ids — the eval side's
    (eval_id, ngram_hash) set is benchmark-bounded and BROADCAST; the
    corpus streams its hashes out of whole-stage codegen into the
    broadcast inner join, so the corpus is never shuffled. Only the
    matched stream (tiny in practice — contamination is the
    exception) reaches the per-item aggregate."""
    if eval_id_col not in eval_df.columns:
        raise ValueError(
            f"eval_df needs a unique per-item id column "
            f"{eval_id_col!r} (got {eval_df.columns})")
    if eval_id_col == id_col:
        raise ValueError(
            f"eval_id_col must differ from the corpus id column "
            f"(both {id_col!r}) — alias one side first")
    ev = eval_df.select(F.col(eval_id_col),
                        F.col(eval_text_col).alias("_t"))
    ev_keys = (ngram_pos_rows(ev, eval_id_col, "_t", n)
               .select(F.col(eval_id_col),
                       F.xxhash64("ngram").alias("ngram_hash"))
               .distinct())
    doc_keys = (ngram_pos_rows(docs, id_col, text_col, n)
                .select(F.col(id_col),
                        F.xxhash64("ngram").alias("ngram_hash")))
    hits = doc_keys.join(F.broadcast(ev_keys), "ngram_hash")
    rep = (hits.groupBy(eval_id_col)
           .agg(F.countDistinct(id_col).alias("n_docs"),
                F.countDistinct("ngram_hash").alias("n_collision_ngrams"),
                F.min(id_col).alias("example_doc")))
    return (eval_df.select(eval_id_col).join(rep, eval_id_col, "left")
            .withColumn("n_docs",
                        F.coalesce("n_docs", F.lit(0)).cast("long"))
            .withColumn("n_collision_ngrams",
                        F.coalesce("n_collision_ngrams", F.lit(0))
                        .cast("long")))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
# local fingerprinting algorithm)
# ---------------------------------------------------------------------------

def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        w: int = 4) -> DataFrame:
    """(id, pos, fp_hash): winnowed fingerprints over the token k-gram
    hash stream — in every window of ``w`` consecutive k-gram hashes,
    select the minimum (RIGHTMOST occurrence on ties, the paper's
    robust-winnowing rule), then dedupe selections. The guarantee:
    any shared token run of length >= w + k − 1 yields at least one
    shared fingerprint, and nothing shorter than k ever matches —
    position-robust local dedup evidence where MinHash gives only a
    whole-document estimate.

    Everything is doc-local native expressions (tokenize once, hash
    the k-gram windows, slide the w-window min — both arrays bound as
    lambda variables, so per-position work is O(w), not a
    re-tokenization). Output rows are (id, int, long): ~20 bytes per
    fingerprint leave the scan, text never rides a shuffle. Expected
    density is 2/(w+1) fingerprints per token."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    toks = tokens_col(F.col(text_col))
    hashes = _bind(toks, lambda t: F.when(
        F.size(t) >= k,
        F.transform(F.sequence(F.lit(0), F.size(t) - k),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i + 1, k)))),
    ).otherwise(F.expr("array()").cast("array<bigint>")))

    def select_mins(hs: Column) -> Column:
        win_starts = F.when(
            F.size(hs) >= w, F.sequence(F.lit(0), F.size(hs) - w)
        ).otherwise(F.expr("array()").cast("array<int>"))

        def pick(p: Column) -> Column:
            s = F.slice(hs, p + 1, w)
            minv = F.array_min(s)
            # rightmost occurrence of the min inside the window
            # (array_position is 1-based first match; reverse flips it)
            sel = p + (F.lit(w) - F.array_position(F.reverse(s), minv)) \
                .cast("int")
            return F.struct(sel.alias("pos"), minv.alias("fp_hash"))

        return F.array_distinct(F.transform(win_starts, pick))

    fps = _bind(hashes, select_mins)
    return (df.select(F.col(id_col), F.explode(fps).alias("fp"))
            .select(id_col, F.col("fp.pos").alias("pos"),
                    F.col("fp.fp_hash").alias("fp_hash")))


def winnow_overlap_pairs(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 5, w: int = 4,
                         min_shared: int = 2, max_df: int = 50) -> DataFrame:
    """Document pairs sharing winnowed fingerprints: (id_a, id_b,
    shared_fps, overlap) with overlap = shared / min(|fps_a|, |fps_b|)
    — the MOSS containment-style score, so a short document pasted
    into a long one still scores ~1.

    Scale shape: fingerprints appearing in more than ``max_df``
    documents are dropped BEFORE the self-join (boilerplate hashes —
    headers, license blurbs — otherwise explode the pair count
    quadratically; the same document-frequency cap mirror_candidates
    uses), so the join fans out at most max_df² per surviving hash.
    Per-doc totals stay uncapped — the denominator counts the real
    fingerprint mass. Every shuffled row is (hash, id) or smaller."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    distinct = fps.select(F.col(id_col).alias("_id"), "fp_hash").distinct()
    totals = distinct.groupBy("_id").agg(F.count("*").alias("_n"))
    rare = distinct.join(
        distinct.groupBy("fp_hash").agg(F.countDistinct("_id").alias("_df"))
        .filter(F.col("_df") <= max_df).select("fp_hash"),
        "fp_hash", "left_semi")
    a = rare.select(F.col("fp_hash"), F.col("_id").alias("id_a"))
    b = rare.select(F.col("fp_hash"), F.col("_id").alias("id_b"))
    pairs = (a.join(b, "fp_hash").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("shared_fps"))
             .filter(F.col("shared_fps") >= min_shared))
    return (pairs
            .join(totals.select(F.col("_id").alias("id_a"),
                                F.col("_n").alias("_na")), "id_a")
            .join(totals.select(F.col("_id").alias("id_b"),
                                F.col("_n").alias("_nb")), "id_b")
            .select("id_a", "id_b", "shared_fps",
                    F.round(F.col("shared_fps") /
                            F.least("_na", "_nb"), 6).alias("overlap")))
