"""Similarity search over an embedding column (array<float>):

  - brute-force cosine top-k (the exact baseline; one crossJoin whose
    left side — the query set — is broadcast)
  - LSH-bucketed ANN (random-hyperplane signatures -> bucket join ->
    rerank) — the 100 TB scale path: candidate generation shuffles on
    the bucket key instead of materializing n_q × n corpus pairs.

Dot products/norms are native ``zip_with``/``aggregate`` expressions
(JVM-side); only the hyperplane signature uses a vectorized pandas UDF
(a matmul, seeded deterministically via splitmix64 — no RNG state).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from data_crawler_spark.functions.hashing import splitmix64_np


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))


def normalize_col(a: Column) -> Column:
    """Unit-normalize an embedding column (zero vectors pass through
    unchanged) — pure JVM array expressions, no Python. The norm is
    BOUND as a lambda variable: HOFs are CodegenFallback, so embedding
    the norm fold in the per-element lambda would re-run the O(d)
    reduction for every component (O(d²) per row)."""
    return F.transform(
        F.array(norm_col(a)),
        lambda n: F.when(n > 0, F.transform(a, lambda x: x / n))
                   .otherwise(a))[0]


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding",
                         out_col: str | None = None) -> DataFrame:
    """ANN pre-processing: add (or replace) a unit-norm embedding column
    plus its original L2 norm. Normalizing once up front turns every
    downstream cosine into a plain dot product — at corpus scale that
    halves the per-pair flops of the rerank stage and lets IVF/LSH
    train on the unit sphere. Map-only: no shuffle, whole-stage
    codegen."""
    out = out_col or vec_col
    c = F.col(vec_col).cast("array<double>")
    return df.withColumn("l2_norm", norm_col(c)).withColumn(out, normalize_col(c))


def _paired_cosine() -> Column:
    """Per-pair cosine from pre-hoisted row norms ``qn``/``cn`` — the
    same double arithmetic as ``cosine_col`` (dot / (|q|·|c|)), but the
    two array folds for the norms run once per ROW below the join
    instead of once per PAIR inside it (~3x fewer folds per pair)."""
    denom = F.col("qn") * F.col("cn")
    return F.when(denom > 0,
                  dot_col(F.col("qv"), F.col("cv")) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k over a SMALL query set (the brute-force baseline).

    Round-6 shape (guide §4.2): the query set is collected (O(queries)
    driver rows — the same smallness contract the old broadcast relied
    on) into a numpy matrix, and each corpus partition scores ALL
    queries with one float64 matmul inside mapInArrow — the old plan
    evaluated an interpreted per-pair aggregate fold (CodegenFallback)
    per (query, row). Ranking, rounding (Spark HALF_UP) and the
    query!=neighbor filter stay JVM-side, so the emitted
    (ids, rank) set is unchanged: matmul vs sequential-fold dots agree
    to ~1e-8 absolute while fixture cosine gaps are >= 3e-5 (and the
    pinned tie-break is on rounded cosine, then neighbor id). A
    degenerate query set (empty, null or ragged vectors) falls back to
    the old all-JVM plan, whose null semantics are pinned by tests.

    NOTE embedding_near_dups deliberately does NOT take this path: its
    emitted cosines are bit-identity-pinned to the JVM fold
    (test_hoisted_cosine_bit_identical) because driver hashes cover
    them."""
    qrows = queries.select(id_col, vec_col).collect()
    dims = {len(r[1]) for r in qrows if r[1] is not None}
    if (not qrows or len(dims) != 1
            or any(r[1] is None for r in qrows)
            or any(v is None for r in qrows for v in r[1])):
        return _cosine_topk_bruteforce_jvm(corpus, queries, k, id_col,
                                           vec_col)
    d = dims.pop()
    qids = [r[0] for r in qrows]
    Q64 = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.sqrt((Q64 * Q64).sum(axis=1))
    m = len(qids)
    id_dt = corpus.schema[id_col].dataType.simpleString()

    def score(batches):
        import pyarrow as pa
        qid_arr = None
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if qid_arr is None:
                qid_arr = pa.array(qids).cast(batch.column(0).type)
            idc = batch.column(0)
            vec = batch.column(1)
            lens = pa.compute.list_value_length(vec) \
                .to_numpy(zero_copy_only=False)
            valid = ~pd.isna(lens)
            valid[valid] &= lens[valid] == d
            if valid.all():
                C64 = (vec.flatten().to_numpy(zero_copy_only=False)
                       .astype(np.float64).reshape(n, d))
            else:
                take = pa.array(np.flatnonzero(valid))
                C64 = (vec.take(take).flatten()
                       .to_numpy(zero_copy_only=False)
                       .astype(np.float64).reshape(-1, d))
            cn = np.sqrt((C64 * C64).sum(axis=1))
            denom = cn[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos_v = np.where(denom > 0, (C64 @ Q64.T) / denom, 0.0)
            cos = np.zeros((n, m), dtype=np.float64)
            cos[valid] = cos_v
            mask = np.repeat(~valid, m)
            yield pa.RecordBatch.from_arrays(
                [idc.take(pa.array(np.repeat(np.arange(n), m))),
                 qid_arr.take(pa.array(np.tile(np.arange(m), n))),
                 pa.array(cos.reshape(-1), mask=mask)],
                ["neighbor_id", "query_id", "cosine"])

    scored = (corpus.select(F.col(id_col), F.col(vec_col))
              .mapInArrow(score,
                          f"neighbor_id {id_dt}, query_id {id_dt}, "
                          f"cosine double")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(F.col("cosine"), 6).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _cosine_topk_bruteforce_jvm(corpus: DataFrame, queries: DataFrame,
                                k: int, id_col: str,
                                vec_col: str) -> DataFrame:
    """The pre-round-6 all-JVM formulation: broadcast crossJoin with
    hoisted norms and an interpreted per-pair dot fold. Kept as the
    fallback for degenerate query sets (empty / null / ragged vectors),
    whose null-propagation semantics it pins."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qv"),
                                   norm_col(F.col(vec_col)).alias("qn")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      norm_col(F.col(vec_col)).alias("cn"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_paired_cosine(), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= t) —
    brute-force reference; route through lsh_topk at corpus scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("qv"),
                  norm_col(F.col(vec_col)).alias("qn"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("cv"),
                  norm_col(F.col(vec_col)).alias("cn"))
    return (
        a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(_paired_cosine(), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file / coarse quantizer) — the other scale path
# ---------------------------------------------------------------------------

def _ivf_centroids(corpus_sample: np.ndarray, n_lists: int,
                   iters: int = 5) -> np.ndarray:
    """Deterministic k-means-ish coarse quantizer: centroids seeded by
    counter-hash selection from the sample, refined with a few Lloyd
    iterations driver-side (the sample is small; the ASSIGNMENT of the
    full corpus is the distributed part)."""
    n = len(corpus_sample)
    sel = (splitmix64_np(np.arange(n_lists, dtype=np.uint64))
           % np.uint64(n)).astype(np.int64)
    cent = corpus_sample[sel].copy()
    for _ in range(iters):
        sims = corpus_sample @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = corpus_sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def _driver_sample(corpus: DataFrame, sample_n: int, id_col: str,
                   vec_col: str) -> np.ndarray | None:
    """Deterministic driver-side training sample (None on an empty
    corpus). Must be partition-layout-independent — a bare limit()
    pulls whichever rows arrive first, so a re-layout of the same
    corpus would train different centroids. Rows are instead taken by
    id order over a hash-filtered slice (both deterministic functions
    of the DATA): the 100 TB shape, where the hash filter prunes the
    collect down to ~sample_n rows scanned. Shared by the coarse
    quantizer and the PQ trainer so composed indexes (ivfpq_topk) pay
    the corpus count + pruned collect once, not per trainer."""
    n_rows = corpus.count()
    if n_rows == 0:
        return None
    mod = max(1, n_rows // sample_n)
    rows = (corpus
            .filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
            .orderBy(id_col).limit(sample_n)
            .select(vec_col).collect())
    return np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in rows])


def _fit_quantizer(corpus: DataFrame, n_lists: int, sample_n: int,
                   id_col: str, vec_col: str,
                   sample: np.ndarray | None = None) -> np.ndarray | None:
    """Train the coarse quantizer on the deterministic driver-side
    sample (see _driver_sample; pass ``sample`` to reuse an
    already-collected one). None on an empty corpus."""
    if sample is None:
        sample = _driver_sample(corpus, sample_n, id_col, vec_col)
    if sample is None:
        return None
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return _ivf_centroids(sample / norms, n_lists)


def ivf_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """vector -> its ``n_probe`` nearest coarse lists (array<int>)."""
    cent = centroids

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ cent.T
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return assign


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 16, n_probe: int = 4, sample_n: int = 2000,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into inverted lists, probe
    each query against its ``n_probe`` nearest lists, rerank exactly
    within the probed lists. The distributed shape is an equi-join on
    the list id — same shuffle story as LSH, but data-adaptive.

    The quantizer trains on a driver-side sample (deterministic
    counter-hash seeding, no RNG state). The sample itself must be
    partition-layout-independent too — a bare limit() pulls whichever
    rows arrive first, so a re-layout of the same corpus would train
    different centroids and emit different neighbors. Rows are instead
    taken by id order over a hash-filtered slice (both deterministic
    functions of the DATA): the 100 TB shape, where the hash filter
    prunes the collect down to ~sample_n rows scanned, not the corpus.
    """
    cent = _fit_quantizer(corpus, n_lists, sample_n, id_col, vec_col)
    if cent is None:
        # empty corpus: empty result with the output schema (the join
        # path would crash np.stack on a zero-row sample)
        return corpus.sparkSession.createDataFrame(
            [], _topk_schema(corpus, queries, id_col, "cosine"))

    c_assign = ivf_assign_udf(cent, n_probe=1)
    q_assign = ivf_assign_udf(cent, n_probe=n_probe)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      norm_col(F.col(vec_col)).alias("cn"),
                      F.explode(c_assign(F.col(vec_col))).alias("list_id"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       norm_col(F.col(vec_col)).alias("qn"),
                       F.explode(q_assign(F.col(vec_col))).alias("list_id"))
    # each corpus row lands in EXACTLY ONE inverted list (c_assign probes
    # 1) and a query's n_probe lists are distinct argsort positions, so
    # (query_id, neighbor_id) pairs out of the join are already unique —
    # no dedup shuffle needed between the join and the rerank window.
    scored = (
        q.join(c, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_paired_cosine(), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — the scale path
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes from counter hashes
    (sum of 4 uniforms, CLT-ish — no RNG state)."""
    n = dim * n_planes * 4
    u = splitmix64_np(np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003))
    g = (u.astype(np.float64) / 2.0**64).reshape(dim * n_planes, 4).sum(axis=1) - 2.0
    return g.reshape(n_planes, dim)


def lsh_signatures_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """One array<bigint> of ``n_tables`` bucket signatures per vector —
    OR-amplification: tables trade precision for recall, AND-ing planes
    within a table trades it back."""
    tables = [_hyperplanes(dim, n_planes, seed + 7919 * t)
              for t in range(n_tables)]
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(m), len(tables)), dtype=np.int64)
        for t, planes in enumerate(tables):
            bits = (m @ planes.T) > 0
            # table index in the high bits keeps buckets disjoint per table
            out[:, t] = (bits * weights).sum(axis=1) + (t << 48)
        return pd.Series(list(out))

    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_planes: int = 4, n_tables: int = 16, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: bucket corpus + queries by multi-table hyperplane signatures
    (explode -> equi-join on bucket -> distinct candidates), rerank
    exactly within candidates. Recall vs brute force is property-tested
    (tests/test_similarity.py); at scale the crossJoin disappears in
    favor of a shuffle keyed on the bucket."""
    sig = lsh_signatures_udf(dim, n_planes, n_tables)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      norm_col(F.col(vec_col)).alias("cn"),
                      F.explode(sig(F.col(vec_col))).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       norm_col(F.col(vec_col)).alias("qn"),
                       F.explode(sig(F.col(vec_col))).alias("bucket"))
    # score per COLLISION, then dedup the (ids, cosine) rows: a pair
    # colliding in several tables is scored each time (deterministic,
    # idempotent — one 64-mult dot per collision), but the dedup
    # shuffle then moves 24B/row instead of the two full vectors
    # (~1KB/row) it would carry deduping candidates before scoring —
    # the same score-then-dedup shape as minhash_near_dups' dedup=False
    # candidate stream.
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_paired_cosine(), 6).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# SemDeDup — semantic (embedding-space) deduplication
# ---------------------------------------------------------------------------

def ivf_assign_sim_udf(centroids: np.ndarray):
    """vector -> struct(list_id, centroid_sim): the single nearest
    coarse list plus the cosine to its centroid (the quantity
    SemDeDup's keep-rule ranks on)."""
    cent = centroids

    @pandas_udf("struct<list_id:int, centroid_sim:double>")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ cent.T
        best = sims.argmax(axis=1)
        return pd.DataFrame({
            "list_id": best.astype(np.int32),
            "centroid_sim": sims[np.arange(len(m)), best],
        })

    return assign


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_lists: int = 16, sample_n: int = 2000,
                   max_iter: int = 25) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): deduplicate a corpus in EMBEDDING
    space — cluster with a coarse k-means quantizer, call within-cluster
    pairs above ``threshold`` cosine semantic duplicates, and keep ONE
    representative per duplicate group: the member with the LOWEST
    cosine to its cluster centroid (the paper's keep-farthest-from-
    centroid rule; ties break to the smallest id). Emits one row per
    input doc: (id, list_id, centroid_sim, dup_group, semdedup_keep) —
    survivors are ``filter(semdedup_keep)``.

    Duplicate groups are CONNECTED COMPONENTS of the within-list
    near-dup graph (dedup.connected_components — min-label propagation
    with pointer jumping), so chains of pairwise-similar docs collapse
    to one survivor, like the text-side MinHash clusters.

    100 TB shape: quantizer trains on a deterministic bounded
    driver-side sample (_fit_quantizer); assignment is one vectorized
    pandas UDF pass; candidate pairs come from an equi-join on list_id
    — never a global crossJoin. The within-list pairing is O(list²)
    per list, which is the SemDeDup design point: size ``n_lists``
    proportional to the corpus (the paper uses 10^5 clusters for
    LAION-scale) so lists stay bounded; every shuffle is keyed
    (list_id, then the O(V) component rows). Exactness within a list is
    total — the quantizer only bounds RECALL across lists, the same
    trade ivf_topk makes."""
    cent = _fit_quantizer(df, n_lists, sample_n, id_col, vec_col)
    spark = df.sparkSession
    if cent is None:
        id_t = df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{id_col} {id_t}, list_id int, centroid_sim double, "
                f"dup_group {id_t}, semdedup_keep boolean")
    assign = ivf_assign_sim_udf(cent)
    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        assign(F.col(vec_col)).alias("a")
    ).select(id_col, vec_col, "a.list_id",
             F.round(F.col("a.centroid_sim"), 6).alias("centroid_sim"))
    assigned = assigned.persist()
    try:
        a = assigned.select(F.col("list_id"),
                            F.col(id_col).alias("id_a"),
                            F.col(vec_col).alias("qv"),
                            norm_col(F.col(vec_col)).alias("qn"))
        b = assigned.select(F.col("list_id"),
                            F.col(id_col).alias("id_b"),
                            F.col(vec_col).alias("cv"),
                            norm_col(F.col(vec_col)).alias("cn"))
        edges = (a.join(b, "list_id")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b",
                         F.round(_paired_cosine(), 6).alias("cosine"))
                 .filter(F.col("cosine") >= threshold)
                 .select("id_a", "id_b"))
        from data_crawler_spark.operators.dedup import connected_components
        comp = connected_components(assigned.select(id_col), edges,
                                    id_col=id_col, max_iter=max_iter)
        # paper keep-rule: per group, the member least similar to its
        # centroid survives (min centroid_sim, then min id)
        ranked = (assigned.join(comp, id_col)
                  .withColumnsRenamed({"cluster_id": "dup_group"}))
        rep = (ranked.groupBy("dup_group")
               .agg(F.min(F.struct("centroid_sim", id_col)).alias("m"))
               .select("dup_group", F.col(f"m.{id_col}").alias("rep_id")))
        out = (ranked.join(rep, "dup_group")
               .select(id_col, "list_id", "centroid_sim", "dup_group",
                       (F.col(id_col) == F.col("rep_id"))
                       .alias("semdedup_keep")))
        # materialize before releasing the assignment cache: the CC
        # labels are already checkpointed, this pins the final join
        return out.localCheckpoint()
    finally:
        assigned.unpersist()


def cluster_corpus(df: DataFrame, n_clusters: int = 16,
                   sample_n: int = 2000, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Topic-cluster a corpus in embedding space: every input row plus
    ``cluster_id`` (int) and ``centroid_sim`` (cosine to its centroid)
    — the curation primitive behind cluster-balanced data mixes
    (DataComp-LM-style topic diversity) and per-topic inspection.
    Compose downstream with the existing samplers, e.g.
    ``sampling.sample_corpus_mixture(out, group_col="cluster_id",
    temperature=T)`` to flatten topic skew, or
    ``sampling.cap_per_group(out, "cluster_id", k)`` for a hard
    per-topic cap.

    Same machinery as ivf_topk/semantic_dedup: the quantizer trains on
    a deterministic, partition-layout-independent driver-side sample
    (_fit_quantizer), assignment is ONE vectorized Arrow pass over the
    corpus — no shuffle at all (the result is a pure map of the input;
    plan-tested). ``cluster_id`` is stable for a given (corpus,
    n_clusters, sample_n) regardless of layout. Empty corpus returns
    typed null columns."""
    cent = _fit_quantizer(df, n_clusters, sample_n, id_col, vec_col)
    if cent is None:
        return (df.withColumn("cluster_id", F.lit(None).cast("int"))
                .withColumn("centroid_sim", F.lit(None).cast("double")))
    assign = ivf_assign_sim_udf(cent)
    a = assign(F.col(vec_col))
    return (df.withColumn("_a", a)
            .select(*df.columns,
                    F.col("_a.list_id").alias("cluster_id"),
                    F.round(F.col("_a.centroid_sim"), 6)
                    .alias("centroid_sim")))


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
# embedding STORAGE scale path: a dim-d float32 vector compresses to
# n_subspaces uint8-sized codes (d=768 → 32 bytes at m=32: 96x), and
# top-k runs over the codes with per-query lookup tables (asymmetric
# distance computation) — the corpus vectors are never decompressed
# row-by-row, let alone shipped.
# ---------------------------------------------------------------------------

def _kmeans(sample: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic plain k-means (counter-hash seeding, Lloyd) —
    UNLIKE _ivf_centroids this does not project onto the unit sphere:
    PQ subvectors are not unit vectors and quantize in raw space."""
    n = len(sample)
    sel = (splitmix64_np(np.arange(k, dtype=np.uint64))
           % np.uint64(n)).astype(np.int64)
    cent = sample[sel].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def fit_pq(corpus: DataFrame, n_subspaces: int = 8,
           n_centroids: int = 256, sample_n: int = 2000,
           id_col: str = "vec_id", vec_col: str = "embedding",
           sample: np.ndarray | None = None) -> np.ndarray | None:
    """Train PQ codebooks on the same deterministic, partition-layout-
    independent driver-side sample _fit_quantizer uses (_driver_sample;
    pass ``sample`` to reuse an already-collected one). Returns
    ``(n_subspaces, n_centroids, sub_dim)`` (None on an empty corpus);
    the embedding dim must divide evenly into ``n_subspaces``.
    Codebooks are ≤ a few MB — closure-shippable."""
    if sample is None:
        sample = _driver_sample(corpus, sample_n, id_col, vec_col)
    if sample is None:
        return None
    dim = sample.shape[1]
    if dim % n_subspaces != 0:
        raise ValueError(
            f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    k = min(n_centroids, len(sample))
    return np.stack([
        _kmeans(np.ascontiguousarray(sample[:, s * sub:(s + 1) * sub]), k)
        for s in range(n_subspaces)])


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              out_col: str = "pq_code") -> DataFrame:
    """Append ``out_col`` (array<int>, one centroid id per subspace)
    plus ``recon_norm`` (the L2 norm of the RECONSTRUCTED vector —
    the denominator asymmetric cosine needs; storing it costs one
    float and saves re-deriving it per query). One vectorized Arrow
    pass, no shuffle; at m subspaces the stored code is m bytes where
    the input was 4·dim — the 100 TB embedding table becomes
    cheap enough to broadcast-ship per executor."""
    cb = codebooks
    m, k, sub = cb.shape

    @pandas_udf("struct<code:array<int>, recon_norm:double>")
    def enc(vecs: pd.Series) -> pd.DataFrame:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(X), m), dtype=np.int32)
        recon = np.empty_like(X)
        for s in range(m):
            xs = X[:, s * sub:(s + 1) * sub]
            d2 = ((xs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            c = d2.argmin(axis=1)
            codes[:, s] = c
            recon[:, s * sub:(s + 1) * sub] = cb[s][c]
        return pd.DataFrame({
            "code": list(codes),
            "recon_norm": np.linalg.norm(recon, axis=1)})

    out = df.withColumn("_pq", enc(F.col(vec_col)))
    return (out.select(*df.columns,
                       F.col("_pq.code").alias(out_col),
                       F.round(F.col("_pq.recon_norm"), 9)
                       .alias("recon_norm")))


def _query_luts(queries: DataFrame, codebooks: np.ndarray,
                id_col: str, vec_col: str):
    """Shared ADC query-side prep for pq_topk/ivfpq_topk: collect the
    queries in id order and build (q_ids, Q, qn, lut) with
    LUT[q, s, c] = query_q's subvector s · codebook[s][c] and the
    zero-norm guard applied once. Returns None when there are no
    queries (the callers early-return their empty frame)."""
    m, _, sub = codebooks.shape
    q_rows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    if not q_rows:
        return None
    q_ids = [r[id_col] for r in q_rows]
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                  for r in q_rows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    lut = np.stack([Q[:, s * sub:(s + 1) * sub] @ codebooks[s].T
                    for s in range(m)], axis=1)
    return q_ids, Q, qn, lut


def pq_topk(codes: DataFrame, queries: DataFrame,
            codebooks: np.ndarray, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            code_col: str = "pq_code") -> DataFrame:
    """Approximate cosine top-k over PQ CODES (asymmetric distance:
    exact query subvectors × quantized corpus): per query, the dot
    product against every corpus vector collapses to m table lookups —
    LUT[s][c] = q_s · codebook[s][c], score = Σ_s LUT[s][code_s] —
    so the scan touches m bytes per corpus row and never reconstructs
    a vector. Returns (query_id, neighbor_id, adc_cosine, rank), the
    brute-force output shape with the same total-order tie-break.

    Scale shape: the query LUTs (n_q × m × n_centroids doubles) ride
    the UDF closure like the LSH hyperplanes; ONE Arrow pass over the
    code table emits (query, neighbor, score) for all queries, the
    per-query window takes top-k. Zero-norm reconstructions score 0
    (the cosine_col convention)."""
    m = codebooks.shape[0]
    prep = _query_luts(queries, codebooks, id_col, vec_col)
    if prep is None:
        return codes.sparkSession.createDataFrame(
            [], _topk_schema(codes, queries, id_col))
    q_ids, _, qn, lut = prep

    @pandas_udf("array<double>")
    def adc(code: pd.Series, rnorm: pd.Series) -> pd.Series:
        C = np.stack([np.asarray(c, dtype=np.int64) for c in code])
        n = len(C)
        dots = np.zeros((n, len(q_ids)))
        for s in range(m):
            # lut[:, s, :][:, C[:, s]] -> (n_q, n); transpose to (n, n_q)
            dots += lut[:, s, :][:, C[:, s]].T
        denom = np.asarray(rnorm, dtype=np.float64)[:, None] * qn[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, dots / denom, 0.0)
        return pd.Series(list(np.round(cos, 6)))

    scored = (codes
              .withColumn("_s", adc(F.col(code_col), F.col("recon_norm")))
              .select(F.col(id_col).alias("neighbor_id"),
                      F.posexplode("_s").alias("_qi", "adc_cosine")))
    qmap = F.array(*[F.lit(q) for q in q_ids])
    scored = (scored
              .withColumn("query_id", qmap[F.col("_qi")])
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id", "adc_cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_lists: int = 16, n_probe: int = 4,
               n_subspaces: int = 8, n_centroids: int = 256,
               sample_n: int = 2000, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ (the FAISS index architecture, Jégou et al. 2011 §V, as
    a DataFrame plan): coarse-quantize the corpus into inverted lists,
    PQ-compress every vector to ``n_subspaces`` codes, and answer
    top-k by scanning ONLY the probed lists' codes with per-query
    lookup tables. Combines the two scale levers this module ships
    separately — IVF prunes the scan to n_probe/n_lists of the corpus,
    PQ shrinks what remains to m bytes/row — which is how
    billion-vector indexes actually run.

    Distributed shape: list assignment + PQ encoding are ONE Arrow
    pass each (no shuffle); the probe step broadcast-joins the tiny
    (list_id, query_idx) pair set against the code table, so a code
    row is replicated only for the queries actually probing its list;
    scoring is a vectorized gather ``Σ_s LUT[qidx, s, code_s]`` with a
    row-varying query index (exact query subvectors × quantized
    corpus — asymmetric, codes quantize RAW vectors, not residuals: a
    documented simplification that keeps pq_encode shared). One
    window takes the per-query top-k with the brute-force tie-break.
    Accuracy = IVF recall (missed lists) × PQ distortion; both knobs
    are explicit."""
    sample = _driver_sample(corpus, sample_n, id_col, vec_col)
    cent = _fit_quantizer(corpus, n_lists, sample_n, id_col, vec_col,
                          sample=sample)
    if cent is None:
        return corpus.sparkSession.createDataFrame(
            [], _topk_schema(corpus, queries, id_col))
    cb = fit_pq(corpus, n_subspaces, n_centroids, sample_n,
                id_col, vec_col, sample=sample)
    codes = _encode_codes(corpus, cent, cb, id_col, vec_col)
    return _ivfpq_query(codes, cent, cb, queries, k, n_probe,
                        id_col, vec_col)


def _encode_codes(df: DataFrame, cent: np.ndarray, cb: np.ndarray,
                  id_col: str, vec_col: str) -> DataFrame:
    """The single IVF-PQ ENCODE path (list assignment + PQ codes, one
    Arrow pass, no shuffle) — shared by ivfpq_topk and AnnIndex so the
    two can never desynchronize on the code contract."""
    assign = ivf_assign_udf(cent, 1)
    return pq_encode(
        df.withColumn("_list", assign(F.col(vec_col))[0]),
        cb, id_col, vec_col).select(id_col, "_list", "pq_code",
                                    "recon_norm")


def _topk_schema(corpus: DataFrame, queries: DataFrame, id_col: str,
                 score_col: str = "adc_cosine"):
    """Empty top-k result schema with query/neighbor id types taken
    from the actual frames (string URL keys are the realistic id at
    crawl scale — a hardcoded long would mis-type them)."""
    from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                   StructType)
    return StructType([
        StructField("query_id", queries.schema[id_col].dataType),
        StructField("neighbor_id", corpus.schema[id_col].dataType),
        StructField(score_col, DoubleType()),
        StructField("rank", IntegerType())])


def _ivfpq_query(codes: DataFrame, cent: np.ndarray, cb: np.ndarray,
                 queries: DataFrame, k: int, n_probe: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """The IVF-PQ QUERY path over an already-encoded code table
    (``id_col``, ``_list``, ``pq_code``, ``recon_norm``) — shared by
    ``ivfpq_topk`` (build-and-query in one call) and ``AnnIndex.topk``
    (query a persisted index). See ivfpq_topk for the plan shape."""
    m = cb.shape[0]
    prep = _query_luts(queries, cb, id_col, vec_col)
    if prep is None:
        return codes.sparkSession.createDataFrame(
            [], _topk_schema(codes, queries, id_col))
    q_ids, Q, qn, lut = prep
    # each query's n_probe nearest lists, as a tiny broadcast frame
    qunit = Q / qn[:, None]
    sims = qunit @ cent.T
    probe = np.argsort(-sims, axis=1)[:, :n_probe]
    spark = codes.sparkSession
    pairs = spark.createDataFrame(
        [(int(probe[qi, p]), qi) for qi in range(len(q_ids))
         for p in range(probe.shape[1])],
        "_list int, _qi int")

    @pandas_udf("double")
    def adc_one(code: pd.Series, rnorm: pd.Series,
                qidx: pd.Series) -> pd.Series:
        C = np.stack([np.asarray(c, dtype=np.int64) for c in code])
        qi = np.asarray(qidx, dtype=np.int64)
        dots = np.zeros(len(C))
        for s in range(m):
            dots += lut[qi, s, C[:, s]]
        denom = np.asarray(rnorm, dtype=np.float64) * qn[qi]
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(np.round(
                np.where(denom > 0, dots / denom, 0.0), 6))

    qmap = F.array(*[F.lit(q) for q in q_ids])
    scored = (codes.join(F.broadcast(pairs), "_list")
              .withColumn("adc_cosine",
                          adc_one(F.col("pq_code"), F.col("recon_norm"),
                                  F.col("_qi")))
              .withColumn("query_id", qmap[F.col("_qi")])
              .filter(F.col("query_id") != F.col(id_col))
              .select("query_id", F.col(id_col).alias("neighbor_id"),
                      "adc_cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


class AnnIndex:
    """Persistent IVF-PQ index: build ONCE over the corpus (the
    expensive part — quantizer/codebook training plus one Arrow encode
    pass over the full embedding table), commit the artifacts as
    snapshot tables, and answer any number of later query batches by
    loading only the tiny model (n_lists + m·k centroid rows) and the
    m-bytes/row code table. This is the serving shape a 100 TB corpus
    actually needs — rebuilding quantizers per query batch re-reads
    the whole embedding table; an index amortizes it to once per
    corpus version, and ``add()`` keeps day-2 deltas O(delta) (the
    IncrementalMinHashIndex pattern).

    Layout under ``state_dir``: ``{name}_model`` (centroids, PQ
    codebooks, a JSON meta row — a few thousand tiny rows) and
    ``{name}_codes`` ((id, _list, pq_code, recon_norm) — versioned,
    crash-safe, time-travelable via plans/snapshots.py). The model
    commit is the ATOMIC pointer swap for the whole index: its meta
    row pins the codes VERSION it was trained/extended against, and
    readers open exactly that version — a crash between the codes
    write and the model write (build or add) leaves the old
    model+old-codes pairing fully consistent, never old codebooks
    scoring new codes.
    """

    _MODEL_DDL = ("kind string, i int, j int, vec array<double>, "
                  "s string")

    def __init__(self, spark, state_dir, name: str = "ann"):
        """Open an EXISTING index (see ``AnnIndex.build``). Raises if
        ``state_dir`` holds no committed model."""
        import json as _json

        from pyspark.sql.types import StructType, _parse_datatype_string

        from data_crawler_spark.plans.snapshots import SnapshotTable

        self.spark = spark
        self._model = SnapshotTable(
            spark, state_dir, f"{name}_model",
            _parse_datatype_string(self._MODEL_DDL))
        rows = self._model.read().collect()
        meta_s = next((r.s for r in rows if r.kind == "meta"), None)
        if meta_s is None:
            raise ValueError(
                f"no committed ANN index under {state_dir}/{name}_model "
                f"— build one with AnnIndex.build(...)")
        meta = _json.loads(meta_s)
        self.id_col, self.vec_col = meta["id_col"], meta["vec_col"]
        cents = sorted((r for r in rows if r.kind == "centroid"),
                       key=lambda r: r.i)
        self.cent = np.array([r.vec for r in cents])
        cbs = sorted((r for r in rows if r.kind == "codebook"),
                     key=lambda r: (r.i, r.j))
        m, k = meta["n_subspaces"], meta["n_centroids_fit"]
        self.cb = np.array([r.vec for r in cbs]).reshape(
            m, k, len(cbs[0].vec))
        # .get: a meta row written before version pinning existed opens
        # at the latest codes version (the old behavior) instead of
        # crashing with a KeyError
        self._codes_version = meta.get("codes_version")
        self._codes = SnapshotTable(
            spark, state_dir, f"{name}_codes",
            StructType.fromJson(meta["codes_schema"]))

    @classmethod
    def build(cls, corpus: DataFrame, state_dir, name: str = "ann", *,
              n_lists: int = 16, n_subspaces: int = 8,
              n_centroids: int = 256, sample_n: int = 2000,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> "AnnIndex":
        """Train the coarse quantizer + PQ codebooks on the shared
        deterministic driver sample, encode the WHOLE corpus in one
        Arrow pass (no shuffle), and commit both artifacts (codes
        first; the model commit is the atomic publish point). Returns
        the opened index."""
        from data_crawler_spark.plans.snapshots import SnapshotTable

        spark = corpus.sparkSession
        sample = _driver_sample(corpus, sample_n, id_col, vec_col)
        if sample is None:
            raise ValueError("cannot build an ANN index over an empty "
                             "corpus")
        cent = _fit_quantizer(corpus, n_lists, sample_n, id_col,
                              vec_col, sample=sample)
        cb = fit_pq(corpus, n_subspaces, n_centroids, sample_n,
                    id_col, vec_col, sample=sample)
        codes = _encode_codes(corpus, cent, cb, id_col, vec_col)

        codes_tbl = SnapshotTable(spark, state_dir, f"{name}_codes",
                                  codes.schema)
        codes_tbl.write(codes, mode="overwrite")
        cls._publish_model(spark, state_dir, name, cent, cb,
                           id_col, vec_col, codes.schema.jsonValue(),
                           codes_tbl.current_version())
        return cls(spark, state_dir, name)

    @classmethod
    def _publish_model(cls, spark, state_dir, name, cent, cb,
                       id_col, vec_col, codes_schema,
                       codes_version) -> None:
        """Overwrite-commit the model table — the index's single
        atomic publish point. The meta row pins the codes version the
        model pairs with."""
        import json as _json

        from pyspark.sql.types import _parse_datatype_string

        from data_crawler_spark.plans.snapshots import SnapshotTable

        meta = {"id_col": id_col, "vec_col": vec_col,
                "n_subspaces": int(cb.shape[0]),
                "n_centroids_fit": int(cb.shape[1]),
                "codes_schema": codes_schema,
                "codes_version": int(codes_version)}
        model_rows = (
            [("meta", 0, 0, [], _json.dumps(meta))]
            + [("centroid", i, 0, [float(x) for x in cent[i]], None)
               for i in range(cent.shape[0])]
            + [("codebook", s, j, [float(x) for x in cb[s, j]], None)
               for s in range(cb.shape[0]) for j in range(cb.shape[1])])
        model_tbl = SnapshotTable(
            spark, state_dir, f"{name}_model",
            _parse_datatype_string(cls._MODEL_DDL))
        model_tbl.write(spark.createDataFrame(model_rows,
                                              cls._MODEL_DDL),
                        mode="overwrite")

    def add(self, delta: DataFrame) -> None:
        """Encode ``delta`` with the FROZEN quantizer/codebooks,
        append-commit the codes, then republish the model meta pinning
        the new codes version — O(delta), the corpus is never re-read,
        and a crash between the two commits leaves readers on the old
        consistent pairing. The caller owns id uniqueness (a re-added
        id would answer twice); heavy distribution drift degrades
        recall until a ``build`` retrain."""
        self._codes.write(_encode_codes(delta, self.cent, self.cb,
                                        self.id_col, self.vec_col),
                          mode="append")
        v = self._codes.current_version()
        self._publish_model(self.spark, self._model.dir.parent,
                            self._model.name[: -len("_model")],
                            self.cent, self.cb, self.id_col,
                            self.vec_col,
                            self._codes.schema.jsonValue(), v)
        self._codes_version = v

    def topk(self, queries: DataFrame, k: int = 5,
             n_probe: int = 4) -> DataFrame:
        """Top-k ADC cosine neighbors from the persisted code table (at
        the model's pinned codes version) — same output contract as
        ``ivfpq_topk``."""
        return _ivfpq_query(self._codes.read(self._codes_version),
                            self.cent, self.cb, queries, k, n_probe,
                            self.id_col, self.vec_col)


# ---------------------------------------------------------------------------
# Reference-centroid quality scoring (the "looks like the curated set"
# embedding gate: Gopher/FineWeb-style wiki-similarity filtering)
# ---------------------------------------------------------------------------

def reference_centroid(reference: DataFrame,
                       vec_col: str = "embedding") -> np.ndarray:
    """Elementwise mean of a reference embedding set, computed
    DISTRIBUTED (posexplode -> one map-side-partial groupBy(pos) ->
    collect d rows): the curated set is usually small, but nothing
    here requires it to fit anywhere — shuffle rows are (pos, sum,
    count) partials and the driver receives exactly ``dim`` doubles.
    Null vectors are ignored; raises on an empty/all-null reference or
    mixed dimensions (a mean across dimensions is meaningless)."""
    rows = (reference.where(F.col(vec_col).isNotNull())
            .select(F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("pos").agg(F.avg("v").alias("m"),
                                F.count("*").alias("n"))
            .collect())
    if not rows:
        raise ValueError("reference set has no non-null vectors")
    ns = {r["n"] for r in rows}
    if len(ns) != 1:
        raise ValueError(
            "reference vectors have mixed dimensions "
            f"(per-position counts {sorted(ns)})")
    out = np.zeros(len(rows))
    for r in rows:
        out[r["pos"]] = r["m"]
    return out


def centroid_similarity(corpus: DataFrame, reference: DataFrame,
                        vec_col: str = "embedding",
                        out_col: str = "ref_sim") -> DataFrame:
    """Append cosine(doc embedding, reference-set centroid) — the
    embedding-space quality signal published pipelines use as "does
    this page look like the curated corpus" (the model-free cousin of
    the NB classifier gate; FineWeb/DataComp-style centroid scoring).
    One aggregate for the centroid, then a PURE MAP over the corpus
    (the centroid rides the plan as a d-element literal array) — the
    corpus is never shuffled, joined, or collected. Null/zero vectors
    score null."""
    c = reference_centroid(reference, vec_col)
    nc = float(np.linalg.norm(c))
    if nc == 0.0:
        raise ValueError("reference centroid is the zero vector — "
                         "cosine to it is undefined")
    lit = F.array(*[F.lit(float(x)) for x in (c / nc)])
    v = F.col(vec_col)
    sim = F.when(v.isNotNull() & (norm_col(v) > 0),
                 dot_col(v, lit) / norm_col(v))
    return corpus.withColumn(out_col, sim)


def reference_similarity_filter(corpus: DataFrame, reference: DataFrame,
                                threshold: float,
                                vec_col: str = "embedding",
                                keep_below: bool = False) -> DataFrame:
    """Gate the corpus on centroid similarity: keep docs with
    ``ref_sim >= threshold`` (or BELOW it with ``keep_below=True`` —
    the dissimilar side is how you mine hard negatives / novelty).
    Docs with null/zero embeddings are dropped either way (no score =
    no evidence). Same pure-map shape as centroid_similarity."""
    scored = centroid_similarity(corpus, reference, vec_col, "_ref_sim")
    keep = (F.col("_ref_sim") < threshold if keep_below
            else F.col("_ref_sim") >= threshold)
    return scored.where(keep).drop("_ref_sim")


# ---------------------------------------------------------------------------
# Embedding pair similarity (the CLIP-score gate: LAION filters pairs
# whose image and text embeddings disagree)
# ---------------------------------------------------------------------------

def embedding_pair_similarity(df: DataFrame,
                              vec_a: str = "image_embedding",
                              vec_b: str = "text_embedding",
                              out_col: str = "pair_sim") -> DataFrame:
    """Append cosine(vec_a, vec_b) per row — the CLIP-score signal
    multimodal pipelines gate pairs on (LAION keeps image-text pairs
    with CLIP cosine above ~0.28). The embeddings come from an
    external encoder (model inference is out of scope for the engine);
    given the two columns, the score is a PURE MAP over the scan —
    no shuffle, no Python, no join. Rows where either vector is null,
    zero, or of mismatched dimension score null (no evidence)."""
    a, b = F.col(vec_a), F.col(vec_b)
    denom = norm_col(a) * norm_col(b)
    sim = F.when(a.isNotNull() & b.isNotNull()
                 & (F.size(a) == F.size(b)) & (denom > 0),
                 dot_col(a, b) / denom)
    return df.withColumn(out_col, sim)


def clip_score_filter(df: DataFrame, threshold: float,
                      vec_a: str = "image_embedding",
                      vec_b: str = "text_embedding") -> DataFrame:
    """Keep rows whose embedding pair cosine >= threshold; rows with
    no score (null/zero/mismatched vectors) are dropped — an ungateable
    pair is not evidence of alignment. Pure map."""
    scored = embedding_pair_similarity(df, vec_a, vec_b, "_pair_sim")
    return scored.where(F.col("_pair_sim") >= threshold).drop("_pair_sim")


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk 2019 — the
# CCMatrix / ParaCrawl recipe for mining parallel sentences from a
# multilingual web crawl)
# ---------------------------------------------------------------------------

def _cross_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str, vec_col: str) -> DataFrame:
    """Cross-table exact kNN: ``cosine_topk_bruteforce`` minus the
    self-pair filter — across two INDEPENDENT id spaces (src vs tgt
    sentences) an id collision is not a self-match, and dropping it
    would silently lose a candidate translation. Same contract:
    (query_id, neighbor_id, cosine, rank), query side broadcast."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qv"),
                                   norm_col(F.col(vec_col)).alias("qn")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      norm_col(F.col(vec_col)).alias("cn"))
    scored = q.crossJoin(c).select(
        "query_id", "neighbor_id",
        F.round(_paired_cosine(), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def bitext_mine(src: DataFrame, tgt: DataFrame, k: int = 4,
                threshold: float = 1.05, margin: str = "ratio",
                strategy: str = "max", id_col: str = "vec_id",
                vec_col: str = "embedding", knn=None) -> DataFrame:
    """Mine candidate translation pairs from two monolingual embedding
    tables (multilingual encoder such as LASER/LaBSE — inference is the
    documented external seam) with margin-based scoring
    (Artetxe & Schwenk 2019):

        margin(x, y) = cos(x, y)  RELATIVE TO  the mean cosine of each
        side's k nearest neighbors — a pair only counts if it stands
        out from its neighborhoods, which kills the hub sentences that
        plain cosine thresholds mis-mine.

    ``margin``: 'ratio' (cos / avg — the paper's best), 'distance'
    (cos − avg), or 'absolute' (plain cos). ``strategy``: 'forward'
    (each src keeps its best-margin tgt), 'backward' (symmetric),
    'intersection' (mutual best), 'max' (union of both directions'
    bests — the paper's top scorer). Output: (src_id, tgt_id, cosine,
    margin_score), filtered to margin_score >= threshold.

    Scale: the only heavy stage is kNN. ``knn`` defaults to the exact
    broadcast brute force (fine when one side fits a broadcast); at
    corpus scale pass a wrapper over ``ivf_topk``/``AnnIndex.topk`` —
    everything downstream runs on O((n_src + n_tgt) * k) 24-byte rows:
    two map-side-partial mean aggregates, equi-joins on the id, and
    per-id windows. Text and vectors never ride those shuffles.
    """
    if margin not in ("ratio", "distance", "absolute"):
        raise ValueError(f"unknown margin {margin!r}")
    if strategy not in ("forward", "backward", "intersection", "max"):
        raise ValueError(f"unknown strategy {strategy!r}")
    do_knn = knn or (lambda c, q: _cross_topk(c, q, k, id_col, vec_col))
    fwd = do_knn(tgt, src)          # query = src sentence, neighbors in tgt
    bwd = do_knn(src, tgt)          # query = tgt sentence, neighbors in src

    # Per-sentence neighborhood means: O(n) rows, map-side partial agg.
    src_avg = fwd.groupBy(F.col("query_id").alias("src_id")) \
                 .agg(F.avg("cosine").alias("src_avg"))
    tgt_avg = bwd.groupBy(F.col("query_id").alias("tgt_id")) \
                 .agg(F.avg("cosine").alias("tgt_avg"))

    # Candidate pairs from both directions, oriented (src_id, tgt_id).
    # Cosine is symmetric, so a pair seen in both directions carries
    # the same rounded value — max() just collapses the duplicate row.
    pairs = (
        fwd.select(F.col("query_id").alias("src_id"),
                   F.col("neighbor_id").alias("tgt_id"), "cosine")
        .unionByName(bwd.select(F.col("neighbor_id").alias("src_id"),
                                F.col("query_id").alias("tgt_id"), "cosine"))
        .groupBy("src_id", "tgt_id").agg(F.max("cosine").alias("cosine"))
        .join(src_avg, "src_id").join(tgt_avg, "tgt_id")
    )
    avg = (F.col("src_avg") + F.col("tgt_avg")) / F.lit(2.0)
    if margin == "ratio":
        score = F.when(avg > 0, F.col("cosine") / avg)
    elif margin == "distance":
        score = F.col("cosine") - avg
    else:
        score = F.col("cosine")
    scored = pairs.select("src_id", "tgt_id", "cosine",
                          F.round(score, 6).alias("margin_score"))

    w_src = Window.partitionBy("src_id").orderBy(F.desc("margin_score"),
                                                 F.asc("tgt_id"))
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("margin_score"),
                                                 F.asc("src_id"))
    if strategy == "forward":
        best = (scored.withColumn("r", F.row_number().over(w_src))
                .filter(F.col("r") == 1).drop("r"))
    elif strategy == "backward":
        best = (scored.withColumn("r", F.row_number().over(w_tgt))
                .filter(F.col("r") == 1).drop("r"))
    else:
        f = (scored.withColumn("r", F.row_number().over(w_src))
             .filter(F.col("r") == 1).drop("r"))
        b = (scored.withColumn("r", F.row_number().over(w_tgt))
             .filter(F.col("r") == 1).drop("r"))
        if strategy == "intersection":
            best = f.join(b.select("src_id", "tgt_id"), ["src_id", "tgt_id"],
                          "left_semi")
        else:                                   # max: union of both bests
            best = f.unionByName(b).dropDuplicates(["src_id", "tgt_id"])
    return best.filter(F.col("margin_score") >= threshold)


def embedding_drift(old: DataFrame, new: DataFrame, n_clusters: int = 16,
                    sample_n: int = 2000, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Distribution drift between two corpus versions in embedding
    space — the monitoring record a recurring crawl publishes next to
    corpus_diff_card: cluster the OLD version's space (the reference
    frame; fitting on the union would let the drift move the ruler),
    assign both versions to those fixed centroids, and report per
    cluster ``(cluster_id, n_old, n_new, frac_old, frac_new,
    frac_shift, mean_sim_old, mean_sim_new)``. A topic surging or
    collapsing shows as frac_shift; genuinely NEW content (far from
    every old centroid) shows as mean_sim_new dropping in the clusters
    that absorb it. Σ|frac_shift|/2 is total-variation drift.

    Cost: the quantizer fit is the existing bounded driver sample;
    each side is ONE vectorized Arrow assignment pass + a
    map-side-partial groupBy to O(n_clusters) rows. Raises on an
    empty old corpus (no reference frame to measure against)."""
    cent = _fit_quantizer(old, n_clusters, sample_n, id_col, vec_col)
    if cent is None:
        raise ValueError("embedding_drift: empty reference (old) corpus")
    assign = ivf_assign_sim_udf(cent)

    def side(df: DataFrame, tag: str) -> DataFrame:
        a = df.select(assign(F.col(vec_col)).alias("_a")) \
              .select(F.col("_a.list_id").alias("cluster_id"),
                      F.col("_a.centroid_sim").alias("_sim"))
        return a.groupBy("cluster_id").agg(
            F.count("*").alias(f"n_{tag}"),
            F.avg("_sim").alias(f"mean_sim_{tag}"))

    j = side(old, "old").join(side(new, "new"), "cluster_id", "full_outer")
    n_old = F.coalesce("n_old", F.lit(0))
    n_new = F.coalesce("n_new", F.lit(0))
    tot_old = F.sum(n_old).over(Window.partitionBy())
    tot_new = F.sum(n_new).over(Window.partitionBy())
    frac_old = n_old / tot_old
    frac_new = F.when(tot_new > 0, n_new / tot_new).otherwise(F.lit(0.0))
    return (j.select(
        "cluster_id", n_old.alias("n_old"), n_new.alias("n_new"),
        F.round(frac_old, 6).alias("frac_old"),
        F.round(frac_new, 6).alias("frac_new"),
        F.round(frac_new - frac_old, 6).alias("frac_shift"),
        F.round("mean_sim_old", 6).alias("mean_sim_old"),
        F.round("mean_sim_new", 6).alias("mean_sim_new"))
        .orderBy("cluster_id"))
