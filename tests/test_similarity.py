"""Similarity search: brute-force exactness + LSH recall property."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dups,
    lsh_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_bruteforce_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    V = np.stack(pdf["embedding"].values).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    n = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = n @ n.T
    got = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    for qid, rows in by_q.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = [(round(S[qi, j], 6), ids[j]) for j in range(len(ids)) if ids[j] != qid]
        want = sorted(sims, key=lambda t: (-t[0], t[1]))[:3]
        got_sorted = sorted(rows)
        for (rank, nid, cos), (wcos, wid) in zip(got_sorted, want):
            assert nid == wid and abs(cos - wcos) < 1e-5


def test_lsh_recall(emb):
    q = emb.filter(F.col("vec_id") < 20)
    bf = {(r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(emb, q, k=5).collect()}
    lsh = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, q, k=5, dim=64).collect()}
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.7, recall


def test_lsh_deterministic(emb):
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in lsh_topk(emb, q, k=3).collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank) for r in lsh_topk(emb, q, k=3).collect())
    assert a == b


def test_near_dup_symmetric_halfspace(emb):
    rows = embedding_near_dups(emb.limit(200), threshold=0.3).collect()
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cosine >= 0.3 for r in rows)


def test_ivf_recall(emb):
    from data_crawler_spark.operators.similarity import ivf_topk
    q = emb.filter(F.col("vec_id") < 20)
    bf = {(r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(emb, q, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(emb, q, k=5, n_lists=16, n_probe=6).collect()}
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.6, recall


def test_ivf_deterministic(emb):
    from data_crawler_spark.operators.similarity import ivf_topk
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted((r.query_id, r.neighbor_id, r.rank) for r in ivf_topk(emb, q, k=3).collect())
    b = sorted((r.query_id, r.neighbor_id, r.rank) for r in ivf_topk(emb, q, k=3).collect())
    assert a == b


def test_hoisted_cosine_bit_identical(spark, emb):
    """The per-row norm hoist must be the SAME double arithmetic as the
    per-pair cosine_col formula — pin bit identity (not approx) so a
    future 'optimization' that reorders the float ops (e.g. normalizing
    vectors instead of dividing the dot) can't silently shift hashed
    driver outputs."""
    from data_crawler_spark.operators.similarity import cosine_col

    pairs = (
        emb.limit(40).select(F.col("vec_id").alias("id_a"),
                             F.col("embedding").alias("va"))
        .crossJoin(emb.limit(40).select(F.col("vec_id").alias("id_b"),
                                        F.col("embedding").alias("vb")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    ref = {(r.id_a, r.id_b): r.c for r in pairs.select(
        "id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("c")).collect()}
    got = {(r.id_a, r.id_b): r.cosine for r in embedding_near_dups(
        emb.limit(40), threshold=-2.0).collect()}
    assert set(got) == set(ref)
    for k, v in got.items():
        assert v == round(ref[k], 6), k


def test_ivf_layout_invariant(emb):
    """The quantizer sample is a deterministic function of the DATA
    (hash-filtered, id-ordered) — re-laying-out the same corpus must
    train the same centroids and emit the same neighbors. A bare
    limit() sample would break this."""
    from data_crawler_spark.operators.similarity import ivf_topk
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted((r.query_id, r.neighbor_id, r.rank)
               for r in ivf_topk(emb, q, k=3).collect())
    relaid = emb.repartition(13, "vec_id").sortWithinPartitions(
        F.col("vec_id").desc())
    b = sorted((r.query_id, r.neighbor_id, r.rank)
               for r in ivf_topk(relaid, q, k=3).collect())
    assert a == b and a


def test_ivf_empty_corpus(spark, emb):
    from data_crawler_spark.operators.similarity import ivf_topk
    empty = emb.filter(F.lit(False))
    out = ivf_topk(empty, emb.filter(F.col("vec_id") < 3), k=3)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "cosine", "rank"}


def _semdedup_corpus(spark, dim=16):
    """Planted duplicate groups: identical vectors within a group (so
    quantization can never split them), near-orthogonal across groups
    (so no false cross-group edges)."""
    rng = np.random.default_rng(20260818)
    base = rng.normal(size=(6, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    groups = {}
    for g, n_members in enumerate([3, 2, 1, 1, 4, 1]):
        for _ in range(n_members):
            rows.append((vid, [float(x) for x in base[g]]))
            groups[vid] = g
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
              .repartition(5)
    return df, groups, base


def test_semantic_dedup_keeps_one_per_group(spark):
    from data_crawler_spark.operators.similarity import semantic_dedup

    df, groups, base = _semdedup_corpus(spark)
    # verify the planted geometry: cross-group cosines all < 0.8
    S = base @ base.T
    np.fill_diagonal(S, 0)
    assert float(np.abs(S).max()) < 0.8

    out = semantic_dedup(df, threshold=0.9, n_lists=4, sample_n=100)
    rows = {r.vec_id: r for r in out.collect()}
    assert set(rows) == set(groups)
    # members of a planted group share one dup_group; distinct planted
    # groups never merge (cross-group cosine < threshold)
    by_planted = {}
    for vid, g in groups.items():
        by_planted.setdefault(g, set()).add(rows[vid].dup_group)
    assert all(len(s) == 1 for s in by_planted.values())
    assert len({next(iter(s)) for s in by_planted.values()}) == len(by_planted)
    # exactly one survivor per group; identical vectors tie on
    # centroid_sim so the representative is the min id
    for g, members in [(g, [v for v, pg in groups.items() if pg == g])
                       for g in by_planted]:
        keep = [v for v in members if rows[v].semdedup_keep]
        assert keep == [min(members)], (g, keep)


def test_semantic_dedup_keep_rule_and_determinism(spark):
    from data_crawler_spark.operators.similarity import semantic_dedup

    # one tight near-dup pair with DIFFERENT centroid sims + a singleton
    dim = 8
    v = np.zeros(dim); v[0] = 1.0
    v2 = np.array(v); v2[1] = 0.12
    v2 /= np.linalg.norm(v2)
    w = np.zeros(dim); w[3] = 1.0
    rows = [(0, [float(x) for x in v]),
            (1, [float(x) for x in v2]),
            (2, [float(x) for x in w])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out1 = {r.vec_id: r for r in
            semantic_dedup(df, threshold=0.95, n_lists=2, sample_n=10)
            .collect()}
    # 0 and 1 are duplicates (cos ~ 0.993), 2 is alone
    assert out1[0].dup_group == out1[1].dup_group != out1[2].dup_group
    assert out1[2].semdedup_keep
    # the paper's rule: the member LEAST similar to the centroid stays
    pair = [out1[0], out1[1]]
    expected_keep = min(pair, key=lambda r: (r.centroid_sim, r.vec_id))
    for r in pair:
        assert r.semdedup_keep == (r.vec_id == expected_keep.vec_id)
    # partition-layout determinism: same verdicts on a re-layout
    out2 = {r.vec_id: r for r in
            semantic_dedup(df.repartition(7), threshold=0.95, n_lists=2,
                           sample_n=10).collect()}
    for vid in out1:
        assert out1[vid].semdedup_keep == out2[vid].semdedup_keep
        assert out1[vid].centroid_sim == out2[vid].centroid_sim


def test_semantic_dedup_empty(spark):
    from data_crawler_spark.operators.similarity import semantic_dedup
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(df)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "list_id", "centroid_sim",
                                "dup_group", "semdedup_keep"}


def test_cluster_corpus_basic_and_layout_invariant(spark, emb):
    from data_crawler_spark.operators.similarity import cluster_corpus

    out = cluster_corpus(emb, n_clusters=8)
    rows = out.select("vec_id", "cluster_id", "centroid_sim").collect()
    assert len(rows) == emb.count()
    by_id = {r["vec_id"]: (r["cluster_id"], r["centroid_sim"])
             for r in rows}
    assert all(0 <= c < 8 for c, _ in by_id.values())
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for _, s in by_id.values())
    assert len({c for c, _ in by_id.values()}) > 1  # actually clusters

    # identical assignment under a different partition layout
    re = {r["vec_id"]: (r["cluster_id"], r["centroid_sim"])
          for r in cluster_corpus(emb.repartition(13), n_clusters=8)
          .select("vec_id", "cluster_id", "centroid_sim").collect()}
    assert re == by_id


def test_cluster_corpus_identical_vectors_colocate(spark):
    import numpy as np
    from data_crawler_spark.operators.similarity import cluster_corpus

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 8))
    rows = []
    for g in range(4):
        for i in range(5):
            rows.append((g * 10 + i, [float(x) for x in base[g]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cluster_corpus(df, n_clusters=4, sample_n=20)
    groups = {}
    for r in got.collect():
        groups.setdefault(r["vec_id"] // 10, set()).add(r["cluster_id"])
    # identical vectors can never split across clusters
    assert all(len(s) == 1 for s in groups.values())


def test_cluster_corpus_balanced_mixture_composition(spark):
    import numpy as np
    from data_crawler_spark.operators.sampling import (
        sample_corpus_mixture)
    from data_crawler_spark.operators.similarity import cluster_corpus

    # 2 well-separated topics with a 10:1 skew
    rng = np.random.default_rng(3)
    a, b = np.eye(8)[0], np.eye(8)[1]
    rows = [(i, [float(x) for x in (a + rng.normal(scale=0.01, size=8))])
            for i in range(200)]
    rows += [(1000 + i,
              [float(x) for x in (b + rng.normal(scale=0.01, size=8))])
             for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    clustered = cluster_corpus(df, n_clusters=2, sample_n=220)
    picked = sample_corpus_mixture(
        clustered, group_col="cluster_id", id_col="vec_id",
        temperature=100.0, seed=11)
    counts = {r["cluster_id"]: r["n"] for r in
              picked.groupBy("cluster_id").agg(F.count("*").alias("n"))
              .collect()}
    # near-uniform temperature: the minority topic keeps ~everything,
    # the majority is downsampled toward it
    assert len(counts) == 2
    hi, lo = max(counts.values()), min(counts.values())
    assert hi < 200  # majority actually downsampled
    assert lo >= 15  # minority retained


def test_cluster_corpus_empty(spark, emb):
    from data_crawler_spark.operators.similarity import cluster_corpus
    out = cluster_corpus(emb.filter(F.lit(False)))
    assert out.count() == 0
    assert dict(out.dtypes)["cluster_id"] == "int"


def test_pq_exact_on_clustered_data(spark):
    """Vectors drawn exactly FROM a small prototype set: enough
    centroids make quantization lossless, so PQ top-k must equal
    brute-force top-k exactly."""
    import numpy as np

    from data_crawler_spark.operators.similarity import (
        cosine_topk_bruteforce, fit_pq, pq_encode, pq_topk)
    rng = np.random.default_rng(5)
    protos = rng.normal(size=(4, 16))
    rows = [(i, [float(x) for x in protos[i % 4]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = fit_pq(df, n_subspaces=4, n_centroids=8, sample_n=40)
    codes = pq_encode(df, cb)
    # lossless quantization: reconstruction norm == true norm
    import math
    true_n = {i: math.sqrt(sum(x * x for x in protos[i % 4]))
              for i in range(40)}
    for r in codes.select("vec_id", "recon_norm").collect():
        assert abs(r["recon_norm"] - true_n[r["vec_id"]]) < 1e-6
    q = df.filter(F.col("vec_id") < 3)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in pq_topk(codes, q, cb, k=5).collect()}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in cosine_topk_bruteforce(df, q, k=5).collect()}
    assert got == want


def test_pq_recall_and_compression(spark, emb):
    """On real embeddings PQ is lossy: assert recall@5 against brute
    force plus the determinism/layout invariants."""
    from data_crawler_spark.operators.similarity import (
        cosine_topk_bruteforce, fit_pq, pq_encode, pq_topk)
    cb = fit_pq(emb, n_subspaces=16, n_centroids=256)
    assert cb.shape == (16, 256, 4)  # 64-dim fixtures
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") < 20)
    bf = {(r.query_id, r.neighbor_id)
          for r in cosine_topk_bruteforce(emb, q, k=5).collect()}
    pq = {(r.query_id, r.neighbor_id)
          for r in pq_topk(codes, q, cb, k=5).collect()}
    recall = len(bf & pq) / len(bf)
    assert recall >= 0.7, recall  # measured 0.78, fully deterministic

    # codes are a function of the data, not the layout
    a = {r["vec_id"]: (list(r["pq_code"]), r["recon_norm"])
         for r in codes.collect()}
    b = {r["vec_id"]: (list(r["pq_code"]), r["recon_norm"])
         for r in pq_encode(emb.repartition(13), cb).collect()}
    assert a == b
    # m uint8-sized codes per doc vs 64 floats
    assert all(len(c) == 16 and max(c) < 256 for c, _ in a.values())


def test_pq_validation_and_empty(spark, emb):
    from data_crawler_spark.operators.similarity import fit_pq, pq_topk
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fit_pq(emb, n_subspaces=7)  # 64 % 7 != 0
    assert fit_pq(emb.filter(F.lit(False)), n_subspaces=8) is None
    cb = fit_pq(emb.limit(50), n_subspaces=8, n_centroids=16)
    from data_crawler_spark.operators.similarity import pq_encode
    codes = pq_encode(emb.limit(50), cb)
    out = pq_topk(codes, emb.filter(F.lit(False)), cb, k=3)
    assert out.count() == 0


def test_ivfpq_recall_and_determinism(spark, emb):
    from data_crawler_spark.operators.similarity import (
        cosine_topk_bruteforce, ivfpq_topk)
    q = emb.filter(F.col("vec_id") < 20)
    bf = {(r.query_id, r.neighbor_id)
          for r in cosine_topk_bruteforce(emb, q, k=5).collect()}
    got = ivfpq_topk(emb, q, k=5, n_lists=8, n_probe=6,
                     n_subspaces=16, n_centroids=256)
    rows = got.collect()
    pq = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(bf & pq) / len(bf)
    assert recall >= 0.55, recall
    # ranks contiguous per query, scores valid cosines
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.adc_cosine))
    for qid, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(-1.001 <= x[1] <= 1.001 for x in rs)

    # layout invariance
    re_rows = ivfpq_topk(emb.repartition(13), q, k=5, n_lists=8,
                         n_probe=6, n_subspaces=16,
                         n_centroids=256).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in re_rows} == {
        (r.query_id, r.rank, r.neighbor_id) for r in rows}


def test_ivfpq_empty_inputs(spark, emb):
    from data_crawler_spark.operators.similarity import ivfpq_topk
    assert ivfpq_topk(emb.filter(F.lit(False)), emb.limit(2)).count() == 0
    assert ivfpq_topk(emb.limit(50), emb.filter(F.lit(False))).count() == 0


def test_ann_index_build_load_query_add(spark, emb, tmp_path):
    """AnnIndex persists the IVF-PQ artifacts: a fresh build answers
    exactly like the one-call ivfpq_topk at the same knobs, a RELOAD
    from disk answers identically (nothing lives only in memory),
    add() makes a delta queryable without re-encoding the corpus, and
    an unbuilt state dir refuses to open."""
    from data_crawler_spark.operators.similarity import AnnIndex, ivfpq_topk

    state = str(tmp_path / "ann_state")
    corpus = emb.filter(F.col("vec_id") >= 10)
    delta = emb.filter(F.col("vec_id") < 10)
    q = emb.filter(F.col("vec_id") < 5)
    knobs = dict(n_lists=8, n_subspaces=16, n_centroids=256)

    idx = AnnIndex.build(corpus, state, id_col="vec_id", **knobs)
    want = {(r.query_id, r.rank, r.neighbor_id, r.adc_cosine)
            for r in ivfpq_topk(corpus, q, k=5, n_probe=6,
                                id_col="vec_id", **knobs).collect()}
    got = {(r.query_id, r.rank, r.neighbor_id, r.adc_cosine)
           for r in idx.topk(q, k=5, n_probe=6).collect()}
    assert got == want and got

    reloaded = AnnIndex(spark, state)
    got2 = {(r.query_id, r.rank, r.neighbor_id, r.adc_cosine)
            for r in reloaded.topk(q, k=5, n_probe=6).collect()}
    assert got2 == want

    # delta append: the delta ids become answerable neighbors
    reloaded.add(delta)
    with_delta = reloaded.topk(q, k=5, n_probe=6).collect()
    neighbors = {r.neighbor_id for r in with_delta}
    assert any(n < 10 for n in neighbors)
    # empty query set still typed correctly
    assert reloaded.topk(q.filter(F.lit(False))).count() == 0

    post_add = {(r.query_id, r.rank, r.neighbor_id, r.adc_cosine)
                for r in reloaded.topk(q, k=5, n_probe=6).collect()}

    # a legacy meta row without codes_version (pre-pinning index)
    # opens at the LATEST codes version instead of KeyError-ing —
    # probed while latest codes are still consistent with the model
    import json
    rows_m = reloaded._model.read().collect()
    meta = json.loads(next(r.s for r in rows_m if r.kind == "meta"))
    pinned_version = meta.pop("codes_version")
    legacy = [(r.kind, r.i, r.j, r.vec,
               json.dumps(meta) if r.kind == "meta" else r.s)
              for r in rows_m]
    reloaded._model.write(
        spark.createDataFrame(legacy, AnnIndex._MODEL_DDL),
        mode="overwrite")
    opened = AnnIndex(spark, state)
    assert opened._codes_version is None
    got_legacy = {(r.query_id, r.rank, r.neighbor_id, r.adc_cosine)
                  for r in opened.topk(q, k=5, n_probe=6).collect()}
    assert got_legacy == post_add
    # restore the pinned meta for the crash-simulation below
    AnnIndex._publish_model(
        spark, state, "ann", opened.cent, opened.cb, "vec_id",
        "embedding", opened._codes.schema.jsonValue(), pinned_version)

    # a crashed REBUILD (codes overwritten, model publish never ran)
    # must leave readers on the old consistent pairing: the meta row
    # pins the codes version, so old codebooks never score new codes
    from data_crawler_spark.operators.similarity import (_encode_codes,
                                                         _fit_quantizer,
                                                         fit_pq)
    cent2 = _fit_quantizer(delta, 4, 2000, "vec_id", "embedding")
    cb2 = fit_pq(delta, 8, 16, 2000, "vec_id", "embedding")
    reloaded._codes.write(
        _encode_codes(delta, cent2, cb2, "vec_id", "embedding"),
        mode="overwrite")  # simulated crash: model never republished
    survivor = AnnIndex(spark, state)
    got3 = {(r.query_id, r.rank, r.neighbor_id, r.adc_cosine)
            for r in survivor.topk(q, k=5, n_probe=6).collect()}
    assert got3 == post_add

    with pytest.raises(ValueError, match="no committed ANN index"):
        AnnIndex(spark, str(tmp_path / "nowhere"))


# ---------------------------------------------------------------------------
# reference-centroid quality scoring
# ---------------------------------------------------------------------------

def test_centroid_similarity_mirror(spark):
    from data_crawler_spark.operators.similarity import (
        centroid_similarity, reference_centroid,
        reference_similarity_filter)

    rng = np.random.default_rng(5)
    ref_vecs = rng.normal(size=(7, 8))
    corpus_vecs = rng.normal(size=(40, 8))
    ref = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(ref_vecs)],
        "id long, embedding array<double>")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus_vecs)]
        + [(99, None), (98, [0.0] * 8)],
        "doc_id long, embedding array<double>")

    c = reference_centroid(ref)
    assert np.allclose(c, ref_vecs.mean(axis=0))

    got = {r["doc_id"]: r["ref_sim"] for r in
           centroid_similarity(corpus, ref).collect()}
    cn = c / np.linalg.norm(c)
    for i, v in enumerate(corpus_vecs):
        exp = float(v @ cn / np.linalg.norm(v))
        assert abs(got[i] - exp) < 1e-9, i
    assert got[99] is None and got[98] is None   # null / zero vectors

    thr = float(np.median([got[i] for i in range(40)]))
    kept = {r["doc_id"] for r in
            reference_similarity_filter(corpus, ref, thr).collect()}
    assert kept == {i for i in range(40) if got[i] >= thr}
    below = {r["doc_id"] for r in
             reference_similarity_filter(corpus, ref, thr,
                                         keep_below=True).collect()}
    assert below == {i for i in range(40) if got[i] < thr}
    assert 99 not in kept | below and 98 not in kept | below


def test_reference_centroid_validation(spark):
    from data_crawler_spark.operators.similarity import (
        centroid_similarity, reference_centroid)

    empty = spark.createDataFrame([], "id long, embedding array<double>")
    with pytest.raises(ValueError):
        reference_centroid(empty)
    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "id long, embedding array<double>")
    with pytest.raises(ValueError):
        reference_centroid(mixed)
    zero = spark.createDataFrame(
        [(1, [1.0, -1.0]), (2, [-1.0, 1.0])],
        "id long, embedding array<double>")
    corpus = spark.createDataFrame([(1, [1.0, 1.0])],
                                   "doc_id long, embedding array<double>")
    with pytest.raises(ValueError):
        centroid_similarity(corpus, zero)


# ---------------------------------------------------------------------------
# embedding pair similarity (CLIP-score gate)
# ---------------------------------------------------------------------------

def test_embedding_pair_similarity_mirror(spark):
    from data_crawler_spark.operators.similarity import (
        clip_score_filter, embedding_pair_similarity)

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(20, 2, 6))
    rows = [(i, [float(x) for x in a], [float(x) for x in b])
            for i, (a, b) in enumerate(vecs)]
    rows += [(90, None, [1.0] * 6),            # null a
             (91, [1.0] * 6, [0.0] * 6),        # zero b
             (92, [1.0, 2.0], [1.0] * 6)]       # dim mismatch
    df = spark.createDataFrame(
        rows, "pair_id long, image_embedding array<double>, "
              "text_embedding array<double>")
    got = {r["pair_id"]: r["pair_sim"] for r in
           embedding_pair_similarity(df).collect()}
    for i, (a, b) in enumerate(vecs):
        exp = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(got[i] - exp) < 1e-9, i
    assert got[90] is None and got[91] is None and got[92] is None

    thr = float(np.median([got[i] for i in range(20)]))
    kept = {r["pair_id"] for r in clip_score_filter(df, thr).collect()}
    assert kept == {i for i in range(20) if got[i] >= thr}
    assert kept.isdisjoint({90, 91, 92})


# ---------------------------------------------------------------------------
# Margin-based bitext mining (Artetxe & Schwenk 2019)
# ---------------------------------------------------------------------------

def _bitext_fixture(spark, seed=7, n_src=30, n_tgt=32, dim=16, planted=10):
    rng = np.random.default_rng(seed)
    S = rng.normal(size=(n_src, dim))
    T = rng.normal(size=(n_tgt, dim))
    for i in range(planted):   # tgt i is a noisy copy ("translation") of src i
        T[i] = S[i] + 0.05 * rng.normal(size=dim)
    src = spark.createDataFrame(
        [(i, [float(x) for x in S[i]]) for i in range(n_src)],
        "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(
        [(j, [float(x) for x in T[j]]) for j in range(n_tgt)],
        "vec_id long, embedding array<double>")
    return S, T, src, tgt


def _mirror_bitext(S, T, k, threshold, strategy):
    """Pure-numpy mirror of bitext_mine with margin='ratio'."""
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    C = np.round(Sn @ Tn.T, 6)          # engine rounds cosine to 6
    def topk(row_sims):                  # (-cos, id) ties like the engine
        order = sorted(range(len(row_sims)), key=lambda j: (-row_sims[j], j))
        return order[:k]
    fwd = {i: topk(C[i, :]) for i in range(S.shape[0])}
    bwd = {j: topk(C[:, j]) for j in range(T.shape[0])}
    src_avg = {i: np.mean([C[i, j] for j in fwd[i]]) for i in fwd}
    tgt_avg = {j: np.mean([C[i, j] for i in bwd[j]]) for j in bwd}
    pairs = {(i, j) for i in fwd for j in fwd[i]}
    pairs |= {(i, j) for j in bwd for i in bwd[j]}
    scored = {(i, j): round(C[i, j] / ((src_avg[i] + tgt_avg[j]) / 2.0), 6)
              for (i, j) in pairs}
    def best_by_src():
        out = {}
        for (i, j), m in scored.items():
            cur = out.get(i)
            if cur is None or (-m, j) < (-cur[1], cur[0]):
                out[i] = (j, m)
        return {(i, j) for i, (j, _) in out.items()}
    def best_by_tgt():
        out = {}
        for (i, j), m in scored.items():
            cur = out.get(j)
            if cur is None or (-m, i) < (-cur[1], cur[0]):
                out[j] = (i, m)
        return {(i, j) for j, (i, _) in out.items()}
    if strategy == "forward":
        keep = best_by_src()
    elif strategy == "backward":
        keep = best_by_tgt()
    elif strategy == "intersection":
        keep = best_by_src() & best_by_tgt()
    else:
        keep = best_by_src() | best_by_tgt()
    return {(i, j): scored[(i, j)] for (i, j) in keep
            if scored[(i, j)] >= threshold}


def test_bitext_mirror_all_strategies(spark):
    from data_crawler_spark.operators.similarity import bitext_mine
    S, T, src, tgt = _bitext_fixture(spark)
    for strategy in ("forward", "backward", "intersection", "max"):
        got = {(r.src_id, r.tgt_id): r.margin_score
               for r in bitext_mine(src, tgt, k=3, threshold=1.02,
                                    strategy=strategy).collect()}
        want = _mirror_bitext(S, T, k=3, threshold=1.02, strategy=strategy)
        assert set(got) == set(want), strategy
        for p, m in want.items():
            assert abs(got[p] - m) < 1e-5, (strategy, p)


def test_bitext_planted_pairs_mined(spark):
    from data_crawler_spark.operators.similarity import bitext_mine
    _, _, src, tgt = _bitext_fixture(spark)
    got = {(r.src_id, r.tgt_id)
           for r in bitext_mine(src, tgt, k=3, threshold=1.02,
                                strategy="max").collect()}
    assert {(i, i) for i in range(10)} <= got
    # random (non-translation) pairs dominate neither neighborhood:
    # mined set stays far below the full candidate pool
    assert len(got) < 30


def test_bitext_forward_unique_and_intersection_subset(spark):
    from data_crawler_spark.operators.similarity import bitext_mine
    _, _, src, tgt = _bitext_fixture(spark)
    fwd = bitext_mine(src, tgt, k=3, threshold=0.0, strategy="forward").collect()
    assert len({r.src_id for r in fwd}) == len(fwd)
    inter = {(r.src_id, r.tgt_id) for r in bitext_mine(
        src, tgt, k=3, threshold=0.0, strategy="intersection").collect()}
    bwd = {(r.src_id, r.tgt_id) for r in bitext_mine(
        src, tgt, k=3, threshold=0.0, strategy="backward").collect()}
    assert inter <= {(r.src_id, r.tgt_id) for r in fwd} and inter <= bwd


def test_bitext_validation(spark):
    from data_crawler_spark.operators.similarity import bitext_mine
    _, _, src, tgt = _bitext_fixture(spark)
    with pytest.raises(ValueError):
        bitext_mine(src, tgt, margin="nope")
    with pytest.raises(ValueError):
        bitext_mine(src, tgt, strategy="nope")


# ---------------------------------------------------------------------------
# Embedding drift between corpus versions
# ---------------------------------------------------------------------------

def test_embedding_drift(spark):
    from data_crawler_spark.operators.similarity import embedding_drift
    rng = np.random.default_rng(21)
    dim = 16
    protos = rng.normal(size=(2, dim))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)

    def rows(counts, noise, start, drift_vec=None):
        out, vid = [], start
        for c, n in enumerate(counts):
            for _ in range(n):
                v = protos[c] + noise * rng.normal(size=dim)
                if drift_vec is not None:
                    v = v + drift_vec
                out.append((vid, [float(x) for x in v]))
                vid += 1
        return out

    old = spark.createDataFrame(rows([40, 40], 0.05, 0),
                                "vec_id long, embedding array<double>")
    # new: topic 0 surges to 60, topic 1 collapses to 20 and MOVES —
    # drift orthogonal to both prototypes so similarity drops without
    # flipping the nearest-centroid assignment
    u = rng.normal(size=dim)
    for p in protos:
        u -= (u @ p) * p
    u *= 0.5 / np.linalg.norm(u)
    new_rows = rows([60], 0.05, 1000) + rows([0, 20], 0.05, 2000,
                                             drift_vec=u)
    new = spark.createDataFrame(new_rows,
                                "vec_id long, embedding array<double>")
    got = {r.cluster_id: r for r in
           embedding_drift(old, new, n_clusters=2, sample_n=100).collect()}
    assert len(got) == 2
    fracs_old = sorted(r.frac_old for r in got.values())
    assert all(abs(f - 0.5) < 0.01 for f in fracs_old)
    surge = max(got.values(), key=lambda r: r.frac_shift)
    collapse = min(got.values(), key=lambda r: r.frac_shift)
    assert surge.frac_shift > 0.2 and collapse.frac_shift < -0.2
    assert abs(sum(r.frac_shift for r in got.values())) < 1e-6
    # the moved topic scores farther from its old centroid
    assert collapse.mean_sim_new < collapse.mean_sim_old - 0.05
    # layout invariance
    again = {r.cluster_id: r.frac_shift for r in
             embedding_drift(old.repartition(7), new.repartition(3),
                             n_clusters=2, sample_n=100).collect()}
    assert again == {c: r.frac_shift for c, r in got.items()}


def test_embedding_drift_empty_reference_raises(spark):
    from data_crawler_spark.operators.similarity import embedding_drift
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    new = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        embedding_drift(empty, new, n_clusters=2)
