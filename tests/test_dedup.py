"""Dedup family: exact, MinHash+LSH (recall property), SimHash."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_near_dups,
    minhash_signatures,
    simhash_near_dups,
    simhash_udf,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup of 1
    (4, "completely different text about spark shuffle partitions and catalyst optimizer rules"),
    (5, "THE  QUICK brown fox jumps over the lazy dog near the river bank today"),  # ws/case dup of 1
    (6, "another unrelated document mentioning parquet row groups and arrow batches"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r.keep_id: r.n_dups for r in exact_dedup(docs).collect()}
    assert out[1] == 3  # 1, 2, 5 normalize to the same content
    assert out[3] == 1 and out[4] == 1 and out[6] == 1


def test_minhash_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in minhash_near_dups(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs and (4, 6) not in pairs


def test_signature_num_partitions_override(docs):
    """num_partitions caps the pre-tokenize repartition width (tiny
    corpus + high shuffle.partitions would otherwise oversplit into
    near-empty tasks) without changing any signature value."""
    from data_crawler_spark.operators.dedup import simhash_signatures

    one = docs.coalesce(1)
    base_mh = {r.doc_id: list(r.sig) for r in minhash_signatures(docs).collect()}
    base_sh = {r.doc_id: r.sim for r in simhash_signatures(docs).collect()}
    mh3 = minhash_signatures(one, num_partitions=3)
    # a 1-partition scan widens to exactly the override, not to
    # spark.sql.shuffle.partitions
    assert mh3.rdd.getNumPartitions() == 3
    assert {r.doc_id: list(r.sig) for r in mh3.collect()} == base_mh
    sh3 = simhash_signatures(one, num_partitions=3)
    assert {r.doc_id: r.sim for r in sh3.collect()} == base_sh


def test_minhash_signature_deterministic(docs):
    s1 = {r.doc_id: list(r.sig) for r in minhash_signatures(docs).collect()}
    s2 = {r.doc_id: list(r.sig) for r in minhash_signatures(docs).collect()}
    assert s1 == s2
    assert s1[1] == s1[2]  # identical text -> identical signature
    agree = sum(a == b for a, b in zip(s1[1], s1[3])) / len(s1[1])
    assert agree > 0.4  # near-dup signatures mostly agree


def test_minhash_recall_vs_bruteforce(spark):
    """A corpus with planted near-dups: every planted pair (one word
    perturbed out of 40) is surfaced by the banded LSH
    (s-curve: P[miss per pair] ~ (1 - s^4)^16, s ~ 0.9)."""
    from data_crawler_spark.functions.hashing import splitmix64
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for d in range(60):
        words = [vocab[splitmix64(d * 100 + i) % len(vocab)] for i in range(40)]
        rows.append((d, " ".join(words)))
        if d < 15:  # plant a near-dup: one word changed
            mut = list(words)
            mut[7] = "mutated"
            rows.append((1000 + d, " ".join(mut)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    planted = {(d, 1000 + d) for d in range(15)}
    lsh = {(r.id_a, r.id_b)
           for r in minhash_near_dups(docs, threshold=0.5).collect()}
    missed = planted - lsh
    assert len(missed) <= 1, missed
    # and no wildly-false positives among unrelated docs
    false = {p for p in lsh if p not in planted}
    assert len(false) <= 2, false


def test_signatures_with_duplicate_ids(spark, docs):
    """unique_ids=False lifts the one-row-per-id contract: a doc split
    across several rows with the same id signatures as the UNION of the
    rows' shingle/token multisets. Duplicating every row verbatim must
    therefore reproduce the single-row signatures exactly (minhash: min
    over the same shingle set; simhash: doubled votes, same sign)."""
    from data_crawler_spark.operators.dedup import simhash_signatures
    # spread the duplicate rows across many partitions so per-partition
    # partials are genuinely incomplete without the co-locating shuffle
    dup = docs.unionByName(docs).repartition(8)
    want_mh = {r.doc_id: list(r.sig)
               for r in minhash_signatures(docs).collect()}
    got_mh = {r.doc_id: list(r.sig)
              for r in minhash_signatures(dup, unique_ids=False).collect()}
    assert got_mh == want_mh
    want_sh = {r.doc_id: r.sim for r in simhash_signatures(docs).collect()}
    got_sh = {r.doc_id: r.sim
              for r in simhash_signatures(dup, unique_ids=False).collect()}
    assert got_sh == want_sh
    # one output row per id even though the input had two
    assert minhash_signatures(dup, unique_ids=False).count() == len(want_mh)
    assert simhash_signatures(dup, unique_ids=False).count() == len(want_sh)


def test_simhash_identical_and_blocking(docs):
    sims = {r.doc_id: r.sim for r in
            docs.select("doc_id", simhash_udf("text").alias("sim")).collect()}
    assert sims[1] == sims[2] == sims[5]  # token-identical docs
    out = {(r.id_a, r.id_b): r.hamming
           for r in simhash_near_dups(docs, max_hamming=16).collect()}
    assert out[(1, 2)] == 0 and out[(1, 5)] == 0
    assert (1, 3) in out and out[(1, 3)] <= 16
    assert (1, 4) not in out


def test_simhash_vectorized_matches_udf(spark, docs):
    """simhash_signatures (explode + JVM hash + numpy bit-vote) must be
    byte-identical to the simhash_udf executable spec, including empty
    and null documents (sim = 0)."""
    from data_crawler_spark.operators.dedup import simhash_signatures
    extra = spark.createDataFrame(
        [(100, ""), (101, None), (102, "one"), (103, "one one two")],
        "doc_id long, text string")
    both = docs.unionByName(extra)
    want = {r.doc_id: r.sim for r in
            both.select("doc_id", simhash_udf("text").alias("sim")).collect()}
    got = {r.doc_id: r.sim for r in simhash_signatures(both).collect()}
    assert got == want


def test_simhash_vectorized_matches_udf_on_web(spark, web1k):
    """Byte-identity on a real generated corpus (1000 docs)."""
    from data_crawler_spark.operators.dedup import simhash_signatures
    docs = (spark.read.parquet(str(web1k / "pages.parquet"))
            .select(F.xxhash64("url").alias("doc_id"), "text"))
    want = {r.doc_id: r.sim for r in
            docs.select("doc_id", simhash_udf("text").alias("sim")).collect()}
    got = {r.doc_id: r.sim for r in simhash_signatures(docs).collect()}
    assert got == want


def test_incremental_minhash_index(spark, tmp_path):
    """Round-N dedup signatures ONLY round N's docs (snapshot versions
    grow by exactly the delta) and still finds cross-round near-dups."""
    from data_crawler_spark.operators.dedup import IncrementalMinHashIndex
    b1 = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    b2 = spark.createDataFrame(DOCS[4:], "doc_id long, text string")

    idx = IncrementalMinHashIndex(spark, tmp_path, n_hashes=64, n_bands=16)
    p1 = idx.add(b1, threshold=0.5)
    n1 = idx.table.read(version=1).count()
    assert n1 == b1.count()  # only batch-1 signatures exist

    pairs1 = {(r.id_a, r.id_b) for r in p1.collect()}
    assert (1, 2) in pairs1 and (1, 3) in pairs1

    p2 = idx.add(b2, threshold=0.5)
    # version 2 = version 1 + exactly the batch-2 delta (no recompute)
    assert idx.table.read(version=2).count() == n1 + b2.count()
    pairs2 = {(r.id_a, r.id_b) for r in p2.collect()}
    # doc 5 is a ws/case dup of docs 1 and 2 from the PREVIOUS round
    assert (1, 5) in pairs2 and (2, 5) in pairs2
    # batch-2 pairs never re-report batch-1-internal pairs
    assert all(a in (5, 6) or b in (5, 6) for a, b in pairs2)


def test_incremental_matches_batch_candidates(spark, tmp_path):
    """Incremental banded candidates (restricted to pairs touching the
    delta) == one-shot batch banding over the full corpus."""
    from data_crawler_spark.operators.dedup import (
        IncrementalMinHashIndex, banded, lsh_candidate_pairs,
        minhash_signatures, sig_jaccard_est)
    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    b1 = full.filter(F.col("doc_id") <= 3)
    b2 = full.filter(F.col("doc_id") > 3)

    idx = IncrementalMinHashIndex(spark, tmp_path, n_hashes=64, n_bands=16)
    idx.add(b1, threshold=0.0)
    p2 = {(r.id_a, r.id_b) for r in idx.add(b2, threshold=0.0).collect()}

    sigs = minhash_signatures(full, n_hashes=64)
    batch = {(r.id_a, r.id_b)
             for r in lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=4).collect()
             if r.id_a > 3 or r.id_b > 3}
    assert p2 == batch


def test_connected_components_known_graph(spark):
    """Components of a hand-built graph: {1,2,3,4} via chain, {10,11},
    singleton {20}; cluster id = min member."""
    from data_crawler_spark.operators.dedup import connected_components
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]],
                                  "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    got = {(r.doc_id, r.cluster_id)
           for r in connected_components(verts, edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20)}


def test_connected_components_long_chain_converges(spark):
    """A 40-node path (diameter 39) must still converge exactly — the
    propagation loop runs to fixpoint, not to a guessed round count."""
    from data_crawler_spark.operators.dedup import connected_components
    n = 40
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "id_a long, id_b long")
    got = connected_components(verts, edges, max_iter=n + 1).collect()
    assert all(r.cluster_id == 0 for r in got) and len(got) == n


def test_duplicate_clusters_consistent_with_pairs(spark):
    """Every near-dup pair lands in one cluster; docs in different
    clusters never share a pair; keep-one-per-cluster keeps min ids."""
    from data_crawler_spark.operators.dedup import (
        duplicate_clusters,
        jaccard_pairs,
    )
    docs_df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
               .select("doc_id", "source", "text"))
    pairs = {(r.id_a, r.id_b) for r in
             jaccard_pairs(docs_df, group_col="source", threshold=0.9).collect()}
    clusters = {r.doc_id: r.cluster_id
                for r in duplicate_clusters(
                    docs_df, group_col="source", threshold=0.9).collect()}
    assert pairs, "fixture produced no near-dup pairs"  
    for a, b in pairs:
        assert clusters[a] == clusters[b]
    # each cluster id is the min of its members and a member itself
    by_cluster = {}
    for d, c in clusters.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_connected_components_long_chain(spark):
    """Adversarial PATH graph (diameter 19999): pointer jumping must
    converge in O(log d) rounds — max_iter=25 would be hopeless for
    plain min-label propagation (O(d) rounds)."""
    from data_crawler_spark.operators import dedup
    n = 20_000
    vertices = spark.range(n).withColumnRenamed("id", "doc_id")
    edges = (spark.range(n - 1)
             .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")))
    out = dedup.connected_components(vertices, edges)
    assert out.filter(F.col("cluster_id") != 0).count() == 0
    assert out.count() == n


def test_decontaminate_flags_exact_ngram_overlap(spark):
    from data_crawler_spark.operators.dedup import (contaminated_doc_ids,
                                                    decontaminate)

    bench_q = ("what is the capital of france and which river runs "
               "through the city of paris on its way to the sea")
    eval_df = spark.createDataFrame(
        [(bench_q,), ("name the largest planet orbiting our sun today",)],
        "text string")
    filler = "totally original training text with no benchmark overlap "
    docs = spark.createDataFrame(
        [
            # planted: carries a verbatim 13+-token span of bench_q,
            # case-mangled (detector normalizes via lowered WORD_RE)
            (1, filler + "WHAT IS THE CAPITAL OF FRANCE AND WHICH RIVER "
                "RUNS THROUGH THE CITY tail words"),
            (2, filler * 5),                       # clean, long
            (3, "capital of france"),              # < 13 tokens: never flagged
            (4, filler + "what is the capital of spain and which river "
                "runs through the city"),          # 1-token miss: clean
        ],
        "doc_id long, text string")
    bad = sorted(r.doc_id for r in
                 contaminated_doc_ids(docs, eval_df, n=13).collect())
    assert bad == [1]
    kept = sorted(r.doc_id for r in
                  decontaminate(docs, eval_df, n=13).collect())
    assert kept == [2, 3, 4]
    # schema passes through untouched
    assert decontaminate(docs, eval_df, n=13).columns == docs.columns


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """The corpus is never shuffled: both joins broadcast the small
    side (eval n-gram hashes, then the contaminated-id set)."""
    from data_crawler_spark.operators.dedup import decontaminate

    eval_df = spark.createDataFrame([("a b c d e f g h i j k l m",)],
                                    "text string")
    docs = spark.createDataFrame([(1, "some text here")],
                                 "doc_id long, text string")
    plan = (decontaminate(docs, eval_df, n=13)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_minhash_shuffle_path_matches_broadcast(spark, docs):
    """broadcast_max_pairs=0 drops every broadcast hint (the corpus-scale
    candidate regime, where AQE must pick shuffle joins) — the verified
    pair set and exact jaccard values must be identical to the
    broadcast-hinted small-candidate plan."""
    want = {(r.id_a, r.id_b): r.jaccard
            for r in minhash_near_dups(docs, threshold=0.5).collect()}
    got = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_near_dups(docs, threshold=0.5,
                                      broadcast_max_pairs=0).collect()}
    assert got == want and want  # non-vacuous: the fixture has near-dups


def test_incremental_index_rejects_readd(spark, tmp_path):
    """The index is append-only: re-adding an id would leave two
    signature rows (one stale), so add() must refuse it up front."""
    from data_crawler_spark.operators.dedup import IncrementalMinHashIndex

    b1 = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    idx = IncrementalMinHashIndex(spark, tmp_path, n_hashes=64, n_bands=16)
    idx.add(b1, threshold=0.5)
    readd = spark.createDataFrame([DOCS[2], DOCS[5]], "doc_id long, text string")
    with pytest.raises(ValueError, match="already"):
        idx.add(readd, threshold=0.5)
    # the failed add committed nothing: version still = batch-1 only
    assert idx.table.read().count() == b1.count()


# ---------------------------------------------------------------------------
# Corpus-wide paragraph dedup (CCNet-style)
# ---------------------------------------------------------------------------

PARA_DOCS = [
    (1, "unique intro one\nSubscribe to our newsletter!\nbody text alpha\n\nfooter (c) example"),
    (2, "unique intro two\nSubscribe to our newsletter!\nbody text beta\nfooter (c) example"),
    (3, "  Subscribe to our newsletter!  \nfooter (c) example\nfooter (c) example"),  # ws-dup + in-doc dup
    (4, "totally original paragraph\n   \nanother original line"),  # ws-only para kept
    (5, "Subscribe to our newsletter!"),  # hollowed out entirely under keep='first'
]


def _ref_paragraph_dedup(rows, sep="\n", keep="first"):
    """Pure-Python mirror of dedup.paragraph_dedup keyed on the trimmed
    paragraph STRING (Spark keys on xxhash64 of it — identical modulo
    2^-64 collisions, absent in a fixture this size)."""
    occ: dict[str, list] = {}
    for i, t in rows:
        for j, p in enumerate(t.split(sep)):
            tp = p.strip()
            if tp:
                occ.setdefault(tp, []).append((i, j))
    drops = set()
    for lst in occ.values():
        if len(lst) >= 2:
            drops.update(lst if keep == "none" else
                         [x for x in lst if x != min(lst)])
    out = {}
    for i, t in rows:
        ps = t.split(sep)
        kept = [p for j, p in enumerate(ps) if (i, j) not in drops]
        removed = sum(1 for j in range(len(ps)) if (i, j) in drops)
        total = sum(1 for p in ps if p.strip())
        out[i] = (sep.join(kept), removed, total)
    return out


@pytest.mark.parametrize("keep", ["first", "none"])
def test_paragraph_dedup_matches_reference(spark, keep):
    from data_crawler_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.paras_removed, r.paras_total)
           for r in paragraph_dedup(df, keep=keep).collect()}
    assert got == _ref_paragraph_dedup(PARA_DOCS, keep=keep)
    # non-vacuous: the boilerplate line was actually removed somewhere
    assert any(rem for (_, rem, _) in got.values())


def test_paragraph_dedup_keep_first_survivor_and_invariance(spark):
    """Exactly ONE copy of the shared boilerplate survives corpus-wide —
    the (id, pos)-smallest — and the verdict is identical under a
    different partition layout."""
    from data_crawler_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(PARA_DOCS, "doc_id long, text string")
    out = paragraph_dedup(df, keep="first")
    texts = {r.doc_id: r.text for r in out.collect()}
    carriers = [i for i, t in texts.items()
                if "Subscribe to our newsletter!" in t]
    assert carriers == [1]  # first occurrence: doc 1, pos 1
    hollow = [r for r in out.collect() if r.doc_id == 5][0]
    assert hollow.text == "" and hollow.paras_removed == hollow.paras_total == 1
    relaid = {r.doc_id: r.text
              for r in paragraph_dedup(df.repartition(7), keep="first").collect()}
    assert relaid == texts


def test_paragraph_dedup_scoped_by_host(spark):
    """scope_col narrows dedup to within-group: the same footer on two
    hosts dedups within each host but never across; scoped equals
    running the corpus-wide op per group."""
    from data_crawler_spark.operators.dedup import paragraph_dedup
    footer = "subscribe to our newsletter"
    rows = [
        (1, "a.test", f"alpha article one\n{footer}"),
        (2, "a.test", f"alpha article two\n{footer}"),
        (3, "b.test", f"beta article one\n{footer}"),
        (4, "b.test", "beta article two\nunique closing line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, "
                                     "text string")
    scoped = {r.doc_id: r.text for r in paragraph_dedup(
        df.repartition(3), scope_col="host").collect()}
    # first occurrence per HOST keeps the footer: docs 1 and 3
    assert scoped[1].endswith(footer) and scoped[3].endswith(footer)
    assert scoped[2] == "alpha article two"
    assert scoped[4] == "beta article two\nunique closing line"
    # corpus-wide: only doc 1 keeps it
    wide = {r.doc_id: r.text for r in paragraph_dedup(df).collect()}
    assert wide[3] == "beta article one"
    # scoped == per-group corpus-wide runs
    for host in ("a.test", "b.test"):
        part = {r.doc_id: r.text for r in paragraph_dedup(
            df.where(F.col("host") == host)).collect()}
        for did, text in part.items():
            assert scoped[did] == text, (host, did)


def test_paragraph_dedup_regex_metachar_separator(spark):
    """sep is a LITERAL: '|' must split on pipes, not between every
    character (F.split takes a regex; the op escapes it)."""
    from data_crawler_spark.operators.dedup import paragraph_dedup

    rows = [(1, "keep one|dup para|keep two"),
            (2, "dup para|only here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in paragraph_dedup(df, sep="|").collect()}
    assert got == {1: "keep one|dup para|keep two",
                   2: "only here"}


def test_signatures_accept_string_ids(spark):
    """id_col is typed from the input frame, not hardcoded long — URL
    keys are the realistic id at crawl scale."""
    from data_crawler_spark.operators.dedup import (minhash_signatures,
                                                    simhash_signatures)

    df = spark.createDataFrame(
        [("http://a/1", "the quick brown fox jumps over the lazy dog"),
         ("http://a/2", "an entirely different document body here")],
        "url string, text string")
    sigs = minhash_signatures(df, id_col="url")
    assert {r.url for r in sigs.collect()} == {"http://a/1", "http://a/2"}
    sims = simhash_signatures(df, id_col="url")
    assert {r.url for r in sims.collect()} == {"http://a/1", "http://a/2"}


def test_cluster_survivors_policy(spark):
    """One survivor per cluster by the caller's metric order (max
    metric, id ASC tie-break); singletons survive; default (no
    order_by) is min id — matching filter(id == cluster_id); layout-
    invariant."""
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.dedup import cluster_survivors

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),   # cluster 1: quality peaks at doc 2
         (4, 4), (5, 4),           # cluster 4: quality TIE -> min id 4
         (9, 9)],                  # singleton
        "doc_id long, cluster_id long")
    metrics = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.7), (5, 0.7), (9, 0.2)],
        "doc_id long, q double")

    for parts in (1, 6):
        got = {(r.cluster_id, r.doc_id) for r in
               cluster_survivors(comps.repartition(parts),
                                 metrics.repartition(parts),
                                 [F.desc("q")]).collect()}
        assert got == {(1, 2), (4, 4), (9, 9)}, parts

    # no metrics / no order: min id per cluster == the id==cluster_id set
    got = {(r.cluster_id, r.doc_id)
           for r in cluster_survivors(comps).collect()}
    assert got == {(1, 1), (4, 4), (9, 9)}

    # metrics joins LEFT: a cluster with NO metric rows still yields
    # its min-id survivor (instead of silently vanishing), and within
    # a partly-metered cluster the metered member outranks the null —
    # under BOTH sort directions (asc would otherwise put nulls first)
    partial = spark.createDataFrame([(3, 0.5)], "doc_id long, q double")
    for order in ([F.desc("q")], [F.asc("q")]):
        got = {(r.cluster_id, r.doc_id) for r in
               cluster_survivors(comps, partial, order).collect()}
        assert got == {(1, 3), (4, 4), (9, 9)}, order


def test_ngram_novelty_mirror(spark):
    """Per-doc novelty matches a pure-Python mirror in both scopes
    (corpus-wide occurrence dup vs cross-doc only), hash and string
    keys agree, sub-n docs get total 0 / null novelty, and the result
    is partition-layout invariant."""
    import re

    from data_crawler_spark.operators.dedup import ngram_novelty

    n = 3
    texts = {
        1: "alpha beta gamma delta epsilon",        # shares 3-grams w/ 2
        2: "alpha beta gamma zeta eta",              # shares w/ 1
        3: "one two three one two three one two",    # intra-doc repeats
        4: "wholly novel words appearing once only", # fully novel
        5: "too short",                              # sub-n: no ngrams
    }

    def mirror(scope):
        grams = {}
        for i, t in texts.items():
            toks = re.findall(r"[A-Za-z0-9]+", t.lower())
            for p in range(len(toks) - n + 1):
                g = " ".join(toks[p:p + n])
                grams.setdefault(g, []).append(i)
        want = {}
        for i, t in texts.items():
            toks = re.findall(r"[A-Za-z0-9]+", t.lower())
            total = max(0, len(toks) - n + 1)
            dup = 0
            for p in range(total):
                g = " ".join(toks[p:p + n])
                occ = grams[g]
                if scope == "corpus":
                    dup += len(occ) > 1
                else:
                    dup += any(j != i for j in occ)
            nov = (1.0 - dup / total) if total else None
            want[i] = (total, dup, nov)
        return want

    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    for scope in ("corpus", "cross_doc"):
        want = mirror(scope)
        for by in ("hash", "ngram"):
            got = {r.doc_id: (r.ngrams_total, r.ngrams_dup, r.novelty)
                   for r in ngram_novelty(df.repartition(5), n=n,
                                          scope=scope, by=by).collect()}
            assert set(got) == set(want)
            for i in want:
                assert got[i][:2] == want[i][:2], (scope, by, i)
                if want[i][2] is None:
                    assert got[i][2] is None
                else:
                    assert abs(got[i][2] - want[i][2]) < 1e-12

    with pytest.raises(ValueError):
        ngram_novelty(df, scope="nope")
    with pytest.raises(ValueError):
        ngram_novelty(df, by="nope")


def test_contamination_report(spark):
    """Per-eval-item leakage audit: collision doc/ngram counts exact vs
    a hand-built fixture, clean items present with zeros, example doc
    deterministic (min id), missing eval id column raises, corpus side
    rides a broadcast join (never shuffled)."""
    from data_crawler_spark.operators.dedup import contamination_report

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),        # hits e1 on 2 3-grams
         (2, "zz alpha beta gamma qq"),        # hits e1 on 1 3-gram
         (3, "totally clean document words")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [("e1", "alpha beta gamma delta"),
         ("e2", "nothing here collides at all")],
        "eval_id string, text string")

    got = {r.eval_id: (r.n_docs, r.n_collision_ngrams, r.example_doc)
           for r in contamination_report(docs.repartition(4), ev,
                                         n=3).collect()}
    # e1's 3-grams: "alpha beta gamma" (docs 1,2), "beta gamma delta"
    # (doc 1) -> 2 docs, 2 colliding ngrams, example min id 1
    assert got == {"e1": (2, 2, 1), "e2": (0, 0, None)}

    with pytest.raises(ValueError, match="per-item id column"):
        contamination_report(docs, ev.drop("eval_id"), n=3)
    with pytest.raises(ValueError, match="must differ"):
        contamination_report(
            docs, ev.withColumnRenamed("eval_id", "doc_id"),
            n=3, eval_id_col="doc_id")

    plan = (contamination_report(docs, ev, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_containment_pairs_mirror(spark):
    """Asymmetric containment: a short article fully quoted inside a
    long roundup is found at containment 1.0 even though its Jaccard
    is far below any near-dup threshold; values are EXACT vs a
    pure-Python shingle mirror and the emitted set is a subset of the
    mirror's above-threshold pairs (verification is exact, so zero
    false positives by construction); layout-invariant."""
    import itertools
    import re

    from data_crawler_spark.operators.dedup import containment_pairs

    article = " ".join(f"story{i} word{i * 7 % 13}" for i in range(20))
    extra = " ".join(f"roundup{i} filler{i * 5 % 11}" for i in range(40))
    texts = {
        1: article,                                   # contained in 2
        2: article + " " + extra,                     # the aggregator
        3: " ".join(f"other{i}" for i in range(30)),  # unrelated
        4: " ".join(article.split()[:20]),            # half the article
    }

    def sh(t):
        toks = re.findall(r"[A-Za-z0-9]+", t.lower())
        return {" ".join(toks[p:p + 3]) for p in range(len(toks) - 2)}

    def mirror(th):
        out = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = sh(texts[a]), sh(texts[b])
            inter = len(sa & sb)
            ca, cb = inter / len(sa), inter / len(sb)
            j = inter / len(sa | sb)
            if max(ca, cb) >= th:
                out[(a, b)] = (round(ca, 4), round(cb, 4), round(j, 4))
        return out

    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    want = mirror(0.8)
    assert (1, 2) in want and want[(1, 2)][0] == 1.0  # planted
    assert want[(1, 2)][2] < 0.5  # Jaccard alone would miss it
    for src in (df, df.repartition(7)):
        got = {(r.id_a, r.id_b): (r.containment_a, r.containment_b,
                                  r.jaccard)
               for r in containment_pairs(src, threshold=0.8).collect()}
        # exact verify => no false positives; values exact where found
        assert set(got) <= set(want)
        for pair, vals in got.items():
            assert vals == want[pair], pair
        # the planted containment must be recalled (J ~ 0.33 is far
        # above the 32-band/2-row s-curve's ~0.18 midpoint)
        assert (1, 2) in got


def test_containment_vs_minhash_jaccard_parity(docs):
    """On the module corpus, containment_pairs' jaccard column agrees
    exactly with minhash_near_dups for every pair both emit (shared
    verify path)."""
    from data_crawler_spark.operators.dedup import containment_pairs

    nd = {(r.id_a, r.id_b): r.jaccard
          for r in minhash_near_dups(docs, threshold=0.5).collect()}
    cp = {(r.id_a, r.id_b): r.jaccard
          for r in containment_pairs(docs, threshold=0.5).collect()}
    common = set(nd) & set(cp)
    assert (1, 2) in common
    for pair in common:
        assert nd[pair] == cp[pair]


def test_lsh_tune():
    """(bands, rows) from the s-curve optimizer: valid factorization,
    argmin agrees with an independent finer-grid enumeration, fp/fn
    weighting shifts the curve the right way, midpoint lands near the
    threshold, and validation raises."""
    from data_crawler_spark.operators.dedup import lsh_tune

    def err_on(b, r, th, w, npts):
        import numpy as np
        g = (np.arange(npts) + 0.5) / npts
        p = 1.0 - (1.0 - g ** r) ** b
        return (w * p[g < th].sum() / npts
                + (1 - w) * (1 - p)[g >= th].sum() / npts)

    for th, nh in ((0.5, 64), (0.8, 128), (0.7, 64), (0.3, 32)):
        b, r = lsh_tune(th, nh)
        assert b * r == nh
        # independent 4000-point enumeration: chosen pair is optimal
        # (within grid tolerance)
        errs = {(nb, nh // nb): err_on(nb, nh // nb, th, 0.5, 4000)
                for nb in range(1, nh + 1) if nh % nb == 0}
        assert errs[(b, r)] <= min(errs.values()) + 1e-3
        # the 50%-collision point sits near the target threshold
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - th) < 0.2, (th, nh, b, r, mid)

    # FP-averse tuning pushes the curve right (more rows per band)
    assert lsh_tune(0.5, 64, fp_weight=0.9)[1] >= \
        lsh_tune(0.5, 64, fp_weight=0.1)[1]

    import pytest as _pytest
    for bad in ((0.0, 64), (1.0, 64)):
        with _pytest.raises(ValueError):
            lsh_tune(*bad)
    with _pytest.raises(ValueError):
        lsh_tune(0.5, 64, fp_weight=1.0)
    with _pytest.raises(ValueError):
        lsh_tune(0.5, 1)


# ---------------------------------------------------------------------------
# hamming_near_dups (generalized 64-bit hamming blocking)
# ---------------------------------------------------------------------------

def test_hamming_near_dups_exact_vs_bruteforce(spark):
    import itertools
    import random

    from data_crawler_spark.operators.dedup import hamming_near_dups

    rng = random.Random(7)
    base = [rng.getrandbits(64) for _ in range(20)]
    vals = list(base)
    for h in base[:10]:            # planted near neighbors
        flip = h
        for _ in range(rng.randrange(1, 7)):
            flip ^= 1 << rng.randrange(64)
        vals.append(flip)

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    rows = [(i, signed(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, sim long")
    for max_h in (1, 3, 6):
        got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
               hamming_near_dups(df, max_hamming=max_h).collect()}
        exp = set()
        for (i, a), (j, b) in itertools.combinations(enumerate(vals), 2):
            d = bin(a ^ b).count("1")
            if d <= max_h:
                exp.add((i, j, d))
        assert got == exp, max_h


def test_hamming_near_dups_validation(spark):
    from data_crawler_spark.operators.dedup import hamming_near_dups

    df = spark.createDataFrame([(1, 0)], "doc_id long, sim long")
    with pytest.raises(ValueError):
        hamming_near_dups(df, max_hamming=4, n_chunks=4)  # pigeonhole
    with pytest.raises(ValueError):
        hamming_near_dups(df, n_chunks=0)
    with pytest.raises(ValueError):
        hamming_near_dups(df, n_chunks=65)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------

def _py_winnow(text, k, w):
    import re
    from data_crawler_spark.functions.hashing import xxhash64_str
    toks = re.findall(r"[A-Za-z0-9]+", text.lower())
    if len(toks) < k:
        return set()
    hs = [xxhash64_str(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
    sels = set()
    for p in range(len(hs) - w + 1):
        win = hs[p:p + w]
        m = min(win)
        idx = w - 1 - win[::-1].index(m)   # rightmost min (robust winnowing)
        sels.add((p + idx, m))
    return sels


def test_winnow_mirror_exact(spark):
    from data_crawler_spark.operators.dedup import winnow_fingerprints
    import random
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60))))
            for i in range(12)]
    rows.append((99, "Short doc"))          # below k tokens -> no fingerprints
    rows.append((98, None))                 # null text -> no rows
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp_hash))
    for i, text in rows:
        assert got.get(i, set()) == _py_winnow(text or "", 5, 4), i


def test_winnow_guarantee_shared_span(spark):
    # any shared token run of length >= w + k - 1 must share a fingerprint
    from data_crawler_spark.operators.dedup import winnow_fingerprints
    import random
    rng = random.Random(5)
    k, w = 5, 4
    span = " ".join(f"common{i}" for i in range(k + w - 1))
    mk = lambda seed: " ".join(f"u{seed}x{j}" for j in range(25))
    rows = [(1, mk(1) + " " + span + " " + mk(11)),
            (2, span + " " + mk(2)),
            (3, mk(3))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert fps[1] & fps[2], "guarantee violated: shared t-length span, no shared fp"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_overlap_pairs(spark):
    from data_crawler_spark.operators.dedup import winnow_overlap_pairs
    base = " ".join(f"tok{i}" for i in range(50))
    rows = [(1, base),
            (2, base + " extra trailing words here"),       # heavy overlap w/ 1
            (3, " ".join(f"other{i}" for i in range(50)))]  # unrelated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r for r in
           winnow_overlap_pairs(df, k=5, w=4, min_shared=2).collect()}
    assert (1, 2) in got and got[(1, 2)].overlap > 0.9
    assert all(p == (1, 2) for p in got)


def test_winnow_overlap_max_df_drops_boilerplate(spark):
    from data_crawler_spark.operators.dedup import winnow_overlap_pairs
    footer = " ".join(f"footer{i}" for i in range(20))
    rows = [(i, " ".join(f"doc{i}tok{j}" for j in range(30)) + " " + footer)
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # footer fingerprints appear in all 6 docs; max_df=3 drops them, so
    # no pair survives min_shared
    assert winnow_overlap_pairs(df, k=5, w=4, min_shared=2, max_df=3).count() == 0
    # with the cap lifted, every pair shares the footer
    assert winnow_overlap_pairs(df, k=5, w=4, min_shared=2, max_df=10).count() == 15


def test_winnow_layout_invariance_and_validation(spark):
    from data_crawler_spark.operators.dedup import winnow_fingerprints
    rows = [(i, " ".join(f"v{(i * 7 + j) % 23}" for j in range(40)))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted((r.doc_id, r.pos, r.fp_hash)
               for r in winnow_fingerprints(df, k=4, w=5).collect())
    b = sorted((r.doc_id, r.pos, r.fp_hash)
               for r in winnow_fingerprints(df.repartition(7), k=4, w=5).collect())
    assert a == b
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0, w=4)


def test_winnow_fingerprints_plan_map_only(spark):
    from data_crawler_spark.operators.dedup import winnow_fingerprints
    df = spark.createDataFrame([(1, "a b c d e f g h")],
                               "doc_id long, text string")
    plan = (winnow_fingerprints(df, k=2, w=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_hamming_exact_dup_single_chunk(spark):
    # max_hamming=0 -> n_chunks defaults to 1 -> one 64-bit chunk whose
    # all-ones mask is -1 as a signed long (2**64-1 would overflow);
    # include an all-ones hash so the mask actually bites
    from data_crawler_spark.operators.dedup import hamming_near_dups

    df = spark.createDataFrame(
        [(1, 42), (2, 42), (3, 43), (4, -1), (5, -1)],
        "doc_id long, sim long")
    got = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in
                 hamming_near_dups(df, "doc_id", "sim",
                                   max_hamming=0).collect())
    assert got == [(1, 2, 0), (4, 5, 0)]
