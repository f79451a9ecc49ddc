"""BM25 scoring (operators/search.py) vs an independent in-test mirror."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.search import bm25_topk, term_postings

DOCS = [
    ("d1", "spark engine fast"),
    ("d2", "spark spark slow engine"),
    ("d3", "banana apple"),
    ("d4", ""),
]
N = 4
AVG = (3 + 4 + 2 + 0) / 4


def _bm25(tf, df, dl, k1=1.2, b=0.75):
    idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / AVG))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [("q1", "Spark ENGINE"), ("q2", "banana"), ("q3", "zzz missing")],
        "query_id string, query string")


def test_term_postings(corpus):
    got = {(r["term"], r["doc_id"]): (r["tf"], r["doc_len"])
           for r in term_postings(corpus).collect()}
    assert got[("spark", "d2")] == (2, 4)
    assert got[("spark", "d1")] == (1, 3)
    assert got[("apple", "d3")] == (1, 2)
    assert len(got) == 8  # d4 emits nothing


def test_bm25_matches_mirror(corpus, queries):
    got = {(r["query_id"], r["doc_id"]): (r["score"], r["rank"])
           for r in bm25_topk(corpus, queries).collect()}
    exp_d1 = _bm25(1, 2, 3) + _bm25(1, 2, 3)          # spark + engine
    exp_d2 = _bm25(2, 2, 4) + _bm25(1, 2, 4)
    assert got[("q1", "d1")][0] == pytest.approx(exp_d1, rel=1e-12)
    assert got[("q1", "d2")][0] == pytest.approx(exp_d2, rel=1e-12)
    # ranks follow the mirror's order
    order = sorted([("d1", exp_d1), ("d2", exp_d2)],
                   key=lambda t: (-t[1], t[0]))
    assert got[("q1", order[0][0])][1] == 1
    assert got[("q1", order[1][0])][1] == 2
    assert got[("q2", "d3")][0] == pytest.approx(
        _bm25(1, 1, 2), rel=1e-12)
    # q3 matches nothing; no q3 rows at all
    assert not [k for k in got if k[0] == "q3"]


def test_bm25_topk_truncates(corpus, queries):
    got = bm25_topk(corpus, queries, k=1).collect()
    q1 = [r for r in got if r["query_id"] == "q1"]
    assert len(q1) == 1 and q1[0]["rank"] == 1


def test_bm25_plan(corpus, queries):
    plan = (bm25_topk(corpus, queries)._jdf.queryExecution()
            .executedPlan().toString())
    # query-side joins broadcast; postings never carry text through
    # an exchange
    assert "BroadcastHashJoin" in plan
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in m.group(0)


def test_bm25_empty_corpus(spark, queries):
    empty = spark.createDataFrame([], "doc_id string, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(empty, queries)


# --------------------------------------------------------------------------
# phrase search
# --------------------------------------------------------------------------

PHRASE_DOCS = [
    ("d1", "the marathon route climbs the old hill before the finish"),
    ("d2", "Route climbs, THE OLD hill -- route climbs the old hill."),
    ("d3", "a a a a b"),
    ("d4", "hill old the climbs route"),   # reversed: no phrase hit
    ("d5", None),
]
PHRASE_QUERIES = [
    ("p1", "climbs the old hill"),
    ("p2", "a a"),                         # overlapping occurrences
    ("p3", "finish"),                      # single term
    ("p4", "missing entirely phrase"),
]


def _phrase_mirror():
    out = {}
    for qid, ph in PHRASE_QUERIES:
        pt = re.findall(r"[A-Za-z0-9]+", ph.lower())
        for did, text in PHRASE_DOCS:
            toks = re.findall(r"[A-Za-z0-9]+", (text or "").lower())
            starts = [i for i in range(len(toks) - len(pt) + 1)
                      if toks[i:i + len(pt)] == pt]
            if starts:
                out[(qid, did)] = (len(starts), starts[0])
    return out


def test_phrase_matches_mirror(spark):
    from data_crawler_spark.operators.search import phrase_matches
    corpus = spark.createDataFrame(PHRASE_DOCS, "doc_id string, text string")
    phrases = spark.createDataFrame(PHRASE_QUERIES,
                                    "query_id string, phrase string")
    got = {(r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
           for r in phrase_matches(corpus, phrases).collect()}
    assert got == _phrase_mirror()
    # spot-check the interesting rows against hand counts
    assert got[("p1", "d2")] == (2, 1)     # punctuation/case folded
    assert got[("p2", "d3")] == (3, 0)     # overlapping "a a" x3
    assert ("p1", "d4") not in got         # order matters
    assert ("p4", "d1") not in got


def test_phrase_matches_empty_phrase_rejected(spark):
    from data_crawler_spark.operators.search import phrase_matches
    corpus = spark.createDataFrame(PHRASE_DOCS, "doc_id string, text string")
    bad = spark.createDataFrame([("p0", "--- !!")],
                                "query_id string, phrase string")
    with pytest.raises(ValueError, match="no tokens"):
        phrase_matches(corpus, bad)


def test_phrase_matches_plan_broadcasts_queries(spark):
    from data_crawler_spark.operators.search import phrase_matches
    corpus = spark.createDataFrame(PHRASE_DOCS, "doc_id string, text string")
    phrases = spark.createDataFrame(PHRASE_QUERIES,
                                    "query_id string, phrase string")
    plan = (phrase_matches(corpus, phrases)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the corpus text never rides an exchange — only the compact
    # (query, doc, anchor, offset) rows shuffle
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in m.group(0)


def test_tfidf_top_terms_matches_mirror(spark):
    import math
    import re

    from data_crawler_spark.operators.search import tfidf_top_terms
    from data_crawler_spark.operators.text import WORD_RE

    docs = [
        ("d1", "apple apple banana cherry"),
        ("d2", "banana banana banana date"),
        ("d3", "cherry date elder apple"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
           for r in tfidf_top_terms(df, k=2).collect()}

    wre = re.compile(WORD_RE)
    toks = {d: wre.findall(t.lower()) for d, t in docs}
    dfreq = {}
    for d in toks:
        for term in set(toks[d]):
            dfreq[term] = dfreq.get(term, 0) + 1
    n = len(docs)
    want = {}
    for d in toks:
        scores = sorted(
            ((round(toks[d].count(term) / len(toks[d])
                    * math.log((n + 1) / (dfreq[term] + 1)), 9), term)
             for term in set(toks[d])),
            key=lambda x: (-x[0], x[1]))
        for rank, (sc, term) in enumerate(scores[:2], 1):
            want[(d, rank)] = (term, sc)
    assert got == want

    # min_df prunes hapaxes; empty corpus typed
    pruned = tfidf_top_terms(df, k=3, min_df=2)
    terms = {r["term"] for r in pruned.collect()}
    assert "elder" not in terms  # df=1 dropped
    assert tfidf_top_terms(df.filter(F.lit(False))).count() == 0


def test_phrase_matches_multi_phrase_and_duplicates(spark):
    """Per-PHRASE vote keying: same-length phrases under one query must
    not cross-vote anchors, and a duplicated phrase row must not
    destroy genuine matches (both reproduced pre-fix)."""
    from data_crawler_spark.operators.search import phrase_matches

    corpus = spark.createDataFrame(
        [(1, "alpha delta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [("q1", "alpha beta"), ("q1", "gamma delta"),
         ("q2", "alpha beta"), ("q2", "alpha beta")],
        "query_id string, phrase string")
    got = {(r.query_id, r.doc_id): r.n_matches
           for r in phrase_matches(corpus, phrases).collect()}
    # doc 1 contains NEITHER q1 phrase (was a false positive)
    assert ("q1", 1) not in got
    assert got[("q1", 2)] == 1 and got[("q1", 3)] == 1
    # the duplicated q2 row must not double votes (was an empty result)
    assert got[("q2", 2)] == 1

    import pytest as _p
    with _p.raises(ValueError):
        phrase_matches(corpus, spark.createDataFrame(
            [("q9", None)], "query_id string, phrase string"))


# ---------------------------------------------------------------------------
# Persistent BM25 index (build-once / query-many)
# ---------------------------------------------------------------------------

def _idx_corpus(spark):
    rows = [
        (1, "spark shuffle partitions and catalyst optimizer rules"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "spark catalyst plans broadcast joins for small tables"),
        (4, "arrow batches move columns between jvm and python"),
        (5, "dogs and foxes are animals"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _idx_queries(spark):
    return spark.createDataFrame(
        [(10, "spark catalyst"), (11, "lazy dog")],
        "query_id long, query string")


def test_search_index_matches_bm25_topk(spark, tmp_path):
    from data_crawler_spark.operators.search import SearchIndex, bm25_topk
    corpus, queries = _idx_corpus(spark), _idx_queries(spark)
    idx = SearchIndex.build(spark, tmp_path, corpus)
    want = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
                  for r in bm25_topk(corpus, queries, k=3).collect())
    got = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
                 for r in idx.topk(queries, k=3).collect())
    assert got == want and got


def test_search_index_reopen_and_add(spark, tmp_path):
    from data_crawler_spark.operators.search import SearchIndex, bm25_topk
    corpus, queries = _idx_corpus(spark), _idx_queries(spark)
    SearchIndex.build(spark, tmp_path, corpus)
    idx = SearchIndex(spark, tmp_path)          # reopen from disk
    delta = spark.createDataFrame(
        [(6, "spark spark spark catalyst catalyst")],
        "doc_id long, text string")
    idx.add(delta)
    union = corpus.unionByName(delta)
    want = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
                  for r in bm25_topk(union, queries, k=3).collect())
    got = sorted((r.query_id, r.doc_id, round(r.score, 9), r.rank)
                 for r in idx.topk(queries, k=3).collect())
    assert got == want
    assert 6 in {d for (_, d, _, _) in got}     # the delta doc surfaces
    # a fresh reopen sees the post-add state
    idx2 = SearchIndex(spark, tmp_path)
    assert idx2.n_docs == 6
    with pytest.raises(ValueError):
        idx.add(delta)                          # re-added id refused


def test_search_index_crash_between_commits_stays_consistent(spark, tmp_path):
    from data_crawler_spark.operators.search import SearchIndex
    corpus, queries = _idx_corpus(spark), _idx_queries(spark)
    idx = SearchIndex.build(spark, tmp_path, corpus)
    before = sorted((r.query_id, r.doc_id, round(r.score, 9))
                    for r in idx.topk(queries, k=3).collect())
    # simulate a crash between the postings append and the stats
    # commit: new postings version lands, stats still pin the old one
    extra = spark.createDataFrame(
        [("spark", 7, 5, 5)], "term string, doc_id long, tf bigint, "
        "doc_len bigint")
    idx._postings.write(extra, mode="append")
    reopened = SearchIndex(spark, tmp_path)
    after = sorted((r.query_id, r.doc_id, round(r.score, 9))
                   for r in reopened.topk(queries, k=3).collect())
    assert after == before                      # old pairing still served


def test_search_index_unbuilt_raises(spark, tmp_path):
    from data_crawler_spark.operators.search import SearchIndex
    with pytest.raises(ValueError):
        SearchIndex(spark, tmp_path / "nothing_here")


# ---------------------------------------------------------------------------
# BM25 hard-negative mining
# ---------------------------------------------------------------------------

def test_mine_hard_negatives(spark, tmp_path):
    from data_crawler_spark.operators.search import (SearchIndex, bm25_topk,
                                                     mine_hard_negatives)
    # the corpus must contain non-positive docs sharing query terms —
    # BM25 can only rank docs with term overlap, so negatives come
    # from the lexically-confusable pool (which is the point)
    corpus = _idx_corpus(spark).unionByName(spark.createDataFrame(
        [(6, "spark streaming watermarks handle late data"),
         (7, "my dog is lazy on most sunday mornings"),
         (8, "catalyst for chemical reactions in the lab")],
        "doc_id long, text string"))
    pairs = spark.createDataFrame(
        [(10, "spark catalyst", 1),       # doc 1 labeled positive
         (10, "spark catalyst", 3),       # two positives for one query
         (11, "lazy dog", 2)],
        "query_id long, query string, pos_doc_id long")
    got = mine_hard_negatives(corpus, pairs, n_neg=2, depth=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    # every labeled positive excluded
    assert {r.doc_id for r in by_q[10]}.isdisjoint({1, 3})
    assert 2 not in {r.doc_id for r in by_q[11]}
    # negatives are the best-ranked REMAINING bm25 hits, re-ranked 1..n
    pool = bm25_topk(corpus, pairs.select("query_id", "query").distinct(),
                     k=5).collect()
    for qid, positives in ((10, {1, 3}), (11, {2})):
        want = [r.doc_id for r in sorted(
            (p for p in pool if p.query_id == qid
             and p.doc_id not in positives), key=lambda p: p.rank)][:2]
        assert [r.doc_id for r in sorted(by_q[qid],
                                         key=lambda r: r.neg_rank)] == want
        assert sorted(r.neg_rank for r in by_q[qid]) == list(
            range(1, len(by_q[qid]) + 1))
    # index-backed mining returns the same negatives
    idx = SearchIndex.build(spark, tmp_path, corpus)
    got_idx = sorted((r.query_id, r.doc_id, r.neg_rank) for r in
                     mine_hard_negatives(corpus, pairs, n_neg=2, depth=5,
                                         index=idx).collect())
    assert got_idx == sorted((r.query_id, r.doc_id, r.neg_rank) for r in got)
    import pytest
    with pytest.raises(ValueError):
        mine_hard_negatives(corpus, pairs, n_neg=5, depth=3)
