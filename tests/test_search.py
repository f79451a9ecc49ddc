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
