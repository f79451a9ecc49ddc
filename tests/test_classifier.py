"""Hashed-BoW multinomial Naive Bayes (operators/classifier.py):
train/score/predict pinned against a bit-exact pure-Python mirror
over the shared xxhash64 feature space."""

from __future__ import annotations

import math
import re

import pytest

from data_crawler_spark.functions.hashing import to_signed64, xxhash64_bytes
from data_crawler_spark.operators.classifier import (
    nb_posterior,
    nb_predict,
    nb_score,
    pareto_quality_filter,
    train_nb,
)

N_BUCKETS = 512

LABELED = [
    (1, "wiki", "the battle of hastings occurred in the year and the "
        "kingdom passed to a new line of rulers of it"),
    (2, "wiki", "a treaty of alliance is signed in the capital and it "
        "is the start of a long peace in the region"),
    (3, "spam", "buy cheap pills now best price buy now click here "
        "free offer buy cheap now"),
    (4, "spam", "winner winner claim your free prize now click now "
        "limited offer best deal"),
    (5, "wiki", "the river flows north to the sea and the delta is "
        "home to a population of rare birds of it"),
]
CORPUS = [
    (10, "the kingdom and the treaty of peace in the region of it"),
    (11, "buy now free prize click here best offer"),
    (12, "completely novel vocabulary zzz qqq xyzzy"),
    (13, ""),                     # token-less: priors only
]


def _buckets(text, ngram_sizes=(1, 2)):
    toks = re.findall(r"[A-Za-z0-9]+", text.lower())
    out = {}
    for n in ngram_sizes:
        for i in range(len(toks) - n + 1):
            b = to_signed64(xxhash64_bytes(
                " ".join(toks[i:i + n]).encode())) % N_BUCKETS
            out[b] = out.get(b, 0) + 1
    return out


def _mirror_scores(alpha=1.0):
    by_class, totals, n_docs = {}, {}, {}
    for _, lab, text in LABELED:
        n_docs[lab] = n_docs.get(lab, 0) + 1
        for b, c in _buckets(text).items():
            by_class[(lab, b)] = by_class.get((lab, b), 0) + c
            totals[lab] = totals.get(lab, 0) + c
    n_total = sum(n_docs.values())
    scores = {}
    for did, text in CORPUS:
        f = _buckets(text)
        for lab in n_docs:
            denom = totals[lab] + alpha * N_BUCKETS
            s = math.log(n_docs[lab] / n_total)
            for b, c in f.items():
                s += c * math.log((by_class.get((lab, b), 0) + alpha)
                                  / denom)
            scores[(did, lab)] = s
    return scores


@pytest.fixture(scope="module")
def frames(spark):
    labeled = spark.createDataFrame(
        LABELED, "doc_id long, label string, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model, classes = train_nb(labeled, n_buckets=N_BUCKETS)
    scores = nb_score(corpus, model.localCheckpoint(),
                      classes.localCheckpoint(), n_buckets=N_BUCKETS)
    return scores


def test_nb_scores_match_mirror(frames):
    got = {(r["doc_id"], r["label"]): r["score"] for r in frames.collect()}
    want = _mirror_scores()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_nb_predict(frames):
    pred = {r["doc_id"]: (r["label"], r["margin"])
            for r in nb_predict(frames).collect()}
    want = _mirror_scores()
    assert pred[10][0] == "wiki" and pred[11][0] == "spam"
    for did in (10, 11, 12, 13):
        s = {lab: want[(did, lab)] for lab in ("wiki", "spam")}
        top = max(s, key=lambda lab: (s[lab], ))
        assert pred[did][0] == top or s["wiki"] == s["spam"]
        assert pred[did][1] == pytest.approx(
            abs(s["wiki"] - s["spam"]), rel=1e-9)


def test_nb_model_shapes_and_validation(spark):
    labeled = spark.createDataFrame(
        LABELED, "doc_id long, label string, text string")
    model, classes = train_nb(labeled, n_buckets=N_BUCKETS)
    assert classes.count() == 2
    assert model.count() <= 2 * N_BUCKETS
    # delta is logp - floor: strictly positive for seen buckets
    assert model.where("delta <= 0").count() == 0
    with pytest.raises(ValueError, match="alpha"):
        train_nb(labeled, alpha=0.0)
    empty = spark.createDataFrame([], "doc_id long, label string, "
                                      "text string")
    with pytest.raises(ValueError, match="empty"):
        train_nb(empty)


def _mirror_posteriors():
    want = _mirror_scores()
    out = {}
    for did, _ in CORPUS:
        s = {lab: want[(did, lab)] for lab in ("wiki", "spam")}
        m = max(s.values())
        z = sum(math.exp(v - m) for v in s.values())
        for lab, v in s.items():
            out[(did, lab)] = math.exp(v - m) / z
    return out


def test_nb_posterior_softmax_mirror(frames):
    got = {(r["doc_id"], r["label"]): r["prob"]
           for r in nb_posterior(frames).collect()}
    want = _mirror_posteriors()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    by_doc = {}
    for (did, _), p in got.items():
        by_doc[did] = by_doc.get(did, 0.0) + p
    for did, tot in by_doc.items():
        assert tot == pytest.approx(1.0, rel=1e-12), did


def test_pareto_quality_filter_matches_mirror(spark):
    """Exact kept-set equality with the pure-Python GPT-3 acceptance
    rule (same posterior, same xxhash64-folded Lomax draw)."""
    seed, shape = 3, 9.0
    labeled = spark.createDataFrame(
        LABELED, "doc_id long, label string, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model, classes = train_nb(labeled, n_buckets=N_BUCKETS)
    kept = {r["doc_id"] for r in pareto_quality_filter(
        corpus, model, classes, "wiki", n_buckets=N_BUCKETS,
        pareto_shape=shape, seed=seed).collect()}
    probs = _mirror_posteriors()
    want = set()
    for did, _ in CORPUS:
        u = to_signed64(xxhash64_bytes(f"{did}:{seed}".encode())) \
            / 2.0 ** 64 + 0.5
        draw = (1.0 - u) ** (-1.0 / shape) - 1.0
        if draw > 1.0 - probs[(did, "wiki")]:
            want.add(did)
    assert kept == want
    # wiki-looking doc has prob ~1 -> must survive any draw
    assert 10 in kept
    with pytest.raises(ValueError, match="pareto_shape"):
        pareto_quality_filter(corpus, model, classes, "wiki",
                              pareto_shape=0.0)


def test_clean_corpus_classifier_stage(spark):
    """clean_corpus(clf_labeled=...) equals the direct train +
    pareto_quality_filter composition (pipeline uses seed+2)."""
    from data_crawler_spark.plans.corpus_pipeline import clean_corpus
    labeled = spark.createDataFrame(
        LABELED, "doc_id long, label string, text string")
    corpus = spark.createDataFrame(
        [(i, t) for i, t in CORPUS if t], "doc_id long, text string")
    out = clean_corpus(corpus, quality=False, repetition=False,
                       exact=False, near_dup_threshold=None,
                       clf_labeled=labeled, clf_positive="wiki",
                       clf_n_buckets=N_BUCKETS, seed=5)
    model, classes = train_nb(labeled, n_buckets=N_BUCKETS)
    want = {r["doc_id"] for r in pareto_quality_filter(
        corpus, model, classes, "wiki", n_buckets=N_BUCKETS,
        seed=7).collect()}
    assert {r["doc_id"] for r in out.collect()} == want
    assert set(out.columns) == {"doc_id", "text", "n_tokens"}


def test_nb_score_plan_broadcasts_model(spark, frames):
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in m.group(0)


def test_focused_priority_orders_topical_targets(spark):
    from data_crawler_spark.operators.classifier import focused_priority
    labeled = spark.createDataFrame(
        LABELED, "doc_id long, label string, text string")
    model, classes = train_nb(labeled, n_buckets=N_BUCKETS)
    anchors = spark.createDataFrame(
        [("http://x.test/s", "http://on.test/a", "treaty of the kingdom"),
         ("http://y.test/s", "http://on.test/a", "peace in the region"),
         ("http://x.test/s", "http://off.test/b", "buy cheap pills now"),
         ("http://y.test/s", "http://off.test/b", "free prize click here")],
        "source_url string, target_url string, anchor string")
    pri = {r["target_url"]: r["priority"] for r in focused_priority(
        anchors, model, classes, "wiki", n_buckets=N_BUCKETS).collect()}
    assert set(pri) == {"http://on.test/a", "http://off.test/b"}
    assert pri["http://on.test/a"] > 0.5 > pri["http://off.test/b"]
    # posterior is a probability
    for v in pri.values():
        assert 0.0 <= v <= 1.0


def test_featureless_class_survives_training(spark):
    """A class whose documents produce zero WORD_RE features (all-CJK
    text) must stay in the model with the uniform smoothing floor, not
    silently vanish so nb_predict can never emit it."""
    from data_crawler_spark.operators.classifier import (nb_predict,
                                                         nb_score,
                                                         train_nb)

    labeled = spark.createDataFrame(
        [(1, "hello world good text", "good"),
         (2, "more wholesome english words", "good"),
         (3, "你好世界", "junk"),
         (4, "再见朋友", "junk")],
        "doc_id long, text string, label string")
    model, classes = train_nb(labeled, n_buckets=64)
    assert {r.label for r in classes.collect()} == {"good", "junk"}
    # a featureless probe doc ties on features; the equal prior makes
    # the verdict the deterministic label tie-break, and an
    # english-looking doc still classifies good
    probe = spark.createDataFrame(
        [(10, "hello good world"), (11, "你好")],
        "doc_id long, text string")
    got = {r.doc_id: r.label
           for r in nb_predict(nb_score(probe, model, classes,
                                        n_buckets=64)).collect()}
    assert got[10] == "good"
    assert got[11] in ("good", "junk")   # defined, never a crash
