"""Hashed n-gram LM (Stupid Backoff) perplexity filter: bit-exact
mirror of the scoring spec in operators/lm.py, plus the CCNet
head/middle/tail bucketing."""

import math
import re

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.functions.hashing import to_signed64, xxhash64_bytes
from data_crawler_spark.operators.lm import (lm_score, perplexity_buckets,
                                             train_ngram_lm)

ALPHA = 0.4


def _toks(text):
    return re.findall(r"[A-Za-z0-9]+", text.lower())


def _h(words):
    return to_signed64(xxhash64_bytes(" ".join(words).encode()))


def _ref_model(ref_texts, n, min_count=1):
    counts, total = {}, 0
    for t in ref_texts:
        toks = _toks(t)
        total += len(toks)
        for k in range(1, n + 1):
            for i in range(len(toks) - k + 1):
                key = (k, _h(toks[i:i + k]))
                counts[key] = counts.get(key, 0) + 1
    if min_count > 1:
        counts = {k: c for k, c in counts.items() if c >= min_count}
    return counts, total


def _ref_score(text, counts, total, n):
    """Pure-Python mirror of the lm_score spec: (tokens, logprob)."""
    toks = _toks(text)
    logp = 0.0
    for i in range(len(toks)):
        kmax = min(n, i + 1)
        s = None
        for k in range(kmax, 0, -1):
            cg = counts.get((k, _h(toks[i - k + 1:i + 1])))
            if cg:
                ctx = (total if k == 1
                       else counts.get((k - 1, _h(toks[i - k + 1:i])), cg))
                s = math.log10(cg / ctx) + (kmax - k) * math.log10(ALPHA)
                break
        if s is None:
            s = kmax * math.log10(ALPHA) - math.log10(total)
        logp += s
    return len(toks), logp


REF = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox likes the quiet barn",
    "a lazy dog sleeps in the quiet barn all day",
    "the brown dog jumps in the barn",
]
CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),   # in-domain
    (2, "the quick brown fox naps in the barn"),          # mostly in-domain
    (3, "zxq vvw qqq plk mmm zzz unseen garble tokens"),  # all-unseen
    (4, ""),                                              # empty
    (5, "quick brown"),                                   # short: kmax < n
    (6, "barn the over jumps dog quick"),                 # seen words, odd order
]


@pytest.fixture(scope="module")
def frames(spark):
    ref = spark.createDataFrame([(i, t) for i, t in enumerate(REF)],
                                "doc_id long, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return ref, corpus


def test_model_counts_match_mirror(spark, frames):
    ref, _ = frames
    model, total = train_ngram_lm(ref, n=3)
    got = {(r.k, r.h): r.cnt for r in model.collect()}
    want, want_total = _ref_model(REF, 3)
    assert got == want
    assert total == want_total


def test_min_count_prunes(spark, frames):
    ref, _ = frames
    model, _ = train_ngram_lm(ref, n=2, min_count=2)
    got = {(r.k, r.h): r.cnt for r in model.collect()}
    want, _ = _ref_model(REF, 2, min_count=2)
    assert got == want and all(c >= 2 for c in got.values())


@pytest.mark.parametrize("n", [1, 2, 3])
def test_scores_match_mirror(spark, frames, n):
    ref, corpus = frames
    model, total = train_ngram_lm(ref, n=n)
    counts, rt = _ref_model(REF, n)
    out = {r.doc_id: r for r in
           lm_score(corpus, model, total, n=n).collect()}
    assert set(out) == {i for i, _ in CORPUS}
    for i, t in CORPUS:
        want_toks, want_lp = _ref_score(t, counts, rt, n)
        assert out[i].lm_tokens == want_toks
        if want_toks == 0:
            assert out[i].lm_ppl is None
        else:
            assert out[i].lm_logprob == pytest.approx(want_lp, rel=1e-9)
            assert out[i].lm_ppl == pytest.approx(
                10.0 ** (-want_lp / want_toks), rel=1e-9)


def test_in_domain_beats_garbage(spark, frames):
    ref, corpus = frames
    model, total = train_ngram_lm(ref, n=3)
    ppl = {r.doc_id: r.lm_ppl for r in lm_score(corpus, model, total).collect()}
    assert ppl[1] < ppl[2]            # verbatim sentence << unseen garble
    assert ppl[1] < ppl[6]            # fluent order << shuffled words
    # all-unseen doc is exactly the floor: every position scores
    # alpha^kmax / N with kmax = min(3, i+1)
    counts, rt = _ref_model(REF, 3)
    toks, lp = _ref_score(CORPUS[2][1], counts, rt, 3)
    floor = sum(min(3, i + 1) * math.log10(ALPHA) - math.log10(rt)
                for i in range(toks))
    assert lp == pytest.approx(floor, rel=1e-12)
    assert ppl[3] == pytest.approx(10.0 ** (-floor / toks), rel=1e-9)


def test_shuffle_join_path_matches_broadcast(spark, frames):
    ref, corpus = frames
    model, total = train_ngram_lm(ref, n=3)
    b = {r.doc_id: r.lm_logprob
         for r in lm_score(corpus, model, total).collect()}
    s = {r.doc_id: r.lm_logprob
         for r in lm_score(corpus, model, total, hint=None).collect()}
    for i in b:
        assert (b[i] is None) == (s[i] is None)
        if b[i] is not None:
            assert s[i] == pytest.approx(b[i], rel=1e-12)


def test_partitioning_invariance(spark, frames):
    ref, corpus = frames
    model, total = train_ngram_lm(ref, n=3)
    one = {r.doc_id: r.lm_logprob
           for r in lm_score(corpus.coalesce(1), model, total).collect()}
    wide = {r.doc_id: r.lm_logprob
            for r in lm_score(corpus.repartition(7), model, total).collect()}
    for i in one:
        if one[i] is not None:
            assert wide[i] == pytest.approx(one[i], rel=1e-12)


def test_plan_shape(spark, frames):
    # both model lookups broadcast under the default hint; the whole
    # scoring path stays JVM-side (no Python eval anywhere)
    ref, corpus = frames
    model, total = train_ngram_lm(ref, n=3)
    plan = (lm_score(corpus, model, total)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") == 2
    assert "Python" not in plan


def _np_pctl(vals, q):
    import numpy as np
    return float(np.percentile(np.asarray(vals, dtype=float), q * 100,
                               method="linear"))


def test_buckets_exact_global(spark):
    # ppl 1..100 plus a null: exact percentile thresholds match numpy's
    # linear interpolation (Spark's percentile uses the same rule)
    rows = [(i, float(i)) for i in range(1, 101)] + [(999, None)]
    df = spark.createDataFrame(rows, "doc_id long, lm_ppl double")
    out = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(df, head_frac=0.1, middle_frac=0.4,
                                       exact=True).collect()}
    t1 = _np_pctl(range(1, 101), 0.1)
    t2 = _np_pctl(range(1, 101), 0.5)
    for i in range(1, 101):
        want = "head" if i <= t1 else ("middle" if i <= t2 else "tail")
        assert out[i] == want, (i, t1, t2)
    assert out[999] is None
    got = [out[i] for i in range(1, 101)]
    assert got.count("head") == 10 and got.count("middle") == 40


def test_buckets_per_group(spark):
    # two "languages" with disjoint ppl ranges: thresholds must be
    # per-group, so each group gets its own head
    rows = ([(i, "en", float(i)) for i in range(1, 21)]
            + [(100 + i, "de", 1000.0 + i) for i in range(1, 21)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, lm_ppl double")
    out = perplexity_buckets(df, head_frac=0.25, middle_frac=0.25,
                             by="lang", exact=True).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.lm_ppl, r.ppl_bucket))
    for lang, pairs in by_lang.items():
        pairs.sort()
        labels = [b for _, b in pairs]
        assert labels == (["head"] * 5 + ["middle"] * 5 + ["tail"] * 10)


def test_buckets_null_group_gets_own_thresholds(spark):
    # docs whose group value is NULL are a real group: they must bucket
    # against their own thresholds, not silently land in 'tail'
    rows = ([(i, "en", float(i)) for i in range(1, 5)]
            + [(100 + i, None, float(i)) for i in range(1, 5)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, lm_ppl double")
    out = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(df, head_frac=0.25,
                                       middle_frac=0.25, by="lang",
                                       exact=True).collect()}
    assert out[101] == "head"
    assert [out[100 + i] for i in range(1, 5)] == \
        [out[i] for i in range(1, 5)]   # identical ppl -> identical buckets


def test_bucket_validation_and_empty(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, lm_ppl double")
    out = perplexity_buckets(df, exact=True).collect()
    assert out[0].ppl_bucket is None          # nothing scoreable
    with pytest.raises(ValueError):
        perplexity_buckets(df, head_frac=0.8, middle_frac=0.3)
    with pytest.raises(ValueError):
        train_ngram_lm(df, n=0)
    with pytest.raises(ValueError):
        lm_score(df, df, total_tokens=0)


def test_scoring_fuzz_random_corpus(spark):
    """Seeded fuzz: random small-vocab docs (forces heavy n-gram
    overlap, deep backoff chains, pruning) must match the mirror."""
    import random

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    ref_rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 30))))
                for i in range(25)]
    doc_rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 25))))
                for i in range(25)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    for n, min_count in ((2, 1), (3, 2)):
        model, total = train_ngram_lm(ref, n=n, min_count=min_count)
        counts, rt = _ref_model([t for _, t in ref_rows], n, min_count)
        assert total == rt
        got = {r.doc_id: r for r in
               lm_score(docs, model, total, n=n).collect()}
        for i, t in doc_rows:
            want_toks, want_lp = _ref_score(t, counts, rt, n)
            assert got[i].lm_tokens == want_toks
            if want_toks:
                assert got[i].lm_logprob == pytest.approx(want_lp,
                                                          rel=1e-9)


def test_perplexity_buckets_quoted_column_name(spark):
    from data_crawler_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)],
        "doc_id long, `lm ppl` double")
    out = perplexity_buckets(df, ppl_col="lm ppl",
                             head_frac=0.25, middle_frac=0.5)
    got = {r.doc_id: r.ppl_bucket for r in out.collect()}
    assert got[1] == "head" and got[4] == "tail"
