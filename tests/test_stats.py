"""Corpus statistics report: exact values vs a pure-Python mirror."""

import re

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.stats import corpus_stats, gate_pass_rates
from data_crawler_spark.operators.text import gopher_rules

ROWS = [
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "the quick brown fox jumps over the lazy dog"),  # exact dup
    (3, "en", "The  Quick  Brown  Fox  jumps over the lazy dog"),  # norm dup
    (4, "de", "der schnelle braune fuchs"),
    (5, "de", ""),
    (6, "en", "a count of items and the list of things to have today"),
]


def _ntok(t):
    return len(re.findall(r"[A-Za-z0-9]+", t.lower()))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, lang string, text string")


def test_global_stats_exact(spark, corpus):
    r = corpus_stats(corpus, exact_distinct=True).collect()[0]
    toks = [_ntok(t) for _, _, t in ROWS]
    assert r.n_docs == 6
    assert r.total_tokens == sum(toks)
    assert r.total_chars == sum(len(t) for _, _, t in ROWS)
    assert r.mean_tokens == pytest.approx(sum(toks) / 6, abs=1e-4)
    assert r.n_empty_docs == 1
    # docs 1,2,3 share one normalized fingerprint -> 4 distinct contents
    assert r.distinct_contents == 4
    assert r.dup_rate == pytest.approx(1 - 4 / 6, abs=1e-4)
    assert r.p50_tokens in toks  # approx-percentile returns a sample value


def test_grouped_stats(spark, corpus):
    out = {r.lang: r for r in
           corpus_stats(corpus, group_cols=("lang",),
                        exact_distinct=True).collect()}
    assert out["en"].n_docs == 4 and out["de"].n_docs == 2
    assert out["en"].distinct_contents == 2   # dup triple + doc 6
    assert out["en"].dup_rate == pytest.approx(0.5, abs=1e-4)
    assert out["de"].n_empty_docs == 1 and out["de"].dup_rate == 0.0


def test_hll_close_to_exact(spark, corpus):
    est = corpus_stats(corpus).collect()[0].distinct_contents
    assert abs(est - 4) <= 1      # HLL at n=6 is near-exact


def test_null_text_counts_as_empty(spark):
    df = spark.createDataFrame([(1, None), (2, None), (3, "")],
                               "doc_id long, text string")
    r = corpus_stats(df, exact_distinct=True).collect()[0]
    assert r.n_docs == 3 and r.n_empty_docs == 3
    assert r.total_tokens == 0 and r.total_chars == 0
    # null and "" share the empty-string fingerprint
    assert r.distinct_contents == 1
    assert r.dup_rate == pytest.approx(1 - 1 / 3, abs=1e-4)


def test_gate_pass_rates(spark, corpus):
    flagged = gopher_rules(corpus, min_words=5)
    out = gate_pass_rates(flagged, ("rule_word_count", "rule_stopwords"),
                          group_cols=("lang",))
    got = {r.lang: r for r in out.collect()}
    # en: all four docs clear 5 words; only doc 6 hits >=2 DISTINCT
    # Gopher stopwords (docs 1-3 contain just "the")
    assert got["en"].rule_word_count_pass_rate == 1.0
    assert got["en"].rule_stopwords_pass_rate == pytest.approx(0.25)
    # de: 4-word doc + empty doc both fail word count
    assert got["de"].rule_word_count_pass_rate == 0.0
    with pytest.raises(ValueError):
        gate_pass_rates(flagged, ("no_such_rule",))


def test_stats_plan_is_single_pass(spark, corpus):
    plan = (corpus_stats(corpus)._jdf.queryExecution()
            .executedPlan().toString())
    # one partial+final aggregate pair, no Python, no join
    assert "Python" not in plan and "Join" not in plan

def test_split_leakage(spark):
    from data_crawler_spark.operators.stats import split_leakage
    splits = spark.createDataFrame(
        [("d1", "train"), ("d2", "train"), ("d3", "val"),
         ("d4", "test"), ("d5", "val")],
        "doc_id string, split string")
    pairs = spark.createDataFrame(
        [("d1", "d2"),   # same split: clean
         ("d2", "d3"),   # train/val leak
         ("d4", "d5"),   # test/val leak
         ("d3", "d5")],  # same split: clean
        "id_a string, id_b string")
    got = {(r["id_a"], r["id_b"], r["split_a"], r["split_b"])
           for r in split_leakage(splits, pairs).collect()}
    assert got == {("d2", "d3", "train", "val"),
                   ("d4", "d5", "test", "val")}


def test_split_leakage_domain_split_clean(spark):
    """domain_split's construction claim: near-dup pairs inside one
    registered domain can never straddle splits."""
    from data_crawler_spark.operators.hosts import domain_split
    from data_crawler_spark.operators.stats import split_leakage
    docs = spark.createDataFrame(
        [(f"http://site{i % 7}.test/p{j}",) for i in range(7)
         for j in range(4)], "url string")
    split = domain_split(docs, fractions={"train": 0.6, "val": 0.2,
                                          "test": 0.2})
    # same-domain pairs (the ones a near-dup pass would emit for
    # template pages)
    pairs = spark.createDataFrame(
        [(f"http://site{i}.test/p0", f"http://site{i}.test/p{j}")
         for i in range(7) for j in range(1, 4)],
        "id_a string, id_b string")
    leak = split_leakage(split.withColumnRenamed("url", "doc_id"),
                         pairs)
    assert leak.count() == 0


def test_split_leakage_surfaces_missing_ids(spark):
    """A pair member absent from the split table is an audit finding
    (null split), never a silently-dropped row."""
    from data_crawler_spark.operators.stats import split_leakage

    splits = spark.createDataFrame(
        [("a", "train"), ("b", "train"), ("c", "test")],
        "doc_id string, split string")
    pairs = spark.createDataFrame(
        [("a", "b"),       # same split: clean
         ("a", "c"),       # cross-split leak
         ("a", "ghost"),   # member never assigned
         ("g1", "g2")],    # both unassigned
        "id_a string, id_b string")
    got = {(r.id_a, r.id_b): (r.split_a, r.split_b)
           for r in split_leakage(splits, pairs).collect()}
    assert got == {("a", "c"): ("train", "test"),
                   ("a", "ghost"): ("train", None),
                   ("g1", "g2"): (None, None)}


# ---------------------------------------------------------------------------
# threshold_curve
# ---------------------------------------------------------------------------

def test_threshold_curve_mirror(spark):
    import random

    from data_crawler_spark.operators.stats import threshold_curve

    rng = random.Random(3)
    rows = [(i, rng.uniform(0.0, 1.0), rng.randrange(1, 500))
            for i in range(300)] + [(999, None, 50)]
    df = spark.createDataFrame(rows, "doc_id long, score double, "
                                     "n_tokens long")
    n_bins = 20
    curve = threshold_curve(df, "score", n_bins=n_bins,
                            weight_col="n_tokens",
                            lo=0.0, hi=1.0).collect()
    assert len(curve) == n_bins
    scored = [(s, w) for _, s, w in rows if s is not None]
    total_n, total_m = len(scored), sum(w for _, w in scored)
    for r in curve:
        t = r["threshold"]
        n = sum(1 for s, _ in scored if s >= t)
        m = float(sum(w for s, w in scored if s >= t))
        assert r["n_docs"] == n, t
        assert abs(r["mass"] - m) < 1e-6, t
        assert abs(r["frac_docs"] - n / total_n) < 1e-12
        assert abs(r["frac_mass"] - m / total_m) < 1e-9
    # thresholds ascend, survivors monotonically shrink
    ts = [r["threshold"] for r in curve]
    assert ts == sorted(ts)
    ns = [r["n_docs"] for r in curve]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_threshold_curve_auto_bounds_and_degenerate(spark):
    from data_crawler_spark.operators.stats import threshold_curve

    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "doc_id long, score double")
    curve = threshold_curve(df, "score", n_bins=9).collect()
    # auto bounds [0, 9): bin width 1, every row keeps score >= i
    assert [r["n_docs"] for r in curve] == list(range(10, 1, -1))
    # constant scores: single meaningful bin, everything survives
    const = spark.createDataFrame([(i, 2.5) for i in range(4)],
                                  "doc_id long, score double")
    c2 = threshold_curve(const, "score", n_bins=5).collect()
    assert c2[0]["n_docs"] == 4 and c2[0]["threshold"] == 2.5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        threshold_curve(df, "score", n_bins=0)


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------

def _zipf_mirror(texts, max_rank):
    import re
    from collections import Counter
    import numpy as np
    c = Counter()
    for t in texts:
        c.update(re.findall(r"[A-Za-z0-9]+", t.lower()))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    if max_rank is not None:
        ranked = ranked[:max_rank]
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([cnt for _, cnt in ranked], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    return slope, intercept, r * r, len(ranked), sum(cnt for _, cnt in ranked)


def test_zipf_fit_mirror(spark):
    from data_crawler_spark.operators.stats import zipf_fit
    import random
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(200)]
    # zipfian draw: word i with weight 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(200)]
    texts = [" ".join(rng.choices(vocab, weights)[0] for _ in range(300))
             for _ in range(20)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for max_rank in (None, 50):
        row = zipf_fit(df, max_rank=max_rank).collect()[0]
        slope, intercept, r2, n_terms, n_tokens = _zipf_mirror(texts, max_rank)
        assert abs(row.slope - slope) < 1e-9
        assert abs(row.intercept - intercept) < 1e-9
        assert abs(row.r2 - r2) < 1e-9
        assert row.n_terms == n_terms and row.n_tokens == n_tokens
    assert -1.6 < row.slope < -0.4        # zipf-ish corpus fits near -1


def test_zipf_fit_degenerate(spark):
    from data_crawler_spark.operators.stats import zipf_fit
    # single distinct term: zero rank variance -> null slope, not a crash
    df = spark.createDataFrame([("same same same",)], "text string")
    row = zipf_fit(df).collect()[0]
    assert row.slope is None and row.n_terms == 1 and row.n_tokens == 3


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth
# ---------------------------------------------------------------------------

def test_vocab_growth_exact_at_small_scale(spark):
    from data_crawler_spark.operators.stats import vocab_growth
    from data_crawler_spark.functions.hashing import xxhash64_str
    import re
    import random
    rng = random.Random(17)
    vocab = [f"word{i}" for i in range(300)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_points = 8
    got = {r.point: (r.n_tokens, r.vocab_est)
           for r in vocab_growth(df, n_points=n_points).collect()}
    # mirror: same bucket rule (xxhash64 of the STRING form of the id)
    buckets = {i: xxhash64_str(str(i)) % n_points for i, _ in rows}
    for p in range(n_points):
        toks = []
        for i, text in rows:
            if buckets[i] <= p:
                toks += re.findall(r"[A-Za-z0-9]+", text.lower())
        assert got[p][0] == len(toks), p
        # sketches are near-exact at this cardinality
        assert abs(got[p][1] - len(set(toks))) <= max(2, 0.02 * len(set(toks))), p
    ests = [got[p][1] for p in range(n_points)]
    assert ests == sorted(ests)          # nested prefixes -> monotone vocab


def test_vocab_growth_validation(spark):
    from data_crawler_spark.operators.stats import vocab_growth
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest
    with pytest.raises(ValueError):
        vocab_growth(df, n_points=1)


def test_threshold_curve_empty_input(spark):
    from data_crawler_spark.operators.stats import threshold_curve

    # a gate that filtered everything out still yields a zero curve
    # (data-derived bounds fall back to [0, 1))
    empty = spark.createDataFrame([], "score double")
    rows = threshold_curve(empty, "score", n_bins=5).collect()
    assert len(rows) == 5
    assert all(r["n_docs"] == 0 and r["frac_docs"] == 0.0
               and r["mass"] == 0.0 and r["frac_mass"] == 0.0
               for r in rows)
    # all-null scores are the same degenerate case
    nulls = spark.createDataFrame([(None,), (None,)], "score double")
    rows = threshold_curve(nulls, "score", n_bins=3).collect()
    assert len(rows) == 3 and all(r["n_docs"] == 0 for r in rows)
