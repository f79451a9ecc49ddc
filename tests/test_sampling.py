"""Mixture sampling / hash split: exact-set equality with a pure-Python
mirror (bit-exact xxhash64 + identical double fold), mixture math,
determinism across partitionings."""

import math

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.functions.hashing import to_signed64, xxhash64_bytes
from data_crawler_spark.operators.sampling import (
    hash_split, mixture_rates, sample_corpus_mixture, uniform_hash_col)


def _u(doc_id, seed):
    h = to_signed64(xxhash64_bytes(f"{doc_id}:{seed}".encode()))
    return h / 2.0 ** 64 + 0.5


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return (spark.createDataFrame(rows, "doc_id long, lang string")
            .repartition(8))


def test_uniform_hash_matches_python_mirror(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {r.doc_id: r.u for r in
           df.select("doc_id",
                     uniform_hash_col(F.col("doc_id"), 7).alias("u"))
           .collect()}
    for i in range(500):
        assert got[i] == _u(i, 7), i
        assert 0.0 <= got[i] <= 1.0


def test_mixture_rates_math():
    counts = {"en": 1000, "de": 100, "fr": 10}
    # demand 1:1:1 -> fr binds (10/w each), en/de downsample to 10
    r = mixture_rates(counts, weights={"en": 1, "de": 1, "fr": 1})
    assert r["fr"] == 1.0
    assert r["en"] == pytest.approx(10 / 1000)
    assert r["de"] == pytest.approx(10 / 100)
    # absent from weights -> dropped
    r = mixture_rates(counts, weights={"en": 1.0})
    assert r == {"en": 1.0, "de": 0.0, "fr": 0.0}
    # temperature 1 keeps the natural mixture: every rate 1.0
    r = mixture_rates(counts, temperature=1.0)
    assert set(r.values()) == {1.0}
    # T>1 flattens: the smallest group binds at 1.0, others shrink by
    # (c_g/c_min)^(1/T - 1)
    r = mixture_rates(counts, temperature=2.0)
    assert r["fr"] == 1.0
    assert r["en"] == pytest.approx((1000 / 10) ** -0.5)
    assert r["de"] == pytest.approx((100 / 10) ** -0.5)
    with pytest.raises(ValueError):
        mixture_rates(counts)
    with pytest.raises(ValueError):
        mixture_rates(counts, weights={"en": 1}, temperature=2.0)
    with pytest.raises(ValueError):
        mixture_rates(counts, temperature=0.0)
    with pytest.raises(ValueError):
        mixture_rates(counts, weights={"nope": 1.0})


def test_sample_corpus_mixture_exact_set(spark):
    sizes = {"en": 400, "de": 120, "fr": 30}
    df = _corpus(spark, sizes)
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    out = sample_corpus_mixture(df, weights=weights, seed=3)
    got = {(r.doc_id, r.lang, r.sample_rate) for r in out.collect()}

    rates = mixture_rates(sizes, weights=weights)
    expected = set()
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            r = rates[g]
            if r >= 1.0 or _u(i, 3) < r:
                expected.add((i, g, r))
            i += 1
    assert got == expected
    # the binding group (fr: 30/0.2 = 150 scale -> en binds? check)
    assert max(rates.values()) == 1.0
    # kept mixture ~ target in expectation: per-group expected count
    for g in sizes:
        exp_n = rates[g] * sizes[g]
        kept = sum(1 for (_, lg, _) in got if lg == g)
        # binomial 4-sigma band
        sd = math.sqrt(max(exp_n * (1 - rates[g]), 1e-9))
        assert abs(kept - exp_n) <= 4 * sd + 1, (g, kept, exp_n)


def test_sample_corpus_mixture_partitioning_invariant(spark):
    sizes = {"en": 200, "zh": 50}
    df1 = _corpus(spark, sizes).coalesce(1)
    df2 = _corpus(spark, sizes).repartition(32)
    w = {"en": 0.6, "zh": 0.4}
    a = {r.doc_id for r in sample_corpus_mixture(df1, weights=w).collect()}
    b = {r.doc_id for r in sample_corpus_mixture(df2, weights=w).collect()}
    assert a == b and a


def test_sample_corpus_mixture_temperature_one_keeps_all(spark):
    sizes = {"en": 100, "de": 17}
    df = _corpus(spark, sizes)
    out = sample_corpus_mixture(df, temperature=1.0)
    assert out.count() == sum(sizes.values())


def test_hash_split_deterministic_partition(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, fractions=fr, seed=5)
    got = {r.doc_id: r.split for r in out.collect()}
    # exact mirror
    for i in range(2000):
        u = _u(i, 5)
        want = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        assert got[i] == want, i
    # total partition, plausible sizes
    assert len(got) == 2000
    n_tr = sum(1 for s in got.values() if s == "train")
    assert 1500 < n_tr < 1700  # ~5.5 sigma around the expected 1600
    with pytest.raises(ValueError):
        hash_split(df, fractions={"a": 0.5, "b": 0.4})


def test_sampling_plan_is_map_only(spark):
    """The keep decision is a shuffle-free native map: after the counts
    job, the output plan has no Exchange (beyond the input's own) and
    no Python evaluation."""
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"))
    out = sample_corpus_mixture(df, weights={"en": 1, "de": 1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "PythonUDF" not in plan
