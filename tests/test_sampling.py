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


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def _ref_buckets(text, n_buckets, ngram_sizes=(1, 2)):
    import re

    toks = re.findall(r"[A-Za-z0-9]+", text.lower())
    out = {}
    for n in ngram_sizes:
        for i in range(len(toks) - n + 1):
            b = to_signed64(xxhash64_bytes(
                " ".join(toks[i:i + n]).encode())) % n_buckets
            out[b] = out.get(b, 0) + 1
    return out


def _ref_dsir(corpus, target, n_buckets, smoothing=1.0, seed=0):
    """Pure-Python mirror: per-doc logw and gumbel key."""
    raw, tgt = {}, {}
    doc_feats = {}
    for i, t in corpus:
        f = _ref_buckets(t, n_buckets)
        doc_feats[i] = f
        for b, c in f.items():
            raw[b] = raw.get(b, 0) + c
    for _, t in target:
        for b, c in _ref_buckets(t, n_buckets).items():
            tgt[b] = tgt.get(b, 0) + c
    R, T = sum(raw.values()), sum(tgt.values())
    a, B = smoothing, n_buckets

    def lr(b):
        return (math.log((tgt.get(b, 0) + a) / (T + a * B))
                - math.log((raw.get(b, 0) + a) / (R + a * B)))

    out = {}
    for i, _ in corpus:
        logw = sum(c * lr(b) for b, c in doc_feats[i].items())
        u = min(max(_u(i, seed), 1e-18), 1.0 - 1e-16)
        out[i] = (logw, logw - math.log(-math.log(u)))
    return out


def test_dsir_matches_python_mirror(spark):
    from data_crawler_spark.operators.sampling import (dsir_select,
                                                       hashed_ngram_counts)

    sci = "quantum entanglement spectra measured in superconducting qubit arrays"
    web = "click here to win amazing prizes and cheap deals online now"
    corpus = [(i, sci if i % 3 == 0 else web) for i in range(30)]
    # make each doc distinct so weights differ doc-to-doc
    corpus = [(i, f"{t} filler{i} token") for i, t in corpus]
    target = [(100 + j,
               "qubit spectra and entanglement in quantum arrays "
               f"paper {j}") for j in range(5)]
    n_buckets = 1000

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")

    # feature frame matches the mirror exactly
    got_feats = {}
    for r in hashed_ngram_counts(cdf, n_buckets=n_buckets).collect():
        got_feats.setdefault(r.doc_id, {})[r.bucket] = r.cnt
    assert got_feats == {i: _ref_buckets(t, n_buckets) for i, t in corpus}

    ref = _ref_dsir(corpus, target, n_buckets)
    sel = dsir_select(cdf, tdf, k=10, n_buckets=n_buckets).collect()
    # selected ids = the mirror's top-10 gumbel keys
    want = sorted(ref, key=lambda i: (-ref[i][1], i))[:10]
    assert sorted(r.doc_id for r in sel) == sorted(want)
    for r in sel:
        assert r.dsir_logw == pytest.approx(ref[r.doc_id][0], rel=1e-9)
    # the science-like docs dominate the selection
    sci_ids = {i for i, t in corpus if "quantum" in t}
    assert len(sci_ids & {r.doc_id for r in sel}) >= 8


def test_dsir_empty_and_partition_invariance(spark):
    from data_crawler_spark.operators.sampling import dsir_select

    corpus = [(1, "alpha beta gamma"), (2, ""), (3, "alpha beta delta")]
    target = [(9, "alpha beta gamma")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    out = {r.doc_id: r.dsir_logw
           for r in dsir_select(cdf, tdf, k=3, n_buckets=64).collect()}
    assert set(out) == {1, 2, 3} and out[2] == 0.0  # featureless doc kept, logw 0
    out2 = {r.doc_id: r.dsir_logw
            for r in dsir_select(cdf.repartition(7), tdf, k=3,
                                 n_buckets=64).collect()}
    assert out2 == out


def test_dsir_fuzz_random_corpus(spark):
    """Seeded fuzz for the DSIR mirror: random docs over two vocab
    pools, random bucket width — logw and the selected set exact."""
    import random

    from data_crawler_spark.operators.sampling import dsir_select

    rng = random.Random(17)
    sci = [f"s{i}" for i in range(9)]
    web = [f"v{i}" for i in range(9)]
    corpus = [(i, " ".join(rng.choice(sci if i % 2 else web)
                           for _ in range(rng.randint(0, 20))))
              for i in range(40)]
    target = [(100 + j, " ".join(rng.choice(sci) for _ in range(15)))
              for j in range(6)]
    for n_buckets in (37, 500):
        ref = _ref_dsir(corpus, target, n_buckets)
        want = sorted(ref, key=lambda i: (-ref[i][1], i))[:12]
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        tdf = spark.createDataFrame(target, "doc_id long, text string")
        sel = dsir_select(cdf, tdf, k=12, n_buckets=n_buckets).collect()
        assert sorted(r.doc_id for r in sel) == sorted(want)
        got_w = {r.doc_id: r.dsir_logw for r in sel}
        for i in want:
            assert got_w[i] == pytest.approx(ref[i][0], rel=1e-9, abs=1e-12)


def test_cap_per_group_salted_exact(spark):
    """Salted two-phase == the obvious single-window reference, every
    salt width, quality-ordered survivors, partitioning-invariant."""
    import random

    from pyspark.sql import Window

    from data_crawler_spark.operators.sampling import cap_per_group

    rng = random.Random(5)
    # Zipf-ish: one giant group, several small ones, quality scores
    # with deliberate ties (the id tie-break must decide)
    rows = [(i, "big.test" if i < 160 else f"d{i % 7}.test",
             float(rng.randint(0, 9))) for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id long, domain string, quality double")

    def ref(k):
        w = Window.partitionBy("domain").orderBy(
            F.desc("quality"), F.asc("doc_id"))
        return {r.doc_id for r in
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).collect()}

    for k in (1, 3, 8):
        want = ref(k)
        for n_salts in (1, 4, 16):
            got = {r.doc_id for r in cap_per_group(
                df.repartition(9), "domain", k,
                order_by=[F.desc("quality")],
                n_salts=n_salts).collect()}
            assert got == want, (k, n_salts)
    # default order: min-id survivors
    got = {r.doc_id for r in
           cap_per_group(df, "domain", 2).collect()}
    assert got == {0, 1} | {r for r in range(160, 174)}
    with pytest.raises(ValueError, match="k must be"):
        cap_per_group(df, "domain", 0)


def test_mixture_null_group_and_unmatched_weights(spark):
    from data_crawler_spark.operators.sampling import (mixture_rates,
                                                       sample_corpus_mixture)

    # null lang rows (langid emits null for empty docs) must neither
    # crash the map build nor bind the mixture scale — they drop
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr"), (4, None), (5, None)],
        "doc_id long, lang string")
    out = sample_corpus_mixture(df, weights={"en": 1.0, "fr": 1.0})
    got = {r.doc_id for r in out.collect()}
    assert got <= {1, 2, 3} and 3 in got      # null-group docs gone

    # all-null corpus: empty result, no crash
    allnull = spark.createDataFrame([(1, None)], "doc_id long, lang string")
    assert sample_corpus_mixture(allnull, weights={"en": 1.0}).count() == 0

    # weighted groups absent from the corpus: a domain error, not a
    # bare min()-of-empty ValueError
    import pytest as _p
    with _p.raises(ValueError, match="positively-weighted"):
        mixture_rates({"fr": 10}, weights={"en": 1.0})


def test_shuffle_key_col_mirror_unique_and_seeded(spark):
    """The shuffle key is bit-exact with the Python mirror, unique per
    id (total order), and different seeds give different permutations.
    Pure map: no exchange, no Python."""
    from data_crawler_spark.operators.sampling import shuffle_key_col

    def _key(doc_id, seed):
        # "shuffle:" domain-separates the fold from uniform_hash_col —
        # a shared seed must not sort survivors by their sampling
        # variate
        h = to_signed64(
            xxhash64_bytes(f"shuffle:{doc_id}:{seed}".encode()))
        return f"{h & 0xFFFFFFFFFFFFFFFF:016X}#{doc_id}"

    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    for seed in (0, 7):
        got = {r.doc_id: r.k for r in
               df.select("doc_id",
                         shuffle_key_col("doc_id", seed).alias("k"))
               .collect()}
        assert got == {i: _key(i, seed) for i in range(300)}, seed
        assert len(set(got.values())) == 300
    orders = {}
    for seed in (0, 7):
        keyed = sorted(range(300), key=lambda i: _key(i, seed))
        orders[seed] = keyed
    assert orders[0] != orders[7]
    assert orders[0] != list(range(300))

    plan = (df.select(shuffle_key_col("doc_id", 3))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_sample_corpus_mixture_token_weighted(spark):
    # en docs are 10x longer than fr docs: doc-proportion and
    # token-proportion mixtures disagree, token mode must follow tokens
    rows = ([(i, "en", 1000) for i in range(100)]
            + [(1000 + i, "fr", 100) for i in range(100)])
    df = (spark.createDataFrame(rows, "doc_id long, lang string, "
                                      "n_tokens long")
          .repartition(8))
    w = {"en": 0.5, "fr": 0.5}
    out = sample_corpus_mixture(df, weights=w, seed=5,
                                weight_col="n_tokens")
    got = {(r.doc_id, r.sample_rate) for r in out.collect()}

    # mirror: token masses are 100k (en) / 10k (fr); fr binds at
    # scale 10k/0.5 = 20k -> en keeps 10k of 100k tokens (rate 0.1)
    rates = mixture_rates({"en": 100_000.0, "fr": 10_000.0}, weights=w)
    assert rates == {"en": 0.1, "fr": 1.0}
    expected = set()
    for doc_id, lang, _ in rows:
        r = rates[lang]
        if r >= 1.0 or _u(doc_id, 5) < r:
            expected.add((doc_id, r))
    assert got == expected
    # doc-unit mode on the same frame picks DIFFERENT rates (both
    # groups have 100 docs -> rate 0.5/0.5 scale -> both 1.0)
    doc_out = sample_corpus_mixture(df, weights=w, seed=5)
    assert {r.sample_rate for r in doc_out.collect()} == {1.0}


def test_sample_corpus_mixture_zero_mass_group(spark):
    rows = ([(1, "en", 50), (2, "en", 50),
             (3, "xx", 0), (4, "xx", None), (5, "xx", -3)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                     "n_tokens long")
    out = sample_corpus_mixture(df, weights={"en": 1.0, "xx": 1.0},
                                weight_col="n_tokens")
    # xx has zero total mass -> cannot meet any target -> dropped,
    # en (the only weighted group with mass) keeps everything
    got = {(r.doc_id, r.sample_rate) for r in out.collect()}
    assert got == {(1, 1.0), (2, 1.0)}


# ---------------------------------------------------------------------------
# Deterministic exact-k sampling
# ---------------------------------------------------------------------------

def test_sample_exact_k_mirror_and_nesting(spark):
    from data_crawler_spark.operators.sampling import sample_exact_k
    from data_crawler_spark.functions.hashing import xxhash64_str
    rows = [(i, f"doc {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    def mirror(k, seed):
        keyed = sorted(rows, key=lambda r: (
            xxhash64_str(f"samplek:{r[0]}:{seed}"), r[0]))
        return {r[0] for r in keyed[:k]}
    got50 = {r.doc_id for r in sample_exact_k(df, 50, seed=3).collect()}
    got100 = {r.doc_id for r in sample_exact_k(df, 100, seed=3).collect()}
    assert got50 == mirror(50, 3) and got100 == mirror(100, 3)
    assert got50 < got100                      # nested draws
    assert {r.doc_id for r in
            sample_exact_k(df.repartition(13), 50, seed=3).collect()} == got50
    assert {r.doc_id for r in sample_exact_k(df, 50, seed=4).collect()} != got50
    assert sample_exact_k(df, 500, seed=1).count() == 200   # k > corpus
    import pytest
    with pytest.raises(ValueError):
        sample_exact_k(df, -1)


def test_sample_exact_k_plan_is_distributed_topk(spark):
    from data_crawler_spark.operators.sampling import sample_exact_k
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = (sample_exact_k(df, 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan      # never a global sort
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")
