"""Deterministic corpus-mixture sampling and dataset splitting — the
"domain mixing" step of a training-data pipeline (Pile/DoReMi-style
source weights, multilingual temperature sampling à la mBERT/XLM-R):
given per-group target weights (or a temperature over observed group
counts), downsample each group at a deterministic per-document rate so
the surviving corpus matches the target mixture in expectation, with
NO upsampling and the largest possible output (the most-demanded group
keeps rate 1.0).

Scale shape: the ONLY job is one groupBy(group).count() whose result
is a driver-held dict bounded by the number of groups (languages /
sources — tens, not millions); the keep decision is a pure map —
xxhash64 of the document id folded to a uniform double, compared to a
literal-map rate — so the corpus itself is scanned once and never
shuffled, and the same document always gets the same verdict on any
cluster size or partitioning (the two-cluster-size determinism the
crawl engine pins everywhere else).

The uniform fold ``u = xxhash64(concat(id, ':', seed)) / 2^64 + 0.5``
is bit-identical to the pure-Python mirror in tests/test_sampling.py
(functions/hashing.py is bit-exact with Spark's xxhash64; the long ->
double conversion rounds the same way in the JVM and CPython), so the
expected kept SET — not just its size — is exactly testable.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mixture_rates(counts: dict[str, float],
                  weights: dict[str, float] | None = None,
                  temperature: float | None = None) -> dict[str, float]:
    """Per-group keep rates from observed ``counts`` and either explicit
    target ``weights`` or a ``temperature`` (w_g ∝ counts_g^(1/T):
    T=1 keeps the natural mixture — every rate 1.0; T>1 flattens toward
    uniform, the standard multilingual-sampling move). Exactly one of
    the two must be given.

    With scale s = min over weighted groups of counts_g / w_g, group g
    keeps s·w_g docs in expectation (rate_g = s·w_g / counts_g ≤ 1): the
    output matches the normalized weights exactly in expectation, never
    upsamples, and the binding group keeps everything. Groups absent
    from ``weights`` (or with weight 0) get rate 0.0 — an explicit drop,
    mirroring what a mixture spec means."""
    if (weights is None) == (temperature is None):
        raise ValueError("give exactly one of weights / temperature")
    if temperature is not None:
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        weights = {g: float(c) ** (1.0 / temperature)
                   for g, c in counts.items() if c > 0}
    total_w = sum(w for w in weights.values() if w > 0)
    if total_w <= 0:
        raise ValueError("at least one group needs positive weight")
    rates: dict[str, float] = {}
    ratios = [counts[g] / w for g, w in weights.items()
              if w > 0 and counts.get(g, 0) > 0]
    if not ratios:
        raise ValueError(
            "none of the positively-weighted groups occurs in counts "
            f"(weighted: {sorted(g for g, w in weights.items() if w > 0)})")
    scale = min(ratios)
    for g in counts:
        w = weights.get(g, 0.0)
        if w <= 0 or counts[g] == 0:
            rates[g] = 0.0
        else:
            rates[g] = min(1.0, scale * w / counts[g])
    return rates


def uniform_hash_col(id_col: Column, seed: int = 0) -> Column:
    """Deterministic uniform double in [0, 1) from a document id:
    xxhash64 over ``"{id}:{seed}"`` folded by ``h/2^64 + 0.5`` (signed
    long -> the same uniform the unsigned hash/2^64 gives, shifted by
    0.5 mod 1 — still exactly uniform over the 2^64 grid)."""
    h = F.xxhash64(F.concat_ws(":", id_col.cast("string"),
                               F.lit(str(int(seed)))))
    return h.cast("double") / F.lit(float(2 ** 64)) + F.lit(0.5)


def sample_corpus_mixture(df: DataFrame, group_col: str = "lang",
                          id_col: str = "doc_id",
                          weights: dict[str, float] | None = None,
                          temperature: float | None = None,
                          seed: int = 0,
                          weight_col: str | None = None) -> DataFrame:
    """Downsample ``df`` so ``group_col``'s mixture matches ``weights``
    (or the ``temperature``-annealed observed mixture) in expectation.
    Returns the surviving rows with their group's ``sample_rate``
    appended. One count job over the groups; the filter itself is a
    shuffle-free map (literal rate lookup + hash compare), deterministic
    in (id, seed) alone.

    ``weight_col`` switches the mixture's UNIT from documents to that
    column's mass — published LM mixtures (Pile, Llama, PaLM) specify
    TOKEN proportions, and doc-proportions only match them when every
    group's mean doc length is equal. With ``weight_col="n_tokens"``
    the group masses are Σ tokens and the kept set matches ``weights``
    in expected token mass (the keep decision stays per-doc and
    length-independent, so within a group the rate applies uniformly;
    negative/null weights count as 0 toward the mass)."""
    mass = (F.greatest(F.coalesce(F.col(weight_col).cast("double"),
                                  F.lit(0.0)), F.lit(0.0))
            if weight_col else F.lit(1.0))
    counts = {r["g"]: r["c"]
              for r in df.groupBy(F.col(group_col).alias("g"))
                         .agg(F.sum(mass).alias("c")).collect()}
    # a group whose entire mass is 0 can't be scaled to any target —
    # same drop semantics as an absent group
    counts = {g: c for g, c in counts.items() if c and c > 0}
    # a null group (unlabeled docs — langid emits null for empty text)
    # is rate-0 by definition and must not bind the mixture scale; it
    # also cannot be a create_map key (Spark rejects null map keys)
    counts.pop(None, None)
    if not counts:
        return (df.withColumn("sample_rate", F.lit(0.0))
                .filter(F.lit(False)))
    rates = mixture_rates(counts, weights, temperature)
    rate = F.coalesce(
        F.create_map(*chain.from_iterable(
            (F.lit(g), F.lit(r)) for g, r in rates.items()))[F.col(group_col)],
        F.lit(0.0))
    # rate >= 1 keeps unconditionally: the long->double fold can round
    # a hash near 2^63 to u == 1.0, which a bare u < 1.0 would drop
    u = uniform_hash_col(F.col(id_col), seed)
    return (df.withColumn("sample_rate", rate)
              .filter((F.col("sample_rate") >= 1.0)
                      | (u < F.col("sample_rate"))))


def shuffle_key_col(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Deterministic pseudo-random TOTAL-order key for training-order
    shuffling: sorting by this key is a seeded permutation of the
    corpus that is identical on any cluster size or partitioning (the
    mixture sampler's determinism contract applied to ordering). A
    training run wants shards drawn IID from the cleaned corpus, not
    runs of adjacent crawl ids — feed this to
    ``shard_by_token_budget(order_col=...)`` and
    ``write_training_shards(sort_in_shard=...)``.

    Construction: the zero-padded two's-complement hex of
    ``xxhash64("shuffle:{id}:{seed}")``, so lexicographic key order is
    a fixed pseudo-random permutation; the id itself is appended after
    ``#`` so a hash collision can never make the order ambiguous. The
    ``shuffle:`` prefix DOMAIN-SEPARATES the fold from
    ``uniform_hash_col`` — without it, a seed shared with the mixture
    sampler or hash_split would sort survivors by their own sampling
    variate (a rate-r group's survivors all land in the first r of its
    key band: systematically non-IID shards, the opposite of the
    contract). Pure map — no shuffle, no Python."""
    sid = F.col(id_col).cast("string")
    h = F.xxhash64(F.concat_ws(":", F.lit("shuffle"), sid,
                               F.lit(str(int(seed)))))
    return F.concat(F.lpad(F.hex(h), 16, "0"), F.lit("#"), sid)


def hash_split(df: DataFrame, id_col: str = "doc_id",
               fractions: dict[str, float] | None = None,
               seed: int = 1) -> DataFrame:
    """Deterministic train/val/test split: ``split`` column assigned by
    which cumulative-fraction bin the document's uniform hash falls in.
    Pure map — no shuffle, no sampling job; membership is a function of
    (id, seed) only, so it is stable across reruns, repartitionings and
    cluster sizes, and disjoint by construction. Fractions must sum to
    1 (±1e-9)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = uniform_hash_col(F.col(id_col), seed)
    expr = None
    hi = 0.0
    names = list(fractions)
    for name in names[:-1]:
        hi += fractions[name]
        expr = (F.when(u < hi, F.lit(name)) if expr is None
                else expr.when(u < hi, F.lit(name)))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def cap_per_group(df: DataFrame, group_col: str, k: int,
                  order_by: list | None = None,
                  id_col: str = "doc_id",
                  n_salts: int = 16) -> DataFrame:
    """Keep at most ``k`` rows per ``group_col`` value — the per-domain
    diversity cap published pipelines apply after dedup (C4 caps pages
    per host; Dolma caps per registered domain). ``order_by`` is a
    list of sort Columns deciding WHICH k survive (e.g.
    ``[F.desc("quality")]``); ``id_col`` ASC is always appended so the
    order is total and the survivor set deterministic under any
    partitioning.

    Exact salted two-phase (the scheduler's op-15 shape): phase 1 ranks
    within (group, pmod(xxhash64(id), S)) and keeps k per salt — the
    true per-group top-k is necessarily among those S*k rows — phase 2
    re-ranks k*S rows per group. A Zipf-head domain's millions of docs
    never pass through one window task."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    from pyspark.sql import Window
    order = list(order_by or []) + [F.asc(id_col)]
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                  F.lit(int(n_salts)))
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("_salt", salt)
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k).drop("_salt", "_rn")
            .withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k).drop("_rn"))


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def hashed_ngram_counts(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n_buckets: int = 10_000,
                        ngram_sizes: tuple[int, ...] = (1, 2)) -> DataFrame:
    """DSIR's feature space: per-document hashed bag of word n-grams —
    (id, bucket, cnt) rows with ``bucket = xxhash64(ngram) mod
    n_buckets`` over the WORD_RE token stream (the paper hashes
    unigrams+bigrams into 10k buckets). Built doc-locally (token array
    bound once, windows as in ngram_repetition_signals), one explode
    into a map-side-partial groupBy — every shuffle row is
    (id, int, count), never text."""
    from data_crawler_spark.operators.text import bind_once, tokens_col

    if min(ngram_sizes) < 1:
        raise ValueError(f"n-gram sizes must be >= 1, got {ngram_sizes}")
    toks = tokens_col(F.col(text_col))

    def buckets_for(tv: Column, n: int) -> Column:
        idx = F.when(F.size(tv) >= n, F.sequence(F.lit(0), F.size(tv) - n)) \
               .otherwise(F.expr("array()").cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.pmod(F.xxhash64(F.concat_ws(" ", F.slice(tv, i + 1, n))),
                             F.lit(n_buckets)).cast("int"))

    buckets = bind_once(
        toks, lambda tv: F.concat(*[buckets_for(tv, n) for n in ngram_sizes]))
    return (df.select(F.col(id_col), F.explode(buckets).alias("bucket"))
            .groupBy(id_col, "bucket").agg(F.count("*").alias("cnt")))


def dsir_log_ratios(raw_feats: DataFrame, target_feats: DataFrame,
                    n_buckets: int = 10_000,
                    smoothing: float = 1.0) -> DataFrame:
    """Per-bucket log importance ratio log(p_target(b) / p_raw(b)) from
    two hashed-feature frames (add-``smoothing`` multinomials). Both
    inputs collapse to ≤ n_buckets rows before anything else — the
    ratio table is broadcast-sized by construction. The collapsed
    frames are localCheckpointed (≤ n_buckets tiny rows) so the total
    counts, the join, and every downstream read share ONE computation
    of each feature sweep instead of re-running it per action."""
    raw_b = (raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
             .localCheckpoint())
    tgt_b = (target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
             .localCheckpoint())
    r_tot = raw_b.agg(F.sum("rc")).first()[0] or 0
    t_tot = tgt_b.agg(F.sum("tc")).first()[0] or 0
    a, b = float(smoothing), float(n_buckets)
    joined = raw_b.join(tgt_b, "bucket", "full_outer")
    return joined.select(
        "bucket",
        (F.log((F.coalesce(F.col("tc"), F.lit(0)) + a) / F.lit(t_tot + a * b))
         - F.log((F.coalesce(F.col("rc"), F.lit(0)) + a) / F.lit(r_tot + a * b))
         ).alias("log_ratio"))


def dsir_select(corpus: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = 10_000,
                ngram_sizes: tuple[int, ...] = (1, 2),
                smoothing: float = 1.0, seed: int = 0) -> DataFrame:
    """DSIR end-to-end: score every corpus document with its hashed-
    n-gram log importance weight against ``target``'s distribution and
    draw ``k`` documents WITHOUT replacement ∝ exp(weight) via Gumbel
    top-k (Efraimidis–Spirakis): key = logw + Gumbel(0,1) seeded from
    the document id, so the draw is deterministic in (id, seed) and
    independent of partitioning. Returns the selected corpus rows with
    ``dsir_logw`` appended.

    100 TB shape: features never leave compact (id, bucket, cnt) rows;
    the ratio table is ≤ n_buckets rows and BROADCAST into the scoring
    join; per-doc scores are one map-side-partial groupBy(id); the
    final top-k is Spark's TakeOrdered (no global sort). Docs with no
    features score logw = 0 (the empty product), not dropped.

    The corpus feature sweep is read twice (ratio denominator + the
    scoring join), so it is persisted for the duration of the call and
    released after the eager top-k materialization — without it the
    most expensive pass would run once per action."""
    from pyspark import StorageLevel

    feats = hashed_ngram_counts(corpus, id_col, text_col, n_buckets,
                                ngram_sizes).persist(
                                    StorageLevel.MEMORY_AND_DISK)
    try:
        tfeats = hashed_ngram_counts(target, id_col, text_col, n_buckets,
                                     ngram_sizes)
        # the eager checkpoints inside dsir_log_ratios fill feats' cache
        ratios = dsir_log_ratios(feats, tfeats, n_buckets, smoothing)
        logw = (feats.join(F.broadcast(ratios), "bucket")
                .groupBy(id_col)
                .agg(F.sum(F.col("cnt") * F.col("log_ratio"))
                     .alias("dsir_logw")))
        scored = (corpus.join(logw, id_col, "left")
                  .withColumn("dsir_logw",
                              F.coalesce(F.col("dsir_logw"), F.lit(0.0))))
        # clamp the uniform off both endpoints: u==0 and the fold's
        # u==1.0 rounding case would send log(-log(u)) to ±inf/null
        u = uniform_hash_col(F.col(id_col), seed)
        u = F.least(F.greatest(u, F.lit(1e-18)), F.lit(1.0 - 1e-16))
        key = F.col("dsir_logw") - F.log(-F.log(u))
        # eager k-row materialization so feats can release NOW
        return (scored.withColumn("_gumbel_key", key)
                .orderBy(F.desc("_gumbel_key"), F.asc(id_col)).limit(k)
                .drop("_gumbel_key").localCheckpoint())
    finally:
        feats.unpersist()


def sample_exact_k(df: DataFrame, k: int, id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Deterministic uniform sample of EXACTLY ``k`` rows (all rows if
    the corpus is smaller) — the eval-set / human-audit draw where the
    mixture sampler's per-doc rate semantics (expected, not exact,
    counts) are the wrong tool. The sample is the k smallest values of
    a seeded per-id hash order, so it is a fixed function of (ids,
    seed): identical on any partitioning or cluster size, and nested
    (the k=100 sample contains the k=50 sample for the same seed).

    Scale shape: ``orderBy(key).limit(k)`` plans as
    TakeOrderedAndProject — each partition keeps a local top-k, never
    a global sort. The key is domain-separated ("samplek:") from the
    mixture/split/shuffle folds so sharing a seed with those can't
    correlate the draw with survivorship or shard order (the
    shuffle_key_col lesson). For a per-GROUP exact draw, feed this
    key to ``cap_per_group`` as an ascending metric instead."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    key = F.xxhash64(F.concat_ws(
        ":", F.lit("samplek"), F.col(id_col).cast("string"),
        F.lit(str(int(seed)))))
    return (df.withColumn("_sk", key).orderBy(F.asc("_sk"), F.asc(id_col))
            .limit(k).drop("_sk"))
