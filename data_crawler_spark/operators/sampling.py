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


def mixture_rates(counts: dict[str, int],
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
    scale = min(counts[g] / w for g, w in weights.items()
                if w > 0 and counts.get(g, 0) > 0)
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
                          seed: int = 0) -> DataFrame:
    """Downsample ``df`` so ``group_col``'s mixture matches ``weights``
    (or the ``temperature``-annealed observed mixture) in expectation.
    Returns the surviving rows with their group's ``sample_rate``
    appended. One count job over the groups; the filter itself is a
    shuffle-free map (literal rate lookup + hash compare), deterministic
    in (id, seed) alone."""
    counts = {r["g"]: r["c"]
              for r in df.groupBy(F.col(group_col).alias("g"))
                         .agg(F.count("*").alias("c")).collect()}
    if not counts:
        return df.withColumn("sample_rate", F.lit(0.0))
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
