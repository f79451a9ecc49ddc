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


def test_simhash_identical_and_blocking(docs):
    sims = {r.doc_id: r.sim for r in
            docs.select("doc_id", simhash_udf("text").alias("sim")).collect()}
    assert sims[1] == sims[2] == sims[5]  # token-identical docs
    out = {(r.id_a, r.id_b): r.hamming
           for r in simhash_near_dups(docs, max_hamming=16).collect()}
    assert out[(1, 2)] == 0 and out[(1, 5)] == 0
    assert (1, 3) in out and out[(1, 3)] <= 16
    assert (1, 4) not in out
