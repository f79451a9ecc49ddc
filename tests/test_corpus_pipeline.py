"""End-to-end corpus cleaning pipeline: every stage exercised on one
corpus with a known expected survivor set."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.plans.corpus_pipeline import clean_corpus

# 60 words, stopword-rich, alphabetic, sane word lengths: passes every
# Gopher rule.
BASE = ("the crawl engine writes clean tokens and the shard packer "
        "reads them with care because the pipeline must keep order "
        "and the filters must agree on what counts as a word while "
        "the dedup stages remove copies of documents that have been "
        "seen before and the decontamination stage protects the eval "
        "set from leaking into training data today")

EVAL_Q = ("name the seven wonders of the ancient world and explain "
          "which of them still stands beside the nile river")


@pytest.fixture(scope="module")
def corpus(spark):
    near = BASE.replace("crawl engine", "fetch scheduler", 1)
    contaminated = (
        "students revising history papers often quote long passages "
        "verbatim and that habit is exactly what leak detection must "
        "catch so here the benchmark span appears embedded in prose "
        "that shares almost no vocabulary with any other document "
        "name the seven wonders of the ancient world and explain "
        "which of them still stands beside ruins visited by many "
        "travelers each warm season")
    rows = [
        (1, BASE),                          # clean: survives
        (2, "### " * 60 + "the of"),        # gopher symbol rule: dropped
        (3, "same line of the\n" * 8),      # repetition rule: dropped
        (4, BASE.upper()),                  # exact dup of 1 (normalized)
        (5, near),                          # near-dup of 1: dropped
        (6, contaminated),                  # 13-gram eval overlap: dropped
        (7, BASE.replace("the crawl", "a totally different story about "
                         "the crawl", 1) + " extra closing words of the "
            "final clean document here with more of the padding tokens "
            "that keep it far from every other document in this corpus "
            "and the jaccard low"),         # clean: survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_end_to_end(spark, corpus):
    eval_df = spark.createDataFrame([(EVAL_Q,)], "text string")
    out = clean_corpus(corpus, eval_df, near_dup_threshold=0.7,
                       shard_budget=40).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 7]
    # originals' columns survive, n_tokens/shard_id appended
    assert {"doc_id", "text", "n_tokens", "shard_id"} == set(out[0].asDict())
    # offset-binning over the 1,7 order: doc 1 (60 tokens) spans shards
    # 0..., doc 7 starts at floor(60/40) = 1
    assert out[0].shard_id == 0
    assert out[1].shard_id == out[0].n_tokens // 40


def test_clean_corpus_stage_toggles(spark, corpus):
    # everything off: pure token-count pass-through
    out = clean_corpus(corpus, quality=False, repetition=False,
                       exact=False, near_dup_threshold=None)
    assert out.count() == corpus.count()
    assert "n_tokens" in out.columns and "shard_id" not in out.columns
    # exact-only: drops just the normalized copy (doc 4)
    ids = {r.doc_id for r in
           clean_corpus(corpus, quality=False, repetition=False,
                        exact=True, near_dup_threshold=None).collect()}
    assert ids == {1, 2, 3, 5, 6, 7}


def test_clean_corpus_no_eval_keeps_contaminated(spark, corpus):
    ids = {r.doc_id for r in
           clean_corpus(corpus, near_dup_threshold=0.7).collect()}
    assert 6 in ids and ids == {1, 6, 7}
