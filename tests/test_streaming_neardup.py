"""Streaming MinHash/LSH near-dup: bit-exact signature parity with the
batch sweep, cross-micro-batch bucket state, and the decision fold."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.dedup import banded, minhash_signatures
from data_crawler_spark.streaming.neardup import (_sig_of_hashes, band_rows,
                                                  neardup_decisions,
                                                  shingle_hashes_col,
                                                  streaming_lsh_index)

DOC_A = ("the quick brown fox jumps over the lazy dog and then "
         "runs far away into the deep dark forest tonight")
DOC_B = ("completely different content about spark streaming state "
         "stores and watermark semantics for unbounded data")


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "warc_ts", "text"]))


def test_signature_parity_with_batch(spark):
    df = _docs(spark, [
        (1, pd.Timestamp("2026-08-01"), DOC_A),
        (2, pd.Timestamp("2026-08-01"), DOC_B),
        (3, pd.Timestamp("2026-08-01"), "too short"),  # no shingles
    ])
    import numpy as np

    batch = {r.doc_id: list(r.sig)
             for r in minhash_signatures(df, "doc_id", "text").collect()}
    j = np.arange(64, dtype=np.uint64)
    hashed = {r.doc_id: r.sh for r in df.select(
        "doc_id", shingle_hashes_col(F.col("text")).alias("sh")).collect()}
    stream_form = {i: _sig_of_hashes(hs, j) for i, hs in hashed.items()}
    assert stream_form[3] is None and 3 not in batch
    assert list(stream_form[1]) == batch[1]
    assert list(stream_form[2]) == batch[2]

    # band rows == batch banded() bit-exactly
    got = {(r.doc_id, r.band): r.bh for r in band_rows(df).collect()}
    want = {(r.doc_id, r.band): r.bh
            for r in banded(minhash_signatures(df, "doc_id", "text"))
            .collect()}
    assert got == want

    with pytest.raises(ValueError):
        band_rows(df, n_bands=20, rows_per_band=4, n_hashes=64)


def test_streaming_index_state_across_batches(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    t = pd.Timestamp("2026-08-01 00:00:00")
    # batch file 1: A and B (distinct); batch file 2: an exact dup of
    # A (every band collides) and a fresh doc C
    _docs(spark, [(1, t, DOC_A), (2, t, DOC_B)]) \
        .coalesce(1).write.parquet(str(src / "f1"))
    _docs(spark, [(3, t + pd.Timedelta("1h"), DOC_A),
                  (4, t + pd.Timedelta("1h"), DOC_B + " with extra suffix "
                   "words changing a couple of shingles only")]) \
        .coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream
              .schema("doc_id long, warc_ts timestamp, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = (streaming_lsh_index(stream).writeStream
         .format("memory").queryName("lsh_idx")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    idx = spark.table("lsh_idx")

    dec = {r.doc_id: r for r in neardup_decisions(idx).collect()}
    assert set(dec) == {1, 2, 3, 4}
    # first arrivals keep
    assert dec[1].keep and dec[2].keep
    # the exact dup of A collides in EVERY band, across micro-batches
    assert dec[3].n_collisions == 16 and not dec[3].keep
    # the near-variant of B collides in at least one band but not all
    assert 0 < dec[4].n_collisions
    # a strict min_collisions threshold can still keep the variant
    strict = {r.doc_id: r.keep
              for r in neardup_decisions(idx, min_collisions=17).collect()}
    assert strict == {1: True, 2: True, 3: True, 4: True}

    # every bucket's representative is its earliest (ts, doc_id) row
    reps = idx.groupBy("band", "bh").agg(
        F.min_by(F.col("doc_id"), F.struct("ts", "doc_id")).alias("first"),
        F.first("rep_id").alias("rep"),
        F.countDistinct("rep_id").alias("nreps")).collect()
    assert all(r.first == r.rep and r.nreps == 1 for r in reps)
