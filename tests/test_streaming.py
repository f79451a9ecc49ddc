"""Streaming forms (ops 37-41): windowed agg with watermark over a file
stream equals the batch computation; late rows are dropped by the
watermark across micro-batches; the foreachBatch crawl wrapper matches
the batch crawl exactly."""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.streaming.windows import split_late, streaming_page_rate


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "all"))
    part = next(Path(tmp_path / "all").glob("*.parquet"))
    shutil.copy(part, src / "f0.parquet")
    return src, ev


def test_streaming_window_equals_batch(spark, events_stream_dir, tmp_path):
    src, ev = events_stream_dir
    stream = (spark.readStream.schema(ev.schema).parquet(str(src))
              .select(F.col("ts").cast("timestamp").alias("warc_ts"),
                      F.col("event_id").cast("string").alias("url")))
    agg = streaming_page_rate(stream, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("rate_agg")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.wstart: r.n_pages
           for r in spark.sql("select * from rate_agg").collect()}
    want = {r.wstart: r.n
            for r in ev.select(F.col("ts").cast("timestamp").alias("ts"))
                       .groupBy(F.window("ts", "1 hour").alias("w"))
                       .agg(F.count("*").alias("n"))
                       .select(F.col("w.start").alias("wstart"), "n").collect()}
    # append mode emits only watermark-closed windows: all but the last
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(want) - len(got) <= 3


def test_split_late(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 05:00:00")],
        "id long, s string").withColumn("ts", F.to_timestamp("s"))
    on_time, late = split_late(df, "ts", "2024-01-01 08:00:00")
    assert [r.id for r in on_time.collect()] == [1]
    assert [r.id for r in late.collect()] == [2]


def test_streaming_crawl_matches_batch(spark, web1k, tmp_path):
    from data_crawler_spark.plans.crawl import run_crawl, visit_order_df
    from data_crawler_spark.streaming.crawl_stream import run_crawl_streaming

    batch = run_crawl(spark, web1k, tmp_path / "b", max_rounds=3)
    stream = run_crawl_streaming(spark, web1k, tmp_path / "s", max_rounds=3)
    vo_b = [(r.round, r.url) for r in visit_order_df(batch["ctx"]).collect()]
    vo_s = [(r.round, r.url) for r in visit_order_df(stream["ctx"]).collect()]
    assert vo_b == vo_s
    assert batch["seen_count"] == stream["seen_count"]


def test_streaming_host_quota_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-host
    window quota over two micro-batches — state (window, used) must
    carry across batches, so a host exhausting its budget in batch 1
    stays blocked for that window in batch 2."""
    import pandas as pd

    from data_crawler_spark.streaming.quota import (
        _gate_batch,
        streaming_host_quota,
    )

    schema = "host string, ts timestamp"
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(host, offsets_s):
        return [(host, (base + pd.Timedelta(seconds=o)).to_pydatetime())
                for o in offsets_s]

    batch1 = rows("a.com", [0, 5, 10]) + rows("b.com", [1])
    batch2 = rows("a.com", [20, 30, 70]) + rows("b.com", [65])

    src = tmp_path / "qsrc"
    src.mkdir()
    sink = str(tmp_path / "qsink")
    ckpt = str(tmp_path / "qckpt")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    gated = streaming_host_quota(stream, budget=2, interval_s=60)

    def run_once():
        # SAME checkpoint both runs: the second run restores the store
        # and processes ONLY the new file — if (win, used) failed to
        # carry, a.com's minute-0 stragglers would be re-allowed
        q = (gated.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src / "b2"))
    run_once()
    got = {(r.host, r.ts): r.allowed
           for r in spark.read.parquet(sink).collect()}

    # reference: the same pure function run per host over the ordered
    # concatenation with carried state
    want = {}
    for host in ("a.com", "b.com"):
        win, used = None, 0
        for batch in (batch1, batch2):
            pdf = pd.DataFrame([r for r in batch if r[0] == host],
                               columns=["host", "ts"])
            out, win, used = _gate_batch(pdf, 2, 60, win, used)
            for _, r in out.iterrows():
                want[(host, r.ts.to_pydatetime())] = bool(r.allowed)
    assert got == want
    # a.com: budget 2/min -> 3rd request in minute 0 denied in batch 1,
    # and batch 2's minute-0 stragglers stay denied; minute-1 resets
    a = {k[1].second + 60 * k[1].minute: v
         for k, v in got.items() if k[0] == "a.com"}
    assert a == {0: True, 5: True, 10: False, 20: False, 30: False, 70: True}


def test_quota_late_window_does_not_regress_state():
    """A batch whose rows are all in an OLDER window than the state must
    not regress (win, used): late rows are denied, and the current
    window keeps its spent budget on the next batch (there is no
    watermark in this operator, so this is the state-safety rule)."""
    import pandas as pd

    from data_crawler_spark.streaming.quota import _gate_batch

    base = pd.Timestamp("2026-01-01 00:02:00")
    w0 = base.value // 1_000 // (60 * 1_000_000)  # epoch minute-window id

    def pdf(offsets_s):
        return pd.DataFrame({
            "host": ["a.com"] * len(offsets_s),
            "ts": [base + pd.Timedelta(seconds=o) for o in offsets_s]})

    # batch 1: window w0, budget 2 -> state (w0, 2)
    out, win, used = _gate_batch(pdf([0, 10]), 2, 60, None, 0)
    assert list(out["allowed"]) == [True, True] and (win, used) == (w0, 2)
    # batch 2: entirely late (window w0-1) -> denied, state unchanged
    out, win, used = _gate_batch(pdf([-30, -20]), 2, 60, win, used)
    assert list(out["allowed"]) == [False, False] and (win, used) == (w0, 2)
    # batch 3: back in window w0 -> budget is still spent, NOT refreshed
    out, win, used = _gate_batch(pdf([30]), 2, 60, win, used)
    assert list(out["allowed"]) == [False] and (win, used) == (w0, 2)
    # mixed batch: one late row (denied) + window-(w0+1) rows (fresh budget)
    out, win, used = _gate_batch(pdf([-10, 61, 62, 63]), 2, 60, win, used)
    assert list(out["allowed"]) == [False, True, True, False]
    assert (win, used) == (w0 + 1, 2)


def test_streaming_exact_dedup_state_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark keyed on the dd01 content hash:
    batch 2's duplicate of a batch-1 doc must NOT re-emit (state
    carried through the checkpoint); novel batch-2 docs must."""
    import pandas as pd

    from data_crawler_spark.streaming.windows import streaming_exact_dedup

    schema = "doc_id long, warc_ts timestamp, text string"
    base = pd.Timestamp("2026-01-01 00:00:00")

    def row(i, mins, text):
        return (i, (base + pd.Timedelta(minutes=mins)).to_pydatetime(), text)

    batch1 = [row(1, 0, "alpha beta gamma"),
              row(2, 1, "ALPHA   beta gamma"),   # normalized dup of 1
              row(3, 2, "something else entirely")]
    batch2 = [row(4, 10, "alpha beta\tgamma"),   # dup of 1, within watermark
              row(5, 11, "a brand new document")]

    src = tmp_path / "dsrc"
    src.mkdir()
    sink, ckpt = str(tmp_path / "dsink"), str(tmp_path / "dckpt")
    deduped = streaming_exact_dedup(
        spark.readStream.schema(schema).parquet(str(src) + "/*"),
        watermark="2 hours")

    def run_once():
        q = (deduped.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "b1"))
    run_once()
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "b2"))
    run_once()

    rows = spark.read.parquet(sink).collect()
    # one survivor per content hash: {1,2,4} collapse to a single row
    assert len(rows) == 3
    by_id = {r.doc_id for r in rows}
    assert 3 in by_id and 5 in by_id
    assert len(by_id & {1, 2}) == 1 and 4 not in by_id
    # batch and streaming agree on the hash definition
    from data_crawler_spark.operators.dedup import exact_dedup
    batch_hashes = {r.content_hash for r in exact_dedup(
        spark.createDataFrame(batch1 + batch2, schema)).collect()}
    assert {r.content_hash for r in rows} == batch_hashes


def test_clean_stream_matches_batch_stages(spark, tmp_path):
    """Ingest-time cleaning on a stream: the kept set equals the batch
    pipeline's map-only gates + exact dedup over the same rows."""
    import pandas as pd

    from data_crawler_spark.plans.corpus_pipeline import clean_corpus
    from data_crawler_spark.streaming.cleaning import clean_stream

    good = ("the crawl engine writes clean tokens and the shard packer "
            "reads them with care because the pipeline must keep order "
            "and the filters must agree on what counts as a word while "
            "the dedup stages remove copies of documents that have been "
            "seen before and the final corpus stays small")
    schema = "doc_id long, warc_ts timestamp, text string"
    base = pd.Timestamp("2026-01-01 00:00:00")

    def row(i, mins, text):
        return (i, (base + pd.Timedelta(minutes=mins)).to_pydatetime(),
                text)

    rows = [
        row(1, 0, good),                      # survives
        row(2, 1, "### " * 60 + "the of"),    # gopher symbol rule
        row(3, 2, "same line of the\n" * 8),  # duplicate-line rule
        row(4, 3, good.upper() + " "),        # normalized dup of 1
        row(5, 4, good.replace("crawl", "fetch", 1)),  # survives
    ]
    src = tmp_path / "csrc"
    src.mkdir()
    sink, ckpt = str(tmp_path / "csink"), str(tmp_path / "cckpt")
    cleaned = clean_stream(
        spark.readStream.schema(schema).parquet(str(src) + "/*"))
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "b1"))
    q = (cleaned.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(sink).collect()
    kept = {r.doc_id for r in got}
    # batch contrast over the identical rows (hygiene + quality +
    # repetition + exact dedup; near-dup off — not streaming-legal)
    bdf = spark.createDataFrame(rows, schema)
    want = {r.doc_id for r in clean_corpus(
        bdf, hygiene=True, near_dup_threshold=None).collect()}
    assert kept == want == {1, 5}
    assert all(r.n_tokens > 0 for r in got)
