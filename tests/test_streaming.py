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
