"""Streaming-shaped operators (SURVEY.md §2 ops 37-40) in their
Structured Streaming form.

The batch forms (groupBy window/session_window over a static table) are
registered in plans/fixture_queries.py with DuckDB oracles; this module
provides the same aggregations over an unbounded stream with event-time
watermarking, plus the late-data quarantine route demanded by op 40
(late pages are counted into lineage, not silently lost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_page_rate(pages_stream: DataFrame, ts_col: str = "warc_ts",
                        window: str = "1 hour", slide: str | None = None,
                        watermark: str = "2 hours") -> DataFrame:
    """pages/sec-style metric: windowed counts over event time with a
    watermark bounding state (op 37/38/40). Append-output-mode safe."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        pages_stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_pages"),
             F.approx_count_distinct("url").alias("n_urls_approx"))
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"),
                "n_pages", "n_urls_approx")
    )


def streaming_host_sessions(fetch_stream: DataFrame, ts_col: str = "fetch_ts",
                            gap: str = "30 minutes",
                            watermark: str = "1 hour") -> DataFrame:
    """Per-host fetch sessions (op 39): politeness audit over a stream —
    a session break means the crawler honored at least ``gap`` of idle."""
    return (
        fetch_stream.withWatermark(ts_col, watermark)
        .groupBy("host", F.session_window(ts_col, gap).alias("s"))
        .agg(F.count("*").alias("n_fetches"))
        .select("host", F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"), "n_fetches")
    )


def split_late(batch_df: DataFrame, ts_col: str, high_watermark) -> tuple[DataFrame, DataFrame]:
    """op 40 quarantine rule (foreachBatch form): rows older than the
    carried high watermark route to the quarantine sink + lineage
    counter instead of the main aggregation."""
    # a NULL event time routes to quarantine (the contract is 'counted
    # into lineage, not silently lost' — both comparisons are null for
    # such rows, which would drop them from BOTH outputs)
    on_time = batch_df.filter(F.col(ts_col) >= F.lit(high_watermark))
    late = batch_df.filter((F.col(ts_col) < F.lit(high_watermark))
                           | F.col(ts_col).isNull())
    return on_time, late


def streaming_exact_dedup(pages_stream: DataFrame, ts_col: str = "warc_ts",
                          text_col: str = "text",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming form of exact dedup (dd01 over an unbounded stream):
    emit only the FIRST arriving occurrence of each normalized content
    hash. ``dropDuplicatesWithinWatermark`` keys the state store on the
    hash and expires entries past the event-time watermark — exact
    within the horizon; a duplicate arriving more than ``watermark``
    after the retained row may re-emit, the unavoidable price of finite
    state on an unbounded stream (state size = O(distinct docs per
    watermark window), not O(corpus)). The hash is the SAME
    md5-over-normalized-text that batch exact_dedup keys on, so the
    batch and streaming paths agree doc-for-doc on what counts as a
    duplicate."""
    from ..operators.text import fingerprint_col

    # the ONE definition of the content hash — a drift between batch
    # and streaming dedup keys would silently re-emit documents
    h = fingerprint_col(F.col(text_col))
    return (pages_stream.withColumn("content_hash", h)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))
