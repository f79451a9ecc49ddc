"""Structured-Streaming wrapper for the crawl loop (SURVEY.md §2 op 41,
§2.9 preamble): rounds as micro-batches via foreachBatch.

All crawl state already lives in snapshot tables (plans/crawl.py), so
the streaming wrapper adds no state of its own — it is a driver that
fires run_round once per micro-batch tick and stops at quiescence.
A driver crash resumes from the same table checkpoint as the batch
loop (the wrapper is restart-transparent by construction)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

from data_crawler_spark.plans.crawl import bootstrap, open_crawl, run_round


def run_crawl_streaming(spark: SparkSession, web_dir: str | Path,
                        state_dir: str | Path, max_rounds: int = 10,
                        tick_ms: int = 0, **open_kwargs) -> dict:
    """Drive crawl rounds from a rate-source stream; each micro-batch
    executes exactly one round. Returns the same summary as run_crawl."""
    ctx = open_crawl(spark, web_dir, state_dir, **open_kwargs)
    if ctx.checkpoint.load() is None:
        bootstrap(ctx)

    state = {"stopped_at": None, "scheduled_total": 0}

    def one_round(_batch_df, _batch_id) -> None:
        cp = ctx.checkpoint.load()
        rnd = cp["round"]
        if rnd >= max_rounds or state["stopped_at"] is not None:
            state["stopped_at"] = state["stopped_at"] or rnd
            return
        n = run_round(ctx, rnd)
        state["scheduled_total"] += n
        if n == 0:
            state["stopped_at"] = rnd

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1000).load()
        .writeStream.foreachBatch(one_round)
        .trigger(processingTime=f"{tick_ms} milliseconds")
        .start()
    )
    try:
        while state["stopped_at"] is None:
            stream.processAllAvailable()
    finally:
        stream.stop()
    return {
        "rounds_run": ctx.checkpoint.load()["round"],
        "scheduled_total": state["scheduled_total"],
        "seen_count": ctx.seen.read().count(),
        "ctx": ctx,
    }
