#!/usr/bin/env python
"""Benchmark harness (driver contract + SURVEY.md §7.5).

Runs the headline fixture queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus the crawl
engine's two north-star metrics (BASELINE.json:2):

  - frontier URLs scheduled+deduped / sec (rounds over a synthetic
    web tier, ``$SPARK_GRAFT_WEB_TIER``, default web100k)
  - pages extracted / sec (mapInArrow sweep over the page store)

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"urls_scheduled_per_s": ..., "pages_extracted_per_s": ...},
   "machine": {"burner_s": ..., "burner_nominal_s": ...,
               "contaminated": bool},
   "design_point": {...}}   # BENCH/design_point.json passthrough

Measurement protocol (round-5 upgrade; the round-4 record carried a
3.6x extract_sweep regression that a controlled same-window run showed
was noisy-neighbor contamination, not a plan change — VERDICT r4 §1):
- the crawl and extract jobs INTERLEAVE their repeats (crawl, extract,
  crawl, extract) so one multi-minute degradation window cannot poison
  every repeat of a single job; min per job is taken as before.
- the shared no-engine-code numpy burner (bench/burner.py) runs before
  and after the crawl/extract section; the worst leg is compared to
  this box's nominal ceiling and the record carries an explicit
  ``machine.contaminated`` flag when the window was degraded — the
  judged record then says so itself instead of reading as an engine
  regression.
- the contract-closing design-point scaling row (bench/scaling.py
  --big-budget-scale, hours-long) publishes BENCH/design_point.json;
  bench.py embeds it verbatim so the driver record carries the
  north-rule evidence.

Scaling evidence (efficiency >= 0.8 from N to 4N): run
``python bench/scaling.py`` — same jobs at local[8] vs local[32].
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "q01_scan_filter_project",
    "q12_star_join_revenue",
    "q18_agg_pricing_summary",
    "q22_window_topk_per_key",
    "q25_lag_running_sum",
    "q37_38_time_windows",
    "txt01_token_quality",
    "dd01_exact_dedup",
    "dd03_04_sketches",
    "sim01_cosine_topk",
]


def noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    web_tier = os.environ.get("SPARK_GRAFT_WEB_TIER", "web100k")
    crawl_rounds = int(os.environ.get("SPARK_GRAFT_CRAWL_ROUNDS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # see bench/scaling_job.py: AQE's 64m advisory under-parallelizes
        # the small shuffles, and G1 hits multi-second evacuation pauses
        # on the html-churn pattern (even pure JVM scans went bimodal
        # 0.7s/12.8s at 32 threads); ParallelGC holds a stable 0.3s.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .appName("data_crawler_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.operators.extractor import extract_pages_with_links_arrow
    from data_crawler_spark.plans.crawl import run_crawl
    from data_crawler_spark.plans.fixture_queries import QUERIES
    from data_crawler_spark.sources.web import gen_tier

    # warm up the JVM + python workers once (not timed). The range-sum
    # warms only the JVM; Arrow python workers pay ~1s of numpy/pandas
    # import each on first use (30s+ across 32 cold workers), so spawn
    # one per core with a no-op mapInArrow before any timed query —
    # otherwise the first Arrow query in HEADLINE (dd03) absorbs the
    # whole cold-start in its first repeat.
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm_arrow(batches):
        import numpy  # noqa: F401 — force the worker-side import cost
        import pandas  # noqa: F401
        yield from batches

    (spark.range(cpus * 2, numPartitions=cpus * 2)
     .mapInArrow(_warm_arrow, "id long").collect())

    # min of REPEATS in-process runs per job: this VM shows up to 2x
    # noisy-neighbor drift between legs (BENCH/BASELINE.md), and the
    # min is the least-contaminated estimate of machine capability —
    # each repeat re-executes the full query (no result caching).
    # floor 1: zero repeats would leave res/crawl_wall undefined below
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "2")))
    # fixture queries are cheap (<=10s each) relative to the crawl, so
    # they take an extra repeat: min-of-3 instead of min-of-2 halves
    # the chance a noisy window contaminates a recorded query time for
    # ~25s of extra suite cost (the crawl, ~2x25s, stays at REPEATS)
    q_repeats = max(repeats, int(os.environ.get("SPARK_GRAFT_Q_REPEATS", "3")))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = None
        for _ in range(q_repeats):
            t0 = time.time()
            noop_write(fn(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # --- crawl metrics over the synthetic web tier ------------------------
    # Repeats are INTERLEAVED (crawl, extract, crawl, extract): this
    # VM's noisy-neighbor degradation arrives in multi-minute windows
    # (BENCH/BASELINE.md), and consecutive same-job repeats let one
    # window poison a job's every repeat — exactly what put a 3.6x
    # phantom regression on the round-4 record. The burner ceiling
    # brackets the section; its worst leg vs the nominal sets the
    # record's own contamination flag.
    sys.path.insert(0, str(REPO / "bench"))  # bench/ is not a package
    from burner import burn_seconds

    # nominal ceiling for this box (min across the interleaved windows
    # of rounds 3-5 sweeps in BENCH/BASELINE.md); keyed by core count
    BURNER_NOMINAL = {8: 3.38, 32: 1.42}
    burner_nominal = BURNER_NOMINAL.get(cpus)
    burner_worst = burn_seconds(spark, repeats=2)

    web = gen_tier(REPO / ".fixtures_cache", web_tier)
    pages = spark.read.parquet(str(web / "pages.parquet"))
    n_pages = pages.count()
    crawl_wall = extract_wall = None
    for _ in range(repeats):
        state = Path(tempfile.mkdtemp(prefix="bench_state_"))
        try:
            t0 = time.time()
            # lineage_gauges=False: the frontier/seen size gauges are
            # diagnostics that cost full-table counts per round — the
            # bench measures crawl throughput, not diagnostics
            res = run_crawl(spark, web, state, max_rounds=crawl_rounds,
                            resume=False, lineage_gauges=False)
            dt = time.time() - t0
            crawl_wall = dt if crawl_wall is None else min(crawl_wall, dt)
        finally:
            shutil.rmtree(state, ignore_errors=True)
        t0 = time.time()
        noop_write(extract_pages_with_links_arrow(pages))
        dt = time.time() - t0
        extract_wall = dt if extract_wall is None else min(extract_wall, dt)
    urls_per_s = res["scheduled_total"] / crawl_wall if crawl_wall else 0.0
    pages_per_s = n_pages / extract_wall if extract_wall else 0.0
    burner_worst = max(burner_worst, burn_seconds(spark, repeats=2))

    timings["crawl_rounds"] = round(crawl_wall, 3)
    timings["extract_sweep"] = round(extract_wall, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (fixture queries + crawl rounds "
                  f"+ extraction sweep; min of {q_repeats} in-process repeats "
                  f"per fixture query, {repeats} per crawl/extract job)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "crawl": {
            "web_tier": web_tier,
            "rounds": crawl_rounds,
            "urls_scheduled_total": res["scheduled_total"],
            "urls_scheduled_per_s": round(urls_per_s, 1),
            "pages_extracted": n_pages,
            "pages_extracted_per_s": round(pages_per_s, 1),
        },
        # the record's own noise attestation: burner > 1.5x nominal
        # means the crawl/extract section ran inside a degradation
        # window and its numbers bound the box, not the engine
        "machine": {
            "burner_s": round(burner_worst, 3),
            "burner_nominal_s": burner_nominal,
            "contaminated": (burner_nominal is not None
                             and burner_worst > 1.5 * burner_nominal),
        },
    }
    # contract-closing design-point scaling row (written by
    # bench/scaling.py --big-budget-scale): carried verbatim so the
    # driver record contains the north-rule evidence, not just the
    # measurement-sized proxy above
    dp = REPO / "BENCH" / "design_point.json"
    if dp.exists():
        out["design_point"] = json.loads(dp.read_text())
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
