#!/usr/bin/env python
"""Crawl driver — the spark-submit entry point (SURVEY.md §3.1).

Usage:
  spark-submit --py-files engine.zip crawl.py \
      --web DIR [--state DIR] [--rounds N] [--salts S] [--fresh]

  python crawl.py --tier web1k ...   # also runs standalone (local mode)

Resumable: re-running with the same --state picks up from the last
committed round checkpoint (BASELINE.json:6,14).

Single-JVM local mode note: pass
  --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC
to spark-submit — G1 hits multi-second evacuation pauses on the
html-churn allocation pattern at high thread counts (see
bench/scaling_job.py). JVM flags cannot be set from inside this script.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--web", help="generated web dir (sources/web.py layout)")
    p.add_argument("--tier", choices=["web1k", "web10k", "web100k", "web1m", "web10m"],
                   help="generate/reuse a synthetic tier instead of --web")
    p.add_argument("--fixtures", default=".fixtures_cache",
                   help="cache dir for --tier generation")
    p.add_argument("--state", default=None, help="state dir (default: <web>/.state)")
    p.add_argument("--rounds", type=int, default=100)
    p.add_argument("--salts", type=int, default=16)
    p.add_argument("--fresh", action="store_true",
                   help="ignore any existing checkpoint (restart from seeds)")
    p.add_argument("--budget-scale", type=int, default=1,
                   help="benchmark-only multiplier on per-host budgets")
    p.add_argument("--gc-keep", type=int, default=None,
                   help="prune state tables to the last N snapshot versions per round")
    p.add_argument("--no-pipeline", action="store_true",
                   help="disable round pipelining (next round's gate/"
                        "schedule pass overlapping this round's commit "
                        "barrier); results are identical either way")
    p.add_argument("--extract-events", action="store_true",
                   help="also commit a typed race-event snapshot per "
                        "round (schema.org SportsEvent JSON-LD + "
                        "results tables, operators/structured.py)")
    p.add_argument("--no-verify-state", action="store_true",
                   help="skip the pre-resume state-dir integrity check "
                        "(tools/fsck_state.py) — e.g. on stores with "
                        "slow listings")
    p.add_argument("--master", default=None,
                   help="override master when run standalone (e.g. local[8])")
    args = p.parse_args(argv)

    if not args.web and not args.tier:
        p.error("one of --web / --tier is required")

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("data_crawler_spark.crawl")
    if args.master:
        b = b.master(args.master)
    spark = (b.config("spark.sql.session.timeZone", "UTC")
              .config("spark.sql.adaptive.enabled", "true")
              # 64m default coalesces the small per-round shuffles down
              # to a handful of tasks (bench/scaling_job.py)
              .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
              .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from data_crawler_spark.plans.crawl import run_crawl
    from data_crawler_spark.sources.web import gen_tier

    web = gen_tier(args.fixtures, args.tier) if args.tier else args.web
    state = args.state or f"{web}/.state"
    if args.fresh:
        import shutil
        shutil.rmtree(state, ignore_errors=True)

    t0 = time.time()
    res = run_crawl(spark, web, state, max_rounds=args.rounds,
                    resume=not args.fresh, n_salts=args.salts,
                    gc_keep=args.gc_keep, budget_scale=args.budget_scale,
                    pipeline_rounds=not args.no_pipeline,
                    verify_state=not args.no_verify_state,
                    extract_events=args.extract_events)
    wall = time.time() - t0
    out = {
        "web": str(web),
        "state": str(state),
        "rounds_run": res["rounds_run"],
        "scheduled_total": res["scheduled_total"],
        "seen_count": res["seen_count"],
        "wall_s": round(wall, 2),
        "urls_per_s": round(res["scheduled_total"] / wall, 1) if wall > 0 else None,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
