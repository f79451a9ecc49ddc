"""One scaling measurement at a fixed core count (run in its own
process so each measurement gets a fresh JVM). Prints one JSON line.

The jobs are the north-star workloads (BASELINE.json:2):
  extract : mapInArrow extraction+link sweep over the page store
  crawl   : scheduling rounds (canonicalize/robots/salted topk/dedup)
  agg     : the star-join + pricing-summary fixture queries at sf0.1
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--web-tier", default="web1m")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--budget-scale", type=int, default=50)
    ap.add_argument("--agg-iters", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .appName(f"scaling-{args.cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.operators.extractor import extract_pages_with_links_arrow
    from data_crawler_spark.plans.crawl import run_crawl
    from data_crawler_spark.plans.fixture_queries import QUERIES
    from data_crawler_spark.sources.web import gen_tier

    web = gen_tier(REPO / ".fixtures_cache", args.web_tier)
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    pages = spark.read.parquet(str(web / "pages.parquet"))
    n_pages = pages.count()
    t0 = time.time()
    extract_pages_with_links_arrow(pages).write.format("noop").mode("overwrite").save()
    extract_s = time.time() - t0

    state = Path(tempfile.mkdtemp(prefix=f"scale_state_{args.cpus}_"))
    try:
        t0 = time.time()
        res = run_crawl(spark, web, state, max_rounds=args.rounds, resume=False,
                        lineage_gauges=False, budget_scale=args.budget_scale)
        crawl_s = time.time() - t0
    finally:
        shutil.rmtree(state, ignore_errors=True)

    t0 = time.time()
    for _ in range(args.agg_iters):
        for qname in ("q12_star_join_revenue", "q18_agg_pricing_summary"):
            QUERIES[qname](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    agg_s = time.time() - t0

    print(json.dumps({
        "cpus": args.cpus,
        "extract_s": round(extract_s, 2),
        "pages": n_pages,
        "pages_per_s": round(n_pages / extract_s, 1),
        "crawl_s": round(crawl_s, 2),
        "urls_scheduled": res["scheduled_total"],
        "urls_per_s": round(res["scheduled_total"] / crawl_s, 1),
        "agg_s": round(agg_s, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
