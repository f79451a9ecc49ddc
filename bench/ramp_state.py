"""Build a ramped crawl state once, for resume-based scaling
measurements (bench/scaling_job.py --big-state).

The large-round scaling row measures ONE design-point round (millions
of scheduled URLs). The frontier ramp to that round size is identical
work at every core count and twice as long as the measured round
itself — so it runs ONCE here, and each measurement level resumes a
COPY of the resulting state for the single measured round. The crawl's
checkpointed resume is the mechanism (kill-resume tested in
tests/test_resume.py), so this is the deployment path, not a bench
hack.

Usage: python bench/ramp_state.py --out /tmp/ramp_state \
           [--web-tier web10m] [--budget-scale 1000] [--ramp-rounds 5]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--web-tier", default="web10m")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--budget-scale", type=int, default=1000)
    ap.add_argument("--ramp-rounds", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .appName("ramp-state")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.plans.crawl import run_crawl
    from data_crawler_spark.sources.web import gen_tier

    web = gen_tier(REPO / ".fixtures_cache", args.web_tier)
    out = Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    t0 = time.time()
    res = run_crawl(spark, web, out, max_rounds=args.ramp_rounds,
                    resume=False, lineage_gauges=False,
                    budget_scale=args.budget_scale)
    print(json.dumps({
        "state": str(out),
        "web_tier": args.web_tier,
        "budget_scale": args.budget_scale,
        "ramp_rounds": args.ramp_rounds,
        "ramp_scheduled": res["scheduled_total"],
        "ramp_wall_s": round(time.time() - t0, 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
