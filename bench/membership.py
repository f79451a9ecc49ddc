"""Membership scan-bytes measurement (bucket-pruned discovered-log
scans, plans/frontier.py discovered(buckets)).

What this demonstrates: once the discovered base is large, an exact
membership probe whose candidate set hashes into a FEW buckets reads
only those bucket partitions — O(touched buckets), not O(corpus).
That is the small-probe path: end-of-crawl tail rounds, targeted
re-crawl checks, point lookups. Rounds whose maybe-set spans most
buckets (any round with >> n_buckets candidates) deliberately fall
back to the full scan / shuffle join — pruning cannot help them and
the adaptive >50%-coverage check (plans/crawl.py) prevents paying its
bookkeeping for nothing.

Method: ramp a crawl on a web tier until the discovered base is
measurement-sized, then for probe sizes [10, 100, 1000, 10000] draw a
deterministic url sample, compute its buckets, and record
  - bytes a pruned scan reads (stat walk of the referenced bucket
    partitions) vs the full base bytes
  - wall time of the pruned vs unpruned membership count
Prints one JSON line and APPENDS a markdown section to
BENCH/BASELINE.md (run bench/scaling.py first — it rewrites the file).
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
    ap.add_argument("--web-tier", default="web1m")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--ramp-rounds", type=int, default=5)
    ap.add_argument("--budget-scale", type=int, default=50)
    ap.add_argument("--no-md", action="store_true",
                    help="skip appending to BENCH/BASELINE.md")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

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
        .appName("membership-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.plans.crawl import run_crawl
    from data_crawler_spark.sources.web import gen_tier

    web = gen_tier(REPO / ".fixtures_cache", args.web_tier)
    state = Path(tempfile.mkdtemp(prefix="membership_state_"))
    try:
        res = run_crawl(spark, web, state, max_rounds=args.ramp_rounds,
                        resume=False, lineage_gauges=False,
                        budget_scale=args.budget_scale)
        fr = res["ctx"].frontier
        # compact so the whole discovered set sits in the bucketed base
        # (the steady-state shape between compactions)
        if fr.delta.n_segments() or fr.removed.n_segments():
            fr.compact()
        base_bytes = fr.base_bytes()
        disc = fr.discovered().select("url", "url_hash")

        probes = []
        for k in (10, 100, 1000, 10000):
            # deterministic sample: smallest k url_hashes — spread
            # uniformly over buckets like any hashed candidate set
            sample = [r["url"] for r in
                      disc.orderBy("url_hash").limit(k).collect()]
            sdf = spark.createDataFrame([(u,) for u in sample], ["url"])
            buckets = sorted({int(r["b"]) for r in sdf.select(
                F.pmod(F.xxhash64("url"), F.lit(fr.n_buckets)).cast("int")
                .alias("b")).distinct().collect()})
            pruned_engages = len(buckets) <= 0.5 * fr.n_buckets
            scanned = fr.bucket_bytes(buckets) if pruned_engages else base_bytes

            t0 = time.time()
            n_hit_pruned = (fr.discovered(buckets if pruned_engages else None)
                            .join(F.broadcast(sdf), "url", "left_semi").count())
            t_pruned = time.time() - t0
            t0 = time.time()
            n_hit_full = (fr.discovered()
                          .join(F.broadcast(sdf), "url", "left_semi").count())
            t_full = time.time() - t0
            assert n_hit_pruned == n_hit_full == len(sample)

            probes.append({
                "probe_urls": k,
                "buckets_touched": len(buckets),
                "n_buckets": fr.n_buckets,
                "pruning_engages": pruned_engages,
                "scanned_bytes": scanned,
                "base_bytes": base_bytes,
                "scan_fraction": round(scanned / base_bytes, 4),
                "t_pruned_s": round(t_pruned, 2),
                "t_full_s": round(t_full, 2),
            })

        out = {
            "metric": "membership scan bytes, bucket-pruned vs full base",
            "web_tier": args.web_tier,
            "discovered_urls": int(disc.count()),
            "base_bytes": base_bytes,
            "probes": probes,
        }
        print(json.dumps(out))

        if not args.no_md:
            md_path = REPO / "BENCH" / "BASELINE.md"
            rows = "\n".join(
                f"| {p['probe_urls']} | {p['buckets_touched']}/{p['n_buckets']} "
                f"| {'yes' if p['pruning_engages'] else 'no (adaptive fallback)'} "
                f"| {p['scanned_bytes'] / 1e6:.1f} MB | {p['scan_fraction']:.1%} "
                f"| {p['t_pruned_s']}s | {p['t_full_s']}s |"
                for p in probes)
            md = f"""

## Membership scan bytes: bucket-pruned vs full base ({args.web_tier})

Discovered base after {args.ramp_rounds} ramp rounds:
{out['discovered_urls']} urls, {base_bytes / 1e6:.1f} MB bucketed base.
A probe whose candidate urls hash into <=50% of the {probes[0]['n_buckets']}
buckets scans ONLY those bucket partitions; bigger probes adaptively
fall back to the full scan (pruning cannot help once most buckets are
touched — those rounds take the broadcast/shuffle membership join).

| probe urls | buckets touched | pruned | scanned | of base | pruned scan | full scan |
|---|---|---|---|---|---|---|
{rows}
"""
            with md_path.open("a") as f:
                f.write(md)
    finally:
        shutil.rmtree(state, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
