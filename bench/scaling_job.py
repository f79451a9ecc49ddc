"""One scaling measurement at a fixed core count (run in its own
process so each measurement gets a fresh JVM). Prints one JSON line.

Jobs (the north-star workloads, BASELINE.json:2, plus a calibration):
  extract : mapInArrow extraction+link sweep over the page store
  crawl   : politeness-scheduled crawl rounds (budget_scale makes the
            rounds big enough to measure throughput, semantics intact)
  minhash : MinHash signature sweep over page text (CPU-heavy, shuffle-
            light real operator - dedup at scale)
  burn    : pure-numpy pandas-UDF burner with NO engine code - measures
            the MACHINE's own CPU scaling ceiling at this core count,
            used to normalize the engine numbers on this noisy/turbo VM
  scan    : pure parquet scan+count of the page store with NO engine
            code - the machine's IO ceiling. local[N] shares ONE virtio
            disk, so IO-bound work cannot scale with N here no matter
            the architecture; a real cluster adds a disk with every
            executor. Engine jobs whose raw efficiency matches scan's
            are at the disk ceiling, not an engine limit.
"""

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
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--budget-scale", type=int, default=50)
    ap.add_argument("--minhash-mod", type=int, default=5,
                    help="minhash docs = pages where xxhash64(url) %% mod == 0")
    ap.add_argument("--inner-repeats", type=int, default=3,
                    help="same-JVM repeats per job (min taken)")
    ap.add_argument("--big-budget-scale", type=int, default=0,
                    help="if >0, also measure a LARGE-ROUND crawl "
                         "(design-point round sizes: the 10^10 frontier "
                         "schedules millions of URLs per round, where "
                         "the fixed per-round driver latency amortizes)")
    ap.add_argument("--big-rounds", type=int, default=6)
    ap.add_argument("--big-state", default="",
                    help="ramped state dir from bench/ramp_state.py: "
                         "the job copies it and resumes for the SINGLE "
                         "measured round (the ramp is identical work at "
                         "every core count, so it runs once, not per "
                         "level). Requires --big-budget-scale matching "
                         "the ramp's.")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # default 64m advisory size makes AQE coalesce the small per-round
        # shuffles down to a handful of tasks — under-parallel at 32 cores
        # (measured: crawl 128s -> 73s at local[32] with 8m)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # ParallelGC: G1 (default) hits 1-2.7s evacuation pauses on the
        # html-churn allocation pattern at 32 threads — even a PURE JVM
        # parquet scan went bimodal 0.7s/12.8s under G1 (young-cap or
        # not); under ParallelGC the same scan is a stable 0.3s. A real
        # cluster's 4-8-core executors never see this single-JVM mode.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .appName(f"scaling-{args.cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.operators.dedup import minhash_signatures
    from data_crawler_spark.operators.extractor import extract_pages_with_links_arrow
    from data_crawler_spark.plans.crawl import run_crawl
    from data_crawler_spark.sources.web import gen_tier

    web = gen_tier(REPO / ".fixtures_cache", args.web_tier)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    # Python-worker warm-up: the first Arrow job pays one numpy/pandas/
    # pyarrow import per worker (~30s across 32 cold workers) — a real
    # cluster amortizes that over long-lived executors, so it must not
    # land inside the timed window.
    noop_warm = spark.range(0, 10_000, 1, args.cpus * 2)
    noop_warm.mapInArrow(lambda it: it, "id long").write.format(
        "noop").mode("overwrite").save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed_min(fn, repeats: int) -> float:
        """min over repeats: the VM has noisy-neighbor variance (same
        config measured 6.5-35s back-to-back); min is the capability."""
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    def warm_files(*roots) -> None:
        """Flush pending writeback and pull the given files/trees into
        the OS page cache BEFORE a timed leg. The big-state copytree
        writes multiple GB whose writeback otherwise steals the single
        virtio disk DURING the measured round and evicts the web store
        — measured as a 194s-vs-286s swing of the SAME 8-core design-
        point round purely on cache state (round 5). All legs at every
        core count therefore run in the same warm-store regime; the
        one-disk cold path is a sandbox artifact a real cluster (a
        disk per node) does not have."""
        import os
        os.sync()
        buf = bytearray(1 << 22)
        for root in roots:
            p = Path(root)
            files = ([p] if p.is_file()
                     else sorted(f for f in p.rglob("*") if f.is_file()))
            for f in files:
                with open(f, "rb", buffering=0) as fh:
                    while fh.readinto(buf):
                        pass

    pages = spark.read.parquet(str(web / "pages.parquet"))
    n_pages = pages.count()
    warm_files(web)  # every ceiling/job leg measures warm-store
    # IO ceiling: force-read the html column (the store's bulk) with a
    # trivial native aggregate - no engine code, no Python
    scan_s = timed_min(
        lambda: pages.select(F.sum(F.length("html"))).collect(),
        args.inner_repeats)
    extract_s = timed_min(
        lambda: noop(extract_pages_with_links_arrow(pages)), args.inner_repeats)

    state = Path(tempfile.mkdtemp(prefix=f"scale_state_{args.cpus}_"))
    try:
        t0 = time.time()
        res = run_crawl(spark, web, state, max_rounds=args.rounds, resume=False,
                        lineage_gauges=False, budget_scale=args.budget_scale)
        crawl_s = time.time() - t0
    finally:
        shutil.rmtree(state, ignore_errors=True)

    crawl_big_s, urls_big = None, None
    if args.big_budget_scale:
        state = Path(tempfile.mkdtemp(prefix=f"scale_big_{args.cpus}_"))
        try:
            if args.big_state:
                # resume a COPY of the pre-ramped state for the single
                # measured design-point round
                shutil.rmtree(state)
                shutil.copytree(args.big_state, state)
                # the copy dirtied GBs of page cache: flush + re-warm
                # web AND state so the measured round never competes
                # with its own setup's writeback
                warm_files(web, state)
                t0 = time.time()
                res_big = run_crawl(spark, web, state,
                                    max_rounds=args.big_rounds, resume=True,
                                    lineage_gauges=False,
                                    budget_scale=args.big_budget_scale)
            else:
                t0 = time.time()
                res_big = run_crawl(spark, web, state,
                                    max_rounds=args.big_rounds, resume=False,
                                    lineage_gauges=False,
                                    budget_scale=args.big_budget_scale)
            crawl_big_s = time.time() - t0
            urls_big = res_big["scheduled_total"]
        finally:
            shutil.rmtree(state, ignore_errors=True)

    # deterministic 1-in-5 sample via hash filter (a global limit() would
    # funnel the whole shingle sweep through one GlobalLimit task)
    docs = (pages.select(F.xxhash64("url").alias("doc_id"), "text")
            .filter(F.pmod(F.col("doc_id"), F.lit(args.minhash_mod)) == 0))
    n_docs = docs.count()
    minhash_s = timed_min(lambda: noop(minhash_signatures(docs, n_hashes=64)),
                          args.inner_repeats)

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from burner import burn_seconds
    burn_s = burn_seconds(spark, repeats=args.inner_repeats)

    out = {
        "cpus": args.cpus,
        "extract_s": round(extract_s, 2),
        "pages": n_pages,
        "pages_per_s": round(n_pages / extract_s, 1),
        "crawl_s": round(crawl_s, 2),
        "urls_scheduled": res["scheduled_total"],
        "urls_per_s": round(res["scheduled_total"] / crawl_s, 1),
        "minhash_s": round(minhash_s, 2),
        "minhash_docs": n_docs,
        "burn_s": round(burn_s, 2),
        "scan_s": round(scan_s, 2),
    }
    if crawl_big_s is not None:
        out["crawl_big_s"] = round(crawl_big_s, 2)
        out["urls_scheduled_big"] = urls_big
        out["urls_big_per_s"] = round(urls_big / crawl_big_s, 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
