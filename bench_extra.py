#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1) — NOT the frozen
driver bench. Isolates each declared headline query with the noop sink,
breaks dd03_04 into its four sections, and dumps explain("formatted")
for every query it times.

Usage:
  python bench_extra.py [--sf DIR] [--queries q1,q2|all] [--repeats N]
                        [--plans-dir plans/r06] [--plans-suffix before]
                        [--sections] [--no-plans]

Prints one JSON line: {"sf":..., "queries": {name: [s, s, ...]}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="all")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--sections", action="store_true",
                    help="also time dd03_04's four sections separately")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    # mirror bench.py's session config exactly so numbers are comparable
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .appName("bench_extra")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.plans.fixture_queries import QUERIES

    # same warmup as bench.py: JVM + one Arrow python worker per core
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm_arrow(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches

    (spark.range(cpus * 2, numPartitions=cpus * 2)
     .mapInArrow(_warm_arrow, "id long").collect())

    names = (list(QUERIES) if args.queries == "all"
             else [n.strip() for n in args.queries.split(",")])

    out: dict = {"sf": args.sf, "cpus": cpus, "queries": {}}

    if args.plans_dir:
        plans = REPO / args.plans_dir
        plans.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = QUERIES[name]
        if args.plans_dir:
            import io
            from contextlib import redirect_stdout
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (plans / f"{name}_{args.plans_suffix}.txt").write_text(
                buf.getvalue())
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            noop(fn(spark, args.sf))
            samples.append(round(time.time() - t0, 3))
        out["queries"][name] = samples
        print(f"# {name}: {samples}", file=sys.stderr)

    if args.sections:
        from pyspark.sql import functions as F

        from data_crawler_spark.operators import dedup
        from data_crawler_spark.sources.fixtures import load

        def s_hash(spark, sf):
            return load(spark, sf, "documents").select(
                F.col("doc_id"), F.xxhash64("text").alias("h"))

        def s_approx(spark, sf):
            return load(spark, sf, "orders").agg(
                F.approx_count_distinct("o_custkey", 0.02).alias("a"))

        def s_minhash_sigs(spark, sf):
            return dedup.minhash_signatures(
                load(spark, sf, "documents"))

        def s_minhash_cands(spark, sf):
            sigs = dedup.minhash_signatures(load(spark, sf, "documents"))
            return dedup.lsh_candidate_pairs(sigs, dedup=False)

        def s_minhash_full(spark, sf):
            return dedup.minhash_near_dups(
                load(spark, sf, "documents"), threshold=0.7)

        def s_simhash_sigs(spark, sf):
            return dedup.simhash_signatures(load(spark, sf, "documents"))

        def s_simhash_full(spark, sf):
            return dedup.simhash_near_dups(
                load(spark, sf, "documents"), max_hamming=8)

        sections = {
            "sec_hash": s_hash, "sec_approx": s_approx,
            "sec_minhash_sigs": s_minhash_sigs,
            "sec_minhash_cands": s_minhash_cands,
            "sec_minhash_full": s_minhash_full,
            "sec_simhash_sigs": s_simhash_sigs,
            "sec_simhash_full": s_simhash_full,
        }
        for name, fn in sections.items():
            samples = []
            for _ in range(args.repeats):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                noop(fn(spark, args.sf))
                samples.append(round(time.time() - t0, 3))
            out["queries"][name] = samples
            print(f"# {name}: {samples}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
