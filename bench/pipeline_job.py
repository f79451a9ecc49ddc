"""One corpus-cleaning pipeline measurement at a fixed core count (own
process = fresh JVM). Prints one JSON line.

Workload: plans/corpus_pipeline.clean_corpus over the extracted text of
a cached fixture web — quality gates, repetition rules, exact dedup,
MinHash near-dup cluster removal, benchmark decontamination (eval set =
a deterministic 1/1000 slice of the corpus itself, so the stage does
real work), token counting, and two-phase shard packing, ending in a
noop sink. This is the end-to-end composition a training-data pipeline
runs, so its scaling is the number that matters beyond the single-op
rows in scaling_job.py.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--web-tier", default="web100k")
    ap.add_argument("--inner-repeats", type=int, default=2)
    ap.add_argument("--shard-budget", type=int, default=100_000)
    ap.add_argument("--lm", action="store_true",
                    help="enable the hygiene + CCNet LM perplexity "
                         "stages (reference = a deterministic 1/500 "
                         "corpus slice)")
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
        # see bench/scaling_job.py: G1 evacuation pauses make single-JVM
        # numbers bimodal at 32 threads
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .appName(f"pipeline-{args.cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.operators.extractor import extract_pages_arrow
    from data_crawler_spark.plans.corpus_pipeline import clean_corpus
    from data_crawler_spark.sources.web import gen_tier

    web = gen_tier(REPO / ".fixtures_cache", args.web_tier)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    noop_warm = spark.range(0, 10_000, 1, args.cpus * 2)
    noop_warm.mapInArrow(lambda it: it, "id long").write.format(
        "noop").mode("overwrite").save()

    pages = spark.read.parquet(str(Path(web) / "pages.parquet"))
    docs = (extract_pages_arrow(pages)
            .select(F.col("url").alias("doc_id"), "text"))
    # extraction is measured by scaling_job.py's extract row; the
    # pipeline measurement starts from a materialized text corpus.
    # persist BEFORE the first count so one extraction sweep both
    # counts and fills the cache (counting first ran the full Arrow
    # extractor twice)
    docs = docs.persist()
    n_docs = docs.count()
    eval_rows = (docs.filter(F.xxhash64("doc_id") % 1000 == 0)
                 .select("text").collect())
    eval_df = spark.createDataFrame(eval_rows, "text string")
    lm_kwargs = {}
    if args.lm:
        lm_kwargs = dict(
            hygiene=True,
            # pmod, not %: Spark's % keeps the dividend's sign, so
            # "% 500 == 1" would silently halve the slice
            lm_ref=docs.filter(F.pmod(F.xxhash64("doc_id"),
                                      F.lit(500)) == 1)
            .localCheckpoint(),
        )

    best = float("inf")
    for _ in range(args.inner_repeats):
        t0 = time.monotonic()
        out = clean_corpus(docs, eval_df, id_col="doc_id",
                           shard_budget=args.shard_budget,
                           shard_partitions=args.cpus * 2,
                           **lm_kwargs)
        out.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)

    # machine CPU ceiling in the SAME process/window (the shared
    # bench burner)
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from burner import burn_seconds
    burn_best = burn_seconds(spark, repeats=args.inner_repeats)

    print(json.dumps({
        "cpus": args.cpus, "web_tier": args.web_tier, "docs_in": n_docs,
        "pipeline_s": round(best, 2),
        "docs_per_s": round(n_docs / best, 1),
        "inner_repeats": args.inner_repeats,
        "lm": bool(args.lm),
        "burn_s": round(burn_best, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
