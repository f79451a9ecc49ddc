"""Bucketed page store (the 100 TB fetch path).

A flat page table forces every crawl round's fetch join to scan the
whole store — fine when rounds are big, fatal when the store is 10^10
pages and a round touches 0.01% of it. The fix is the same one the
north star prescribes for frontier/seen (BASELINE.json:6: partitioned
on canonicalized-URL xxhash64): lay the store out partitioned by
``bucket = pmod(xxhash64(url), n_buckets)`` and let the fetch join
prune partitions.

``fetch_bucket_pruned`` computes the distinct buckets of the scheduled
slice (tiny — bounded by Σ host budgets), pushes an IN-filter on the
partition column (static partition pruning: non-matching bucket
directories are never listed, let alone read), and broadcasts the
scheduled slice for the residual join.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_crawler_spark import schemas


def bucket_col(url, n_buckets: int):
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def write_bucketed_pages(spark: SparkSession, pages_parquet: str | os.PathLike,
                         out_dir: str | os.PathLike, n_buckets: int = 64) -> Path:
    """One-time layout job: flat pages.parquet -> dir partitioned by
    bucket(url_hash). Idempotent via a marker file."""
    out = Path(out_dir)
    marker = out / "_BUCKETS"
    # the marker carries a SOURCE fingerprint (mtime+size), not just
    # n_buckets: a regenerated pages.parquet (fixture version bump,
    # force re-gen) must invalidate the bucketed copy, or every fetch
    # silently reads stale pages
    src = Path(pages_parquet)
    stat_src = (src if src.is_file()
                else max(src.rglob("*.parquet"), default=src,
                         key=lambda f: f.stat().st_mtime))
    st = stat_src.stat()
    want = f"{n_buckets}\n{int(st.st_mtime)}:{st.st_size}"
    if marker.exists() and marker.read_text() == want:
        return out
    pages = spark.read.schema(schemas.PAGES).parquet(str(pages_parquet))
    (pages.withColumn("bucket", bucket_col(F.col("url"), n_buckets))
     .repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(str(out)))
    marker.write_text(want)
    return out


def open_bucketed_pages(spark: SparkSession, store_dir: str | os.PathLike) -> tuple[DataFrame, int]:
    from pyspark.sql.types import IntegerType, StructField, StructType

    store = Path(store_dir)
    # first marker line = n_buckets (line 2 is the source fingerprint;
    # pre-fingerprint markers were single-line, so this reads both)
    n_buckets = int((store / "_BUCKETS").read_text().splitlines()[0])
    # fresh StructType: StructType.add MUTATES the receiver, which would
    # poison the shared schemas.PAGES on repeated opens
    schema = StructType(list(schemas.PAGES.fields)
                        + [StructField("bucket", IntegerType(), True)])
    df = spark.read.schema(schema) \
        .option("basePath", str(store)).parquet(str(store))
    return df, n_buckets


def fetch_bucket_pruned(scheduled: DataFrame, pages_bucketed: DataFrame,
                        n_buckets: int, select_cols: list[str],
                        prune_threshold: float = 0.5) -> DataFrame:
    """The pruned fetch join: scheduled(url, ...) ⋈ pages, reading only
    the partitions whose bucket appears in this round's scheduled set.

    The bucket list is collected driver-side (≤ n_buckets ints) so the
    IN-filter is a literal predicate on the partition column —
    statically prunable at file listing time.

    Adaptive (measured on web1m): hash buckets prune only when the
    fetch touches a MINORITY of buckets — a broad crawl round of k
    URLs hits ~n_buckets*(1-exp(-k/n_buckets)) buckets, so once
    k ≳ n_buckets the filter lists everything and only adds overhead.
    Above ``prune_threshold`` coverage this falls back to the plain
    broadcast join over the full (still bucketed) store. The pruned
    path is the targeted-fetch regime: recrawl of a few hosts, point
    lookups, small politeness rounds against a 10^10-page store.
    """
    from pyspark import StorageLevel

    sched = scheduled.withColumn("bucket", bucket_col(F.col("url"), n_buckets))
    if scheduled.storageLevel == StorageLevel.NONE:
        # the plan executes twice (bucket collect + fetch join); pin it
        # unless the caller already cached it (the crawl does). The
        # scheduled set is politeness-bounded, so the pin is tiny.
        sched = sched.localCheckpoint()
    buckets = [r.bucket for r in sched.select("bucket").distinct().collect()]
    if len(buckets) <= prune_threshold * n_buckets:
        pruned = pages_bucketed.filter(F.col("bucket").isin(buckets))
        return (
            F.broadcast(sched)
            .join(pruned, ["url", "bucket"], "inner")
            .select(*select_cols)
        )
    return (
        F.broadcast(sched.drop("bucket"))
        .join(pages_bucketed, "url", "inner")
        .select(*select_cols)
    )
