"""Bucketed page store: crawl over the pruned fetch path is EXACTLY
the crawl over the flat store, and the pruned plan lists only the
touched bucket partitions."""

import shutil

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.plans.pagestore import (
    bucket_col,
    fetch_bucket_pruned,
    open_bucketed_pages,
    write_bucketed_pages,
)


@pytest.fixture(scope="module")
def bucketed_web(spark, web1k, tmp_path_factory):
    """A copy of web1k whose pages also exist as a bucketed store."""
    web = tmp_path_factory.mktemp("bweb")
    for f in ("pages.parquet", "hosts.parquet", "robots_rules.parquet",
              "seeds.txt", "meta.json"):
        src = web1k / f
        if src.is_dir():
            shutil.copytree(src, web / f)
        else:
            shutil.copy(src, web / f)
    write_bucketed_pages(spark, web / "pages.parquet",
                         web / "pages_bucketed", n_buckets=16)
    return web


def test_roundtrip_complete(spark, bucketed_web):
    flat = spark.read.parquet(str(bucketed_web / "pages.parquet"))
    bucketed, nb = open_bucketed_pages(spark, bucketed_web / "pages_bucketed")
    assert nb == 16
    assert bucketed.count() == flat.count()
    # bucket column is consistent with the layout rule
    bad = bucketed.filter(
        F.col("bucket") != bucket_col(F.col("url"), 16)).count()
    assert bad == 0


def test_pruned_fetch_matches_flat(spark, bucketed_web):
    flat = spark.read.parquet(str(bucketed_web / "pages.parquet"))
    bucketed, nb = open_bucketed_pages(spark, bucketed_web / "pages_bucketed")
    sched = flat.select("url").limit(37).withColumn("depth", F.lit(0))
    cols = ["url", "depth", "warc_ts", "lang"]
    pruned = fetch_bucket_pruned(sched, bucketed, nb, cols)
    direct = sched.join(flat, "url", "inner").select(*cols)
    got = sorted((r.url, r.lang) for r in pruned.collect())
    want = sorted((r.url, r.lang) for r in direct.collect())
    assert got == want


def test_partition_pruning_in_plan(spark, bucketed_web):
    """The pruned scan must carry a PartitionFilters entry on bucket."""
    bucketed, nb = open_bucketed_pages(spark, bucketed_web / "pages_bucketed")
    flat = spark.read.parquet(str(bucketed_web / "pages.parquet"))
    sched = flat.select("url").limit(5).withColumn("depth", F.lit(0))
    pruned = fetch_bucket_pruned(sched, bucketed, nb, ["url", "depth", "lang"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan


def test_crawl_identical_with_bucketed_store(spark, bucketed_web, web1k, tmp_path):
    """End-to-end: the engine auto-detects the bucketed store and the
    crawl output is bit-identical to the flat-store crawl."""
    from data_crawler_spark.plans.crawl import open_crawl, run_crawl, visit_order_df
    ctx_probe = open_crawl(spark, bucketed_web, tmp_path / "probe")
    assert ctx_probe.pages_bucketed is not None

    b = run_crawl(spark, bucketed_web, tmp_path / "b", max_rounds=4)
    f = run_crawl(spark, web1k, tmp_path / "f", max_rounds=4)
    vo_b = [(r.round, r.url) for r in visit_order_df(b["ctx"]).collect()]
    vo_f = [(r.round, r.url) for r in visit_order_df(f["ctx"]).collect()]
    assert vo_b == vo_f
    ext_b = {r.url: r.text for r in b["ctx"].extracted.read().select("url", "text").collect()}
    ext_f = {r.url: r.text for r in f["ctx"].extracted.read().select("url", "text").collect()}
    assert ext_b == ext_f


def test_marker_invalidates_on_source_change(spark, web1k, tmp_path):
    """The _BUCKETS marker fingerprints the SOURCE parquet: regenerating
    pages.parquet must invalidate the bucketed copy (a bare n_buckets
    marker served stale pages forever)."""
    import os

    web = tmp_path / "web"
    web.mkdir()
    src = web1k / "pages.parquet"  # single file in the web1k fixture
    shutil.copy(src, web / "pages.parquet")
    store = tmp_path / "store"
    write_bucketed_pages(spark, web / "pages.parquet", store, n_buckets=8)
    full = open_bucketed_pages(spark, store)[0].count()

    # "regenerate" the source: rewrite with half the rows, bump mtime
    half = (spark.read.parquet(str(web / "pages.parquet"))
            .filter(F.xxhash64("url") % 2 == 0))
    half_n = half.count()
    assert 0 < half_n < full
    half.write.mode("overwrite").parquet(str(tmp_path / "half"))
    (web / "pages.parquet").unlink()
    shutil.copytree(tmp_path / "half", web / "pages.parquet")
    newest = max((web / "pages.parquet").rglob("*.parquet"),
                 key=lambda f: f.stat().st_mtime)
    os.utime(newest, (newest.stat().st_mtime + 5,) * 2)

    write_bucketed_pages(spark, web / "pages.parquet", store, n_buckets=8)
    assert open_bucketed_pages(spark, store)[0].count() == half_n

    # unchanged source: the marker short-circuits (store files untouched)
    before = sorted(p.stat().st_mtime_ns for p in store.rglob("*.parquet"))
    write_bucketed_pages(spark, web / "pages.parquet", store, n_buckets=8)
    after = sorted(p.stat().st_mtime_ns for p in store.rglob("*.parquet"))
    assert before == after
