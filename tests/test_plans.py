"""Physical-plan obligations (SURVEY.md §4.1): these are the properties
that make the engine viable at 100 TB, asserted on the actual plans.

- `html:binary` never enters the scheduler's scan (column pruning)
- predicate pushdown reaches the parquet scan (PushedFilters)
- robots/budget joins broadcast (no frontier shuffle for gating)
- aggregations run inside WholeStageCodegen with partial aggregation
- the salted scheduler partitions by (host, salt) before re-ranking
"""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.robots import robots_gate
from data_crawler_spark.operators.scheduler import schedule_per_host_salted


def plan_str(df, mode: str = "formatted") -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def crawl_ctx(spark, web1k, tmp_path_factory):
    from data_crawler_spark.plans.crawl import bootstrap, open_crawl
    ctx = open_crawl(spark, web1k, tmp_path_factory.mktemp("plans_state"))
    bootstrap(ctx)
    return ctx


def test_scheduler_plan_never_reads_html(crawl_ctx):
    from data_crawler_spark.operators.links import path_col
    frontier = crawl_ctx.frontier.read()
    cand = frontier.withColumn("path", path_col(F.col("url")))
    allowed = robots_gate(cand, crawl_ctx.rules).drop("path")
    sched = schedule_per_host_salted(allowed, crawl_ctx.hosts)
    p = plan_str(sched)
    assert "html" not in p
    assert "warc_ts" not in p  # only frontier columns are touched


def test_fetch_plan_prunes_page_columns(crawl_ctx):
    """The fetch join reads only the page columns the round needs; the
    ReadSchema of the pages scan must not include `text` (dropped at
    load: the engine may never see the ground-truth column)."""
    sched = crawl_ctx.frontier.read().select("url", "depth")
    fetched = sched.join(crawl_ctx.pages, "url", "inner") \
                   .select("url", "depth", "warc_ts", "lang", "html")
    p = plan_str(fetched)
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln and "pages" in p]
    assert scan
    assert all("text" not in ln for ln in scan), scan


def test_parquet_pushdown(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    p = plan_str(q)
    assert "PushedFilters: [" in p
    assert "IsNotNull(l_quantity)" in p or "GreaterThan(l_quantity" in p
    # column pruning: ReadSchema carries only the two selected columns
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in rs and "l_orderkey" in rs


def test_robots_gate_broadcasts(crawl_ctx):
    from data_crawler_spark.operators.links import path_col
    cand = crawl_ctx.frontier.read().withColumn("path", path_col(F.col("url")))
    p = plan_str(robots_gate(cand, crawl_ctx.rules))
    assert "BroadcastHashJoin" in p
    # zero frontier shuffle: the only Exchange allowed is the broadcast
    # itself; the candidate side must never hash-partition.
    assert p.count("Exchange hashpartitioning") == 0


def test_agg_partial_final_codegen(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    p = plan_str(q)
    assert "partial_sum" in p  # map-side combine
    q.collect()  # AQE prints codegen spans only in the executed plan
    executed = q._jdf.queryExecution().executedPlan().toString()
    assert "*(" in executed  # WholeStageCodegen stage markers


def test_salted_scheduler_partitions_by_salt(crawl_ctx):
    frontier = crawl_ctx.frontier.read()
    sched = schedule_per_host_salted(frontier, crawl_ctx.hosts, n_salts=16)
    p = plan_str(sched)
    assert "hashpartitioning(host" in p.replace("#", " #") or "hashpartitioning(host" in p
    assert "salt" in p


def test_anti_join_on_url_not_hash(crawl_ctx):
    """Exactness: the seen dedup anti-joins on the full url string."""
    frontier = crawl_ctx.frontier.read()
    seen = crawl_ctx.seen.read()
    fresh = frontier.join(seen.select("url"), "url", "left_anti")
    p = plan_str(fresh)
    assert "LeftAnti" in p
