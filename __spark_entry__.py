"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl-slice: a synthesized URL frontier is
canonicalized, robots-gated, and scheduled through the salted per-host
politeness priority queue — the engine's core operator chain
(SURVEY.md §2 ops 05/09/14/15/22/26) — over the sf0.001 fixtures.

``queries``/``oracle_sql`` expose the full operator inventory of
SURVEY.md §2 plus the training-data family (dedup/similarity/text/
multimodal); the registry lives in
data_crawler_spark/plans/fixture_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:  # driver may import from any cwd
    sys.path.insert(0, str(_REPO))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from data_crawler_spark.functions.spark_udfs import canonicalize_udf
    from data_crawler_spark.operators.links import host_col, path_col
    from data_crawler_spark.operators.robots import robots_gate
    from data_crawler_spark.operators.scheduler import (
        schedule_per_host_salted,
        with_crawl_seq,
    )

    sf = "/root/testdata/sf0.001"
    c = spark.read.parquet(f"{sf}/customer.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")

    # synthesize a messy frontier from fixture keys: host by nation,
    # priority from order activity (depth 0/1 by segment)
    messy = F.concat(
        F.lit("HTTPS://Host"), F.col("c_nationkey").cast("string"),
        F.lit(".Example.COM:443/a/./b/../seg"), (F.col("c_custkey") % 8).cast("string"),
        F.lit("/p"), F.col("c_custkey").cast("string"), F.lit(".html#frag"))
    n_ord = (o.groupBy("o_custkey").count()
             .withColumnRenamed("o_custkey", "c_custkey"))
    depth_e = F.when(F.col("c_mktsegment") == "BUILDING", 0).otherwise(1)
    frontier = (
        c.join(n_ord, "c_custkey", "left").na.fill({"count": 0})
        .select(
            canonicalize_udf(messy).alias("url"),
            depth_e.cast("int").alias("depth"),
            # priority really is order activity: busier customers rank
            # higher, depth demotes (count was previously joined but
            # unused — the gate below then exercises a live column)
            ((F.col("count") + 1.0) / (F.col("count") + 2.0)
             / (1.0 + depth_e)).alias("priority"),
            F.lit(0).alias("discovered_round"),
            F.lit(None).cast("string").alias("parent_url"),
        )
        .withColumn("host", host_col(F.col("url")))
        .withColumn("path", path_col(F.col("url")))
    )
    # canonicalized paths are /a/seg{k}/p{ck}.html (the messy
    # /a/./b/../seg template folds to /a/seg) — rule prefixes must
    # carry the /a or the gate silently matches nothing
    rules = spark.createDataFrame(
        [(f"host{i}.example.com", "disallow", "/a/seg0")
         for i in range(0, 25, 5)]
        + [(f"host{i}.example.com", "allow", "/a/seg0/p1")
           for i in range(0, 25, 5)],
        "host string, rule_type string, path_prefix string")
    hosts = spark.createDataFrame(
        [(f"host{i}.example.com", [8, 4, 2, 1][i % 4]) for i in range(25)],
        "host string, budget_per_round long")

    allowed = robots_gate(frontier, rules).drop("path")
    sched = schedule_per_host_salted(allowed, hosts, n_salts=8)
    return with_crawl_seq(sched).select(
        "seq", "url", "host", "depth", "priority", "rn")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    from data_crawler_spark.plans.fixture_queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query (same aliases,
    same rounding). Rows-only entries (canonicalize/xxhash64/minhash/
    simhash/LSH-ANN/multimodal/approx) are pytest-verified instead —
    see tests/."""
    from data_crawler_spark.plans.fixture_queries import ORACLE
    return dict(ORACLE)
