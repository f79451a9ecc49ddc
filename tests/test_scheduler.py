"""ops 22/15/26: per-host politeness top-k; salted two-phase variant is
result-identical for every salt count (the BASELINE.json:6,14 skew
mechanism must not change semantics)."""

import pandas as pd
from pyspark.sql import functions as F

from data_crawler_spark.operators.scheduler import (
    crawl_order,
    schedule_per_host,
    schedule_per_host_salted,
)


def _mk_candidates(spark, n=500, hosts=7):
    rows = []
    for i in range(n):
        h = f"host{i % hosts}.example.com"
        depth = i % 5
        rows.append((f"https://{h}/p{i}", h, depth, 1.0 / (1.0 + depth), i % 3, None))
    return spark.createDataFrame(
        rows, "url string, host string, depth int, priority double, discovered_round int, parent_url string")


def _mk_hosts(spark, hosts=7):
    return spark.createDataFrame(
        [(f"host{i}.example.com", [8, 4, 2, 1][i % 4]) for i in range(hosts)],
        "host string, budget_per_round long")


def _key(df):
    return sorted((r.url, r.rn) for r in df.select("url", "rn").collect())


def test_budget_cap(spark):
    cand, hosts = _mk_candidates(spark), _mk_hosts(spark)
    out = schedule_per_host(cand, hosts).groupBy("host").count().collect()
    budgets = {r.host: r.budget_per_round for r in hosts.collect()}
    for r in out:
        assert r["count"] <= budgets[r.host]


def test_salt_invariance(spark):
    """Property: salted two-phase == unsalted, for every S."""
    cand, hosts = _mk_candidates(spark), _mk_hosts(spark)
    base = _key(schedule_per_host(cand, hosts))
    for s in (1, 2, 16, 64):
        assert _key(schedule_per_host_salted(cand, hosts, s)) == base, s


def test_within_host_ordering(spark):
    cand, hosts = _mk_candidates(spark), _mk_hosts(spark)
    out = schedule_per_host(cand, hosts).filter(F.col("host") == "host0.example.com")
    rows = out.orderBy("rn").collect()
    keys = [(-r.priority, r.depth, r.discovered_round, r.url) for r in rows]
    assert keys == sorted(keys)


def test_crawl_order_total(spark):
    cand, hosts = _mk_candidates(spark), _mk_hosts(spark)
    sched = schedule_per_host(cand, hosts)
    got = [r.url for r in crawl_order(sched).collect()]
    pdf = sched.toPandas()
    pdf = pdf.sort_values(["priority", "depth", "host", "url"],
                          ascending=[False, True, True, True])
    assert got == list(pdf["url"])


def test_default_budget_for_unknown_host(spark):
    cand = _mk_candidates(spark, n=40, hosts=1)
    hosts = spark.createDataFrame([], "host string, budget_per_round long")
    out = schedule_per_host(cand, hosts)
    assert out.count() == 8  # DEFAULT_BUDGET


def test_two_phase_seq_matches_single_window(spark):
    """with_crawl_seq(P) is identical to the single-window seq for every
    P — two-phase range sequencing must not change the visit order."""
    from data_crawler_spark.operators.scheduler import with_crawl_seq
    cand, hosts = _mk_candidates(spark, n=800, hosts=11), _mk_hosts(spark, hosts=11)
    sched = schedule_per_host_salted(cand, hosts, n_salts=4).persist()
    want = {r.url: r.seq for r in with_crawl_seq(sched).collect()}
    for p in (2, 3, 8):
        got = {r.url: r.seq for r in with_crawl_seq(sched, num_partitions=p).collect()}
        assert got == want, f"P={p}"
    sched.unpersist()


def test_two_phase_seq_no_single_partition_exchange(spark):
    """P>1 plan must not funnel through a SinglePartition exchange."""
    from data_crawler_spark.operators.scheduler import with_crawl_seq
    cand, hosts = _mk_candidates(spark), _mk_hosts(spark)
    sched = schedule_per_host_salted(cand, hosts, n_salts=4).persist()
    sched.count()
    plan = with_crawl_seq(sched, num_partitions=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan
    sched.unpersist()


def test_adaptive_host_budgets(spark):
    """Proportional-to-yield allocation with an explore floor: exact
    hand-computed shares, never overshoots the total, cap applied,
    zero-yield corpus splits evenly, negative yield clamps to 0,
    infeasible floor raises; layout-invariant."""
    from data_crawler_spark.operators.scheduler import adaptive_host_budgets

    df = spark.createDataFrame(
        [("a.com", 0.0), ("b.com", 10.0), ("c.com", 30.0)],
        "host string, yield double")
    got = {r.host: r.budget_per_round for r in
           adaptive_host_budgets(df.repartition(3), 50, floor=2).collect()}
    # extra = 50 - 6 = 44; shares floor(44*y/40): 0, 11, 33
    assert got == {"a.com": 2, "b.com": 13, "c.com": 35}
    assert sum(got.values()) <= 50

    capped = {r.host: r.budget_per_round for r in
              adaptive_host_budgets(df, 50, floor=2, cap=20).collect()}
    assert capped == {"a.com": 2, "b.com": 13, "c.com": 20}

    # zero yield everywhere: even split of the extra
    zero = spark.createDataFrame([("a", 0.0), ("b", 0.0)],
                                 "host string, yield double")
    got0 = {r.host: r.budget_per_round for r in
            adaptive_host_budgets(zero, 10, floor=1).collect()}
    assert got0 == {"a": 5, "b": 5}

    # negative yield clamps to zero, not negative budgets
    neg = spark.createDataFrame([("a", -5.0), ("b", 5.0)],
                                "host string, yield double")
    gotn = {r.host: r.budget_per_round for r in
            adaptive_host_budgets(neg, 10, floor=1).collect()}
    assert gotn == {"a": 1, "b": 9}

    # multi-billion budgets must not wrap int32
    big = {r.host: r.budget_per_round for r in
           adaptive_host_budgets(
               spark.createDataFrame([("x", 1.0)],
                                     "host string, yield double"),
               3_000_000_000, floor=0).collect()}
    assert big == {"x": 3_000_000_000}

    import pytest as _p
    with _p.raises(ValueError, match="cannot fund floor"):
        adaptive_host_budgets(df, 5, floor=2)
    with _p.raises(ValueError):
        adaptive_host_budgets(df, 0)
