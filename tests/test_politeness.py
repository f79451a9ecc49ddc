"""Politeness audit over real crawl output: budgets never exceeded;
gap/session analytics behave."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.politeness import (
    budget_violations,
    host_session_blocks,
    inter_round_gaps,
)


@pytest.fixture(scope="module")
def crawl_tables(spark, web1k, tmp_path_factory):
    from data_crawler_spark.plans.crawl import run_crawl
    res = run_crawl(spark, web1k, tmp_path_factory.mktemp("polite"), max_rounds=6)
    ctx = res["ctx"]
    return ctx.scheduled.read(), ctx.hosts


def test_no_budget_violations(crawl_tables):
    scheduled, hosts = crawl_tables
    assert budget_violations(scheduled, hosts).count() == 0


def test_budget_violation_detected_when_planted(spark, crawl_tables):
    scheduled, hosts = crawl_tables
    extra = spark.createDataFrame(
        [(0, 99, f"https://host0.example.com/x{i}", 0, "host0.example.com",
          0, 1.0, i) for i in range(20)],
        scheduled.schema)
    v = budget_violations(scheduled.unionByName(extra), hosts).collect()
    assert any(r.host == "host0.example.com" and r.round == 0 for r in v)


def test_inter_round_gaps(crawl_tables):
    scheduled, _ = crawl_tables
    gaps = inter_round_gaps(scheduled)
    rows = gaps.filter(F.col("host") == "host0.example.com").orderBy("round").collect()
    assert rows[0].rounds_since_prev is None
    assert all(r.rounds_since_prev >= 1 for r in rows[1:])
    cums = [r.cumulative_scheduled for r in rows]
    assert cums == sorted(cums)


def test_session_blocks_partition(crawl_tables):
    scheduled, _ = crawl_tables
    sess = host_session_blocks(scheduled, gap_rounds=2)
    per_host_total = {r.host: r.total for r in
                      scheduled.groupBy("host").agg(F.count("*").alias("total")).collect()}
    sess_total = {r.host: r.total for r in
                  sess.groupBy("host").agg(F.sum("n_in_session").alias("total")).collect()}
    assert per_host_total == sess_total  # sessions partition the activity


def test_session_gap_off_by_one(spark):
    """Idle rounds between bursts is round - prev - 1: one idle round
    under gap_rounds=2 must NOT split (the bare difference did)."""
    rows = [("h", 1, "u1"), ("h", 3, "u2"), ("h", 7, "u3")]
    df = spark.createDataFrame(rows, "host string, round int, url string")
    sess = host_session_blocks(df, gap_rounds=2).collect()
    spans = sorted((r.session_start, r.session_end) for r in sess)
    # rounds 1,3 stay one session (1 idle round); round 7 splits
    # (3 idle rounds >= 2)
    assert spans == [(1, 3), (7, 7)]
