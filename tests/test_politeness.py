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


# ---------------------------------------------------------------------------
# fetch-status backoff (fetch_status_class_col / host_backoff)
# ---------------------------------------------------------------------------

from data_crawler_spark.operators.politeness import (  # noqa: E402
    apply_backoff,
    fetch_status_class_col,
    host_backoff,
    retry_after_until_col,
)

NOW = "2026-01-10 12:00:00"


def test_fetch_status_classes(spark):
    cases = [(200, "ok"), (204, "ok"), (301, "redirect"), (304, "redirect"),
             (404, "gone"), (410, "gone"), (403, "client_error"),
             (429, "throttled"), (503, "throttled"), (500, "server_error"),
             (502, "server_error"), (None, "unknown"), (999, "unknown")]
    df = spark.createDataFrame([(s,) for s, _ in cases], "status int")
    got = [r["c"] for r in
           df.select(fetch_status_class_col(F.col("status")).alias("c"))
           .collect()]
    assert got == [c for _, c in cases]


def test_retry_after_parse(spark):
    rows = [("120", "2026-01-10 12:00:00"),             # delta-seconds
            ("Sat, 10 Jan 2026 13:30:00 GMT", None),    # IMF-fixdate
            ("garbage", None),                          # unparsable
            (None, None)]                               # absent
    df = spark.createDataFrame(rows, "ra string, at string")
    got = df.select(
        retry_after_until_col(F.col("ra"), F.col("at").cast("timestamp"))
        .cast("string").alias("t")).collect()
    assert got[0]["t"] == "2026-01-10 12:02:00"
    assert got[1]["t"] == "2026-01-10 13:30:00"
    assert got[2]["t"] is None and got[3]["t"] is None


def _fetches(spark, rows):
    return spark.createDataFrame(
        rows, "host string, status int, retry_after string, "
              "fetched_at string").withColumn(
        "fetched_at", F.col("fetched_at").cast("timestamp"))


def test_host_backoff_ramp_and_retry_after(spark):
    rows = [
        # a.com: healthy
        ("a.com", 200, None, None), ("a.com", 404, None, None),
        # b.com: throttled once -> base penalty 60s (n_err=1 -> 2^0)
        ("b.com", 200, None, None), ("b.com", 429, None, None),
        # c.com: 3 server errors of 4 -> err_frac 0.75 >= 0.5,
        # penalty = 60 * 2^2 = 240s
        ("c.com", 500, None, None), ("c.com", 502, None, None),
        ("c.com", 503, None, None), ("c.com", 200, None, None),
        # d.com: throttled with explicit Retry-After BEYOND the ramp
        ("d.com", 429, "7200", "2026-01-10 12:00:00"),
    ]
    got = {r["host"]: r for r in host_backoff(
        _fetches(spark, rows), NOW, retry_after_col="retry_after",
        fetched_at_col="fetched_at").collect()}
    assert "a.com" not in got            # healthy host emits no row
    assert str(got["b.com"]["backoff_until"]) == "2026-01-10 12:01:00"
    assert str(got["c.com"]["backoff_until"]) == "2026-01-10 12:04:00"
    # explicit 7200s > capped ramp (60*2^0=60s) -> Retry-After wins
    assert str(got["d.com"]["backoff_until"]) == "2026-01-10 14:00:00"
    assert got["c.com"]["n_err"] == 3 and got["c.com"]["n_throttled"] == 1


def test_host_backoff_cap_and_threshold(spark):
    rows = ([("x.com", 500, None, None)] * 30
            + [("y.com", 500, None, None)]
            + [("y.com", 200, None, None)] * 9)
    got = {r["host"]: r for r in host_backoff(
        _fetches(spark, rows), NOW, base_backoff_s=60,
        max_backoff_s=600).collect()}
    # 60 * 2^20 >> 600 -> capped at 600s
    assert str(got["x.com"]["backoff_until"]) == "2026-01-10 12:10:00"
    # y.com err_frac 0.1 < 0.5 and no throttle -> no row
    assert "y.com" not in got
    with pytest.raises(ValueError):
        host_backoff(_fetches(spark, rows), NOW, error_threshold=0.0)
    with pytest.raises(ValueError):
        host_backoff(_fetches(spark, rows), NOW, base_backoff_s=0)


def test_apply_backoff(spark):
    hosts = spark.createDataFrame(
        [("a.com", 8), ("b.com", 4), ("c.com", 2)],
        "host string, budget_per_round int")
    backoffs = spark.createDataFrame(
        [("b.com", "2026-01-10 13:00:00"),   # still active at NOW
         ("c.com", "2026-01-10 11:00:00")],  # expired
        "host string, backoff_until string").withColumn(
        "backoff_until", F.col("backoff_until").cast("timestamp"))
    got = {r["host"]: r["budget_per_round"]
           for r in apply_backoff(hosts, backoffs, NOW).collect()}
    assert got == {"a.com": 8, "b.com": 0, "c.com": 2}


# ---------------------------------------------------------------------------
# Shared-IP politeness fold
# ---------------------------------------------------------------------------

def test_apply_ip_politeness(spark):
    from data_crawler_spark.operators.politeness import apply_ip_politeness
    hosts = spark.createDataFrame(
        [("a.com", 10), ("b.com", 4), ("c.com", 7),   # a+b+c share an ip
         ("d.com", 5),                                # own ip
         ("e.com", 9)],                               # unresolved
        "host string, budget_per_round long")
    resolved = spark.createDataFrame(
        [("a.com", "1.1.1.1"), ("b.com", "1.1.1.1"), ("c.com", "1.1.1.1"),
         ("d.com", "2.2.2.2"), ("x.com", "3.3.3.3")],
        "host string, ip string")
    got = {r.host: r.budget_per_round
           for r in apply_ip_politeness(hosts, resolved).collect()}
    # group cap = min(10,4,7)=4 split over 3: 2,1,1 with remainder to 'a'
    assert got == {"a.com": 2, "b.com": 1, "c.com": 1,
                   "d.com": 5, "e.com": 9}
    assert got["a.com"] + got["b.com"] + got["c.com"] == 4


def test_apply_ip_politeness_null_ip_and_dup_resolution(spark):
    from data_crawler_spark.operators.politeness import apply_ip_politeness
    hosts = spark.createDataFrame(
        [("a.com", 3), ("b.com", 3)], "host string, budget_per_round long")
    resolved = spark.createDataFrame(
        [("a.com", None), ("b.com", "9.9.9.9"), ("b.com", "9.9.9.9")],
        "host string, ip string")
    got = {r.host: r.budget_per_round
           for r in apply_ip_politeness(hosts, resolved).collect()}
    assert got == {"a.com": 3, "b.com": 3}
    # duplicate resolution rows must not duplicate the host row
    assert apply_ip_politeness(hosts, resolved).count() == 2


def test_fetch_status_class_string_status(spark):
    # fetch logs that store status as string: malformed/empty values
    # (connection-level failures) classify as 'unknown' instead of
    # crashing the job under ANSI cast semantics
    df = spark.createDataFrame(
        [("200",), ("429",), ("",), ("abc",), (None,)], "status string")
    got = [r["c"] for r in
           df.select(fetch_status_class_col(F.col("status")).alias("c"))
           .collect()]
    assert got == ["ok", "throttled", "unknown", "unknown", "unknown"]


def test_apply_ip_politeness_multihomed_deterministic(spark):
    from data_crawler_spark.operators.politeness import apply_ip_politeness

    hosts = spark.createDataFrame(
        [("a.com", 10), ("b.com", 4)], "host string, budget_per_round long")
    # a.com is multi-homed; it must pin to its MINIMUM ip (1.1.1.1,
    # b.com's group) regardless of resolution-row order
    fwd = [("a.com", "9.9.9.9"), ("a.com", "1.1.1.1"), ("b.com", "1.1.1.1")]
    for rows in (fwd, list(reversed(fwd))):
        resolved = spark.createDataFrame(rows, "host string, ip string")
        got = {r.host: r.budget_per_round
               for r in apply_ip_politeness(hosts, resolved).collect()}
        assert got == {"a.com": 2, "b.com": 2}
