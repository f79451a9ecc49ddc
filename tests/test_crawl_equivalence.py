"""THE correctness gate (BASELINE.json:2,14,15): the distributed engine
reproduces the single-node executable-spec crawler exactly — visit
order, URL-seen set, and extracted text bytes — on the web1k tier."""

import pytest

from data_crawler_spark.plans.crawl import run_crawl, visit_order_df

MAX_ROUNDS = 8


@pytest.fixture(scope="module")
def crawl_result(spark, web1k, tmp_path_factory):
    state = tmp_path_factory.mktemp("crawl_state")
    return run_crawl(spark, web1k, state, max_rounds=MAX_ROUNDS)


def test_visit_order_exact(crawl_result, oracle1k):
    ctx = crawl_result["ctx"]
    got = [(r.round, r.url) for r in visit_order_df(ctx).collect()]
    assert got == oracle1k.visit_order


def test_seen_set_exact(crawl_result, oracle1k):
    ctx = crawl_result["ctx"]
    got = {r.url for r in ctx.seen.read().select("url").collect()}
    assert got == oracle1k.seen


def test_extracted_bytes_exact(crawl_result, oracle1k):
    ctx = crawl_result["ctx"]
    got = {r.url: r.text for r in ctx.extracted.read().select("url", "text").collect()}
    assert got == oracle1k.extracted


def test_frontier_state_matches(crawl_result, oracle1k):
    """Even the remaining frontier agrees (url -> depth/round/parent)."""
    ctx = crawl_result["ctx"]
    got = {
        r.url: (r.depth, r.discovered_round, r.parent_url)
        for r in ctx.frontier.read().collect()
    }
    want = {
        u: (e.depth, e.discovered_round, e.parent_url)
        for u, e in oracle1k.frontier.items()
    }
    assert got == want


def test_gauges_off_writes_no_gauge_rows(spark, web1k, tmp_path):
    """lineage_gauges=False must skip the round-level full-table counts
    entirely (no partition_id == -1 rows) — the bench relies on it."""
    import pyspark.sql.functions as F
    res = run_crawl(spark, web1k, tmp_path / "st", max_rounds=2,
                    lineage_gauges=False)
    ctx = res["ctx"]
    lin = ctx.lineage.read()
    assert lin.filter(F.col("partition_id") == -1).count() == 0
    assert lin.filter(F.col("metric") == "scheduled").count() > 0


def test_lineage_totals(crawl_result, oracle1k):
    """Per-round lineage 'scheduled' totals == oracle per-round counts."""
    import pyspark.sql.functions as F
    ctx = crawl_result["ctx"]
    lin = (
        ctx.lineage.read().filter(F.col("metric") == "scheduled")
        .groupBy("round").agg(F.sum("value").alias("n"))
        .orderBy("round").collect()
    )
    assert [r.n for r in lin] == oracle1k.scheduled_per_round


def test_seq_partitioning_estimate_invariance(spark, web1k, tmp_path):
    """The seq-partitioning estimate (Σ-budget / last-round size,
    crawl.py run_round `est`) drives ONLY the two-phase partition
    count. Pin that claim: estimates wildly wrong in both directions —
    0 (single-window fallback) and ~10^6x actual (forces the 200-way
    two-phase path on measurement-sized rounds) — must produce the
    byte-identical visit order."""
    from data_crawler_spark.plans.crawl import (bootstrap, open_crawl,
                                                run_round, visit_order_df)

    orders = []
    for name, bound, last in [("est_zero", 0, 0),
                              ("est_huge", 10**12, 10**9)]:
        ctx = open_crawl(spark, web1k, tmp_path / name)
        bootstrap(ctx)
        for rnd in range(3):
            # re-pin before every round: run_round writes last_n_sched
            ctx.sched_budget_bound = bound
            ctx.last_n_sched = last
            if run_round(ctx, rnd) == 0:
                break
        orders.append([(r.round, r.seq, r.url)
                       for r in visit_order_df(ctx).collect()])
    assert orders[0] == orders[1]


def test_pipeline_rounds_invariance(spark, web1k, tmp_path):
    """Round pipelining (the run_crawl default) is a pure latency
    overlap: pipelined and inline crawls produce byte-identical visit
    order, and the pipelined run releases its staged prefetch at loop
    exit (no cached RDDs left behind)."""
    # compare RDD ID SETS, not counts: the session is suite-shared and
    # the ContextCleaner may GC-release earlier tests' localCheckpoint
    # blocks mid-test — the invariant is that run_crawl leaves no NEW
    # cached RDD behind, not that the global count is frozen
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = {int(k) for k in jmap.keySet().toArray()}
    res_p = run_crawl(spark, web1k, tmp_path / "p", max_rounds=4,
                      pipeline_rounds=True)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    after = {int(k) for k in jmap.keySet().toArray()}
    res_i = run_crawl(spark, web1k, tmp_path / "i", max_rounds=4,
                      pipeline_rounds=False)
    vo_p = [(r.round, r.seq, r.url)
            for r in visit_order_df(res_p["ctx"]).collect()]
    vo_i = [(r.round, r.seq, r.url)
            for r in visit_order_df(res_i["ctx"]).collect()]
    assert vo_p == vo_i
    assert after - before == set(), \
        "staged prefetch must be released at exit"


def test_bootstrap_resets_previous_state(spark, web1k, tmp_path):
    """run_crawl(resume=False) on a previously-used state dir must not
    inherit the old crawl's un-compacted frontier logs or append onto
    its scheduled/extracted tables — the restart must equal a crawl
    into a fresh dir."""
    run_crawl(spark, web1k, tmp_path / "s", max_rounds=3)
    res2 = run_crawl(spark, web1k, tmp_path / "s", max_rounds=3,
                     resume=False)
    fresh = run_crawl(spark, web1k, tmp_path / "f", max_rounds=3)
    vo2 = [(r.round, r.seq, r.url)
           for r in visit_order_df(res2["ctx"]).collect()]
    vof = [(r.round, r.seq, r.url)
           for r in visit_order_df(fresh["ctx"]).collect()]
    assert vo2 == vof
    assert (res2["ctx"].scheduled.read().count()
            == fresh["ctx"].scheduled.read().count())


def test_bloom_stays_fresh_across_use_bloom_toggle(spark, web1k, tmp_path):
    """A use_bloom=False stretch that compacts (truncating the delta
    log) must still fold the delta into an EXISTING bloom sidecar —
    otherwise a later use_bloom resume probes a stale bloom, gets false
    negatives, and silently re-discovers seen URLs."""
    from data_crawler_spark.plans.crawl import bootstrap, open_crawl, run_round

    def drive(state, toggle):
        ctx = open_crawl(spark, web1k, state)
        ctx.frontier.compact_every = 1  # compact (and fold) every round
        bootstrap(ctx)
        for rnd in range(5):
            ctx.use_bloom = (not toggle) or rnd not in (1, 2)
            if run_round(ctx, rnd) == 0:
                break
        return ctx

    ctx_t = drive(tmp_path / "t", toggle=True)
    ctx_a = drive(tmp_path / "a", toggle=False)
    seen_t = sorted(r.url for r in ctx_t.seen.read().collect())
    seen_a = sorted(r.url for r in ctx_a.seen.read().collect())
    assert seen_t == seen_a
    # frontier invariant: no url discovered twice
    disc = ctx_t.frontier.discovered().groupBy("url").count()
    assert disc.filter("count > 1").count() == 0
