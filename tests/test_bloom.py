"""op 31: bloom sidecar — no false negatives (exactness guard), bounded
false-positive rate, incremental merge, and crawl-result invariance
with the accelerator on vs off."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.bloom import (
    build_bloom,
    merge_blooms,
    optimal_params,
    prefilter_candidates,
)

N_BUCKETS = 16
M_BITS = 1 << 14
K = 7


@pytest.fixture(scope="module")
def seen(spark):
    return spark.range(0, 5000).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))


@pytest.fixture(scope="module")
def bloom(seen):
    return build_bloom(seen, n_buckets=N_BUCKETS, m_bits=M_BITS, k=K).cache()


def test_no_false_negatives(spark, seen, bloom):
    cand = seen  # every candidate IS seen
    unseen, maybe = prefilter_candidates(cand, bloom, N_BUCKETS)
    assert unseen.count() == 0
    assert maybe.count() == 5000


def test_false_positive_rate(spark, bloom):
    novel = spark.range(100000, 120000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    unseen, maybe = prefilter_candidates(novel, bloom, N_BUCKETS)
    fp = maybe.count() / 20000
    # ~5000 items over 16 buckets of 16K bits, k=7 -> fpp well under 1%
    assert fp < 0.02, fp


def test_merge_equals_bulk_build(spark):
    a = spark.range(0, 3000).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    b = spark.range(3000, 5000).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    both = a.unionByName(b)
    bulk = {r.bucket: (r.bitmap, r.n_items)
            for r in build_bloom(both, N_BUCKETS, m_bits=M_BITS, k=K).collect()}
    merged = {r.bucket: (r.bitmap, r.n_items)
              for r in merge_blooms(build_bloom(a, N_BUCKETS, m_bits=M_BITS, k=K),
                                    build_bloom(b, N_BUCKETS, m_bits=M_BITS, k=K)).collect()}
    assert bulk == merged


def test_optimal_params_sane():
    m, k = optimal_params(10_000, 0.01)
    assert m % 8 == 0 and m > 10_000 and 5 <= k <= 10


def test_crawl_invariant_bloom_on_off(spark, web1k, tmp_path):
    """The accelerator must not change any crawl output."""
    from data_crawler_spark.plans.crawl import run_crawl, visit_order_df
    on = run_crawl(spark, web1k, tmp_path / "on", max_rounds=4, use_bloom=True)
    off = run_crawl(spark, web1k, tmp_path / "off", max_rounds=4, use_bloom=False)
    vo_on = [(r.round, r.url) for r in visit_order_df(on["ctx"]).collect()]
    vo_off = [(r.round, r.url) for r in visit_order_df(off["ctx"]).collect()]
    assert vo_on == vo_off
    f_on = sorted(r.url for r in on["ctx"].frontier.read().collect())
    f_off = sorted(r.url for r in off["ctx"].frontier.read().collect())
    assert f_on == f_off
    assert on["ctx"].bloom.current_version() > 0
    assert off["ctx"].bloom.current_version() == 0

def test_cogrouped_probe_matches_collected(spark, seen, bloom):
    """Distributed (cogroup) probe == closure probe — bitmaps never
    transit the driver on the distributed path, results identical."""
    from data_crawler_spark.operators.bloom import prefilter_candidates
    cand = spark.range(0, 4000).select(
        F.concat(F.lit("https://x.test/"), F.col("id")).alias("url")
    ).withColumn("url_hash", F.xxhash64("url"))
    u1, m1 = prefilter_candidates(cand, bloom, 16, distributed=False)
    u2, m2 = prefilter_candidates(cand, bloom, 16, distributed=True)
    assert sorted(r.url for r in u1.collect()) == sorted(r.url for r in u2.collect())
    assert sorted(r.url for r in m1.collect()) == sorted(r.url for r in m2.collect())


def test_probe_auto_picks_distributed_for_huge_sidecar(spark, bloom):
    """m_bits large enough that collect would ship >64MB -> cogroup path
    (assert by plan: FlatMapCoGroupsInPandas present)."""
    from data_crawler_spark.operators.bloom import prefilter_candidates
    cand = spark.range(0, 100).select(
        F.concat(F.lit("https://y.test/"), F.col("id")).alias("url")
    ).withColumn("url_hash", F.xxhash64("url"))
    unseen, _ = prefilter_candidates(cand, bloom, 16, m_bits=1 << 33)
    plan = unseen._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_crawl_invariant_membership_join_mode(spark, web1k, tmp_path):
    """The shuffle fallback for the maybe-discovered membership check
    (rounds whose maybe set exceeds broadcast limits) must produce the
    same crawl as the scan+broadcast path."""
    from data_crawler_spark.plans.crawl import run_crawl, visit_order_df
    bc = run_crawl(spark, web1k, tmp_path / "bc", max_rounds=4,
                   membership_join="broadcast")
    sh = run_crawl(spark, web1k, tmp_path / "sh", max_rounds=4,
                   membership_join="shuffle")
    vo_bc = [(r.round, r.url) for r in visit_order_df(bc["ctx"]).collect()]
    vo_sh = [(r.round, r.url) for r in visit_order_df(sh["ctx"]).collect()]
    assert vo_bc == vo_sh
    f_bc = sorted(r.url for r in bc["ctx"].frontier.read().collect())
    f_sh = sorted(r.url for r in sh["ctx"].frontier.read().collect())
    assert f_bc == f_sh


def test_probe_three_way_parity(spark, seen, bloom):
    """probe_udf (pandas spec mirror), probe_cogrouped (distributed) and
    probe_native (JVM broadcast, the crawl's hot path) must mark the
    same candidates, and the native plan must contain no Python eval."""
    from data_crawler_spark.operators.bloom import (
        probe_cogrouped,
        probe_native,
        probe_udf,
    )
    cand = (spark.range(0, 9000, 3)
            .select(F.xxhash64(F.col("id").cast("string")).alias("url_hash")))
    rows = [r.asDict() for r in bloom.collect()]
    via_udf = cand.withColumn(
        "_maybe", probe_udf(rows, N_BUCKETS)(F.col("url_hash")))
    via_cg = probe_cogrouped(cand, bloom, N_BUCKETS)
    via_nat = probe_native(cand, bloom, N_BUCKETS, M_BITS, K)
    u = {(r.url_hash, r._maybe) for r in via_udf.collect()}
    c = {(r.url_hash, r._maybe) for r in via_cg.collect()}
    n = {(r.url_hash, r._maybe) for r in via_nat.collect()}
    assert u == c == n and len(n) == 3000
    plan = via_nat._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_native_link_pipeline_has_no_python(spark, web1k):
    """The crawl's candidate pipeline (resolve -> canonicalize -> hash
    -> bloom probe) must be pure JVM: Python workers appear once per
    round (the Arrow extraction), never in link processing."""
    from data_crawler_spark.operators.bloom import build_bloom, probe_native
    from data_crawler_spark.operators.links import (
        canonicalize_col,
        is_http_col,
        resolve_href_col,
    )
    pages = spark.read.parquet(str(web1k / "pages.parquet")).limit(50)
    seen_h = pages.select(F.xxhash64("url").alias("url_hash"))
    bl = build_bloom(seen_h, n_buckets=8, m_bits=1 << 12, k=5)
    cand = (pages.select("url", F.explode(F.split(F.col("text"), " ")).alias("href"))
            .withColumn("link", canonicalize_col(
                resolve_href_col(F.col("url"), F.col("href"))))
            .filter(is_http_col(F.col("link")))
            .select(F.col("link").alias("url"))
            .withColumn("url_hash", F.xxhash64("url")))
    marked = probe_native(cand, bl, 8, 1 << 12, 5)
    plan = marked._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_update_bloom_equals_build_plus_merge(spark):
    """The crawl's one-pass incremental update == build(delta) OR-merged
    into the old sidecar."""
    from data_crawler_spark.operators.bloom import update_bloom
    old_rows = spark.range(0, 3000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    delta = spark.range(3000, 5000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    old = build_bloom(old_rows, N_BUCKETS, m_bits=M_BITS, k=K)
    fused = {r.bucket: (list(r.bitmap), r.n_items)
             for r in update_bloom(old, delta, N_BUCKETS, M_BITS, K).collect()}
    two_step = {r.bucket: (list(r.bitmap), r.n_items)
                for r in merge_blooms(
                    old, build_bloom(delta, N_BUCKETS, m_bits=M_BITS, k=K)
                ).collect()}
    assert fused == two_step


def test_default_sized_build_small_input(spark):
    """Default sizing on a tiny seen set must produce a valid 64-bit-
    aligned layout (m_bits floor = one bigint word) — regression: small
    n derived m_bits of 8-32 and bitmap.view('<u8') raised."""
    tiny = spark.range(0, 3).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    bl = build_bloom(tiny, n_buckets=4)  # m_bits/k unset -> default sizing
    rows = bl.collect()
    assert rows
    for r in rows:
        assert r.m_bits >= 64 and r.m_bits % 64 == 0
        assert len(r.bitmap) == r.m_bits // 64
    # and the filter still has no false negatives
    unseen, maybe = prefilter_candidates(tiny, bl, 4)
    assert unseen.count() == 0 and maybe.count() == 3


def test_update_bloom_layout_mismatch_raises(spark):
    """A caller-passed (m_bits, k) differing from the persisted rows'
    must fail loudly, not corrupt bitmaps silently."""
    from data_crawler_spark.operators.bloom import update_bloom
    old_rows = spark.range(0, 100).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    delta = spark.range(100, 200).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    old = build_bloom(old_rows, N_BUCKETS, m_bits=M_BITS, k=K)
    with pytest.raises(Exception, match="layout mismatch"):
        update_bloom(old, delta, N_BUCKETS, m_bits=M_BITS * 2, k=K).collect()


def test_crawl_invariant_pruned_membership(spark, web1k, tmp_path):
    """Forcing the bucket-pruned membership path (prune threshold 0)
    must produce exactly the same crawl as the full-scan path."""
    from data_crawler_spark.plans.crawl import (
        open_crawl,
        run_round,
        visit_order_df,
    )
    from data_crawler_spark.plans.crawl import bootstrap as crawl_bootstrap

    def drive(state, prune_min):
        ctx = open_crawl(spark, web1k, state)
        ctx.membership_prune_min_bytes = prune_min
        crawl_bootstrap(ctx)
        for rnd in range(4):
            if run_round(ctx, rnd) == 0:
                break
        return ctx

    full = drive(tmp_path / "full", 1 << 60)   # never prune
    pruned = drive(tmp_path / "pruned", 0)     # always prune
    vo_f = [(r.round, r.url) for r in visit_order_df(full).collect()]
    vo_p = [(r.round, r.url) for r in visit_order_df(pruned).collect()]
    assert vo_f == vo_p
    f_f = sorted(r.url for r in full.frontier.read().collect())
    f_p = sorted(r.url for r in pruned.frontier.read().collect())
    assert f_f == f_p


def test_crawl_invariant_auto_shuffle_switch(spark, web1k, tmp_path):
    """membership_join='auto' with a zero broadcast threshold must take
    the shuffle branch every round and still produce the exact crawl."""
    from data_crawler_spark.plans.crawl import (
        open_crawl,
        run_round,
        visit_order_df,
    )
    from data_crawler_spark.plans.crawl import bootstrap as crawl_bootstrap

    def drive(state, max_rows):
        ctx = open_crawl(spark, web1k, state)  # membership_join="auto"
        ctx.membership_broadcast_max_rows = max_rows
        crawl_bootstrap(ctx)
        for rnd in range(4):
            if run_round(ctx, rnd) == 0:
                break
        return ctx

    bc = drive(tmp_path / "bc", 1 << 60)  # always broadcast
    sh = drive(tmp_path / "sh", 0)        # always shuffle
    vo_b = [(r.round, r.url) for r in visit_order_df(bc).collect()]
    vo_s = [(r.round, r.url) for r in visit_order_df(sh).collect()]
    assert vo_b == vo_s
    f_b = sorted(r.url for r in bc.frontier.read().collect())
    f_s = sorted(r.url for r in sh.frontier.read().collect())
    assert f_b == f_s


def test_merge_blooms_rejects_layout_mismatch(spark):
    """Same m_bits / different k would OR silently and probe false-
    negative; merge_blooms must refuse like update_bloom does."""
    from data_crawler_spark.operators.bloom import build_bloom, merge_blooms

    df = spark.createDataFrame([(i,) for i in range(50)], "url_hash long")
    a = build_bloom(df, n_buckets=4, m_bits=1 << 14, k=7)
    b = build_bloom(df, n_buckets=4, m_bits=1 << 14, k=5)
    with pytest.raises(Exception, match="layout mismatch"):
        merge_blooms(a, b).collect()
