"""FrontierStore (plans/frontier.py): the LSM pending-set — O(delta)
commits, tombstone reads, compaction, and checkpoint rollback must all
preserve the exact pending view the naive rewrite-every-round table
held. (The crawl-level exactness — visit order / seen set / frontier
vs the oracle — is asserted in test_crawl_equivalence and the goldens,
which run the store through its compaction cadence.)"""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark import schemas
from data_crawler_spark.plans.frontier import FrontierStore


def _rows(spark, urls, rnd):
    return spark.createDataFrame(
        [(u, hash(u) % 1000, u.split("/")[2], 1, 0.5, rnd, None) for u in urls],
        schemas.FRONTIER)


def _urls(store):
    return sorted(r.url for r in store.read().collect())


@pytest.fixture()
def store(spark, tmp_path):
    s = FrontierStore(spark, tmp_path, schemas.FRONTIER, compact_every=3)
    s.bootstrap(_rows(spark, [f"https://h0.x/p{i}" for i in range(4)], 0))
    return s


def test_commit_round_appends_and_tombstones(spark, store):
    # schedule 2 of the seeds, discover 3 new
    store.commit_round(_rows(spark, ["https://h1.x/a", "https://h1.x/b",
                                     "https://h2.x/c"], 1),
                       spark.createDataFrame([("https://h0.x/p0",),
                                              ("https://h0.x/p1",)], ["url"]))
    assert _urls(store) == sorted(
        ["https://h0.x/p2", "https://h0.x/p3",
         "https://h1.x/a", "https://h1.x/b", "https://h2.x/c"])
    # O(delta) shape: base untouched, one delta segment, one tombstone segment
    assert store.base.current_version() == 1
    assert store.delta.n_segments() == 1
    assert store.removed.n_segments() == 1


def test_compaction_preserves_view_and_resets_logs(spark, store):
    expect = set(f"https://h0.x/p{i}" for i in range(4))
    for rnd in range(1, 4):  # compact_every=3 -> compaction fires at rnd 3
        new = [f"https://h{rnd}.x/n{j}" for j in range(3)]
        gone = sorted(expect)[:2]
        store.commit_round(_rows(spark, new, rnd),
                           spark.createDataFrame([(u,) for u in gone], ["url"]))
        expect = (expect - set(gone)) | set(new)
        assert _urls(store) == sorted(expect)
    assert store.delta.n_segments() == 0  # truncated by compaction
    assert store.removed.n_segments() == 0
    assert store.base.current_version() == 2  # one compacted rewrite
    assert _urls(store) == sorted(expect)


def test_rollback_restores_all_three_tables(spark, store):
    v0 = store.versions()
    before = _urls(store)
    store.commit_round(_rows(spark, ["https://h9.x/z"], 1),
                       spark.createDataFrame([("https://h0.x/p0",)], ["url"]))
    assert _urls(store) != before
    store.rollback(v0)
    assert _urls(store) == before
    # legacy int checkpoint (pre-store) rolls back base only
    store.rollback(v0["base"])
    assert _urls(store) == before


def test_no_dedup_needed_invariant(spark, store):
    """Tombstoned urls stay physically in base until compaction but must
    never surface in the view, and a re-append of a LIVE url is the
    caller's contract violation this store does not need to handle —
    assert the view stays url-unique through tombstone + compaction."""
    store.commit_round(_rows(spark, ["https://h1.x/a"], 1),
                       spark.createDataFrame([("https://h0.x/p0",)], ["url"]))
    store.commit_round(_rows(spark, ["https://h1.x/b"], 2),
                       spark.createDataFrame([("https://h1.x/a",)], ["url"]))
    store.compact()
    df = store.read()
    assert df.count() == df.select("url").distinct().count() == 4
    assert "https://h1.x/a" not in _urls(store)


def test_read_is_single_broadcast_antijoin(spark, store):
    """Scale shape: the tombstone anti-join must broadcast (the removed
    log is rounds-since-compaction x Σ budgets, tiny) — no Exchange on
    the pending side at read time."""
    store.commit_round(_rows(spark, ["https://h1.x/a"], 1),
                       spark.createDataFrame([("https://h0.x/p0",)], ["url"]))
    plan = store.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan


def test_discovered_covers_tombstoned(spark, store):
    """The discovered view must retain scheduled (tombstoned) urls —
    it IS the url-seen membership set."""
    store.commit_round(_rows(spark, ["https://h1.x/a"], 1),
                       spark.createDataFrame([("https://h0.x/p0",)], ["url"]))
    store.compact()
    disc = sorted(r.url for r in store.discovered().collect())
    assert "https://h0.x/p0" in disc  # tombstoned but discovered
    assert "https://h1.x/a" in disc
    # and the pending view dropped it
    assert "https://h0.x/p0" not in _urls(store)


def test_discovered_bucket_pruning_is_static(spark, store):
    """discovered(buckets) must prune at the FILE level: the base scan
    lists only the requested bucket partitions (PartitionFilters in the
    scan node + inputFiles restricted to those directories)."""
    store.compact()  # fold seeds into the bucketed layout
    all_buckets = sorted(
        r.bucket for r in store.base.read().select("bucket").distinct().collect())
    assert len(all_buckets) > 1
    want = [all_buckets[0]]
    pruned = store.discovered(want)
    from pyspark.sql import functions as SF2
    files = [r.f for r in
             pruned.select(SF2.input_file_name().alias("f")).distinct().collect()]
    assert files, "pruned scan read no files"
    for f in files:
        assert f"bucket={want[0]}/" in f, f
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # and pruning loses no rows within the requested buckets
    from pyspark.sql import functions as SF
    full_in_bucket = {
        r.url for r in store.base.read()
        .filter(SF.col("bucket").isin(want)).select("url").collect()}
    got = {r.url for r in pruned.collect()}
    assert full_in_bucket <= got
