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


def _rm(spark, urls):
    # tombstones carry the SAME url_hash convention as _rows
    return spark.createDataFrame([(u, hash(u) % 1000) for u in urls],
                                 ["url", "url_hash"])


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
                       _rm(spark, ["https://h0.x/p0", "https://h0.x/p1"]))
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
                           _rm(spark, gone))
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
                       _rm(spark, ["https://h0.x/p0"]))
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
                       _rm(spark, ["https://h0.x/p0"]))
    store.commit_round(_rows(spark, ["https://h1.x/b"], 2),
                       _rm(spark, ["https://h1.x/a"]))
    store.compact()
    df = store.read()
    assert df.count() == df.select("url").distinct().count() == 4
    assert "https://h1.x/a" not in _urls(store)


def test_read_is_single_broadcast_antijoin(spark, store):
    """Scale shape: the tombstone anti-join must broadcast (the removed
    log is rounds-since-compaction x Σ budgets, tiny) — no Exchange on
    the pending side at read time."""
    store.commit_round(_rows(spark, ["https://h1.x/a"], 1),
                       _rm(spark, ["https://h0.x/p0"]))
    plan = store.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan


def test_discovered_covers_tombstoned(spark, store):
    """The discovered view must retain scheduled (tombstoned) urls —
    it IS the url-seen membership set."""
    store.commit_round(_rows(spark, ["https://h1.x/a"], 1),
                       _rm(spark, ["https://h0.x/p0"]))
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


def test_buckets_marker_never_lags_base_commit(spark, tmp_path, monkeypatch):
    """The _BUCKETS marker must land BEFORE the first base commit: a
    crash in between then leaves (marker, base v0) — reopenable — not a
    committed bucketed base that __init__ refuses as pre-bucketed."""
    from data_crawler_spark.plans.snapshots import SnapshotTable

    s = FrontierStore(spark, tmp_path, schemas.FRONTIER)
    real_write = SnapshotTable.write
    seen = {}

    def checked_write(self, *a, **kw):
        if self.name == "frontier":
            seen["marker_at_write"] = s._marker.exists()
        return real_write(self, *a, **kw)

    monkeypatch.setattr(SnapshotTable, "write", checked_write)
    s.bootstrap(_rows(spark, ["https://h0.x/p0"], 0))
    assert seen["marker_at_write"] is True

    # the crash-after-marker state (marker present, base still v0)
    # reopens cleanly with the persisted bucket count
    t2 = tmp_path / "crashed"
    t2.mkdir()
    (t2 / "frontier").mkdir()
    (t2 / "frontier" / "_BUCKETS").write_text("32")
    s2 = FrontierStore(spark, t2, schemas.FRONTIER)
    assert s2.n_buckets == 32


def test_incremental_compaction_rewrites_only_dirty_buckets(spark, tmp_path):
    """Bucket-level compaction: the new base version's data dir holds
    ONLY the buckets present in delta ∪ removed; clean buckets carry
    over by manifest reference from the old dir (no rewrite)."""
    s = FrontierStore(spark, tmp_path, schemas.FRONTIER, compact_every=2)
    seeds = [f"https://h0.x/p{i}" for i in range(40)]
    s.bootstrap(_rows(spark, seeds, 0))
    old_entries = s.base._manifest()["versions"]["1"]
    assert old_entries == ["d000001"]

    new = ["https://h1.x/a", "https://h1.x/b"]
    gone = [seeds[0]]
    s.commit_round(_rows(spark, new, 1), _rm(spark, gone), compact=False)
    dirty = sorted({hash(u) % 1000 % s.n_buckets for u in new + gone})
    expect = sorted(set(seeds) - set(gone)) + sorted(new)
    s.compact()

    m = s.base._manifest()
    entries = m["versions"][str(m["current"])]
    # old dir referenced WITHOUT the dirty buckets; new dir = dirty only
    by_dir = {e["dir"]: sorted(e["parts"]) for e in entries}
    assert "d000001" in by_dir and len(by_dir) == 2
    new_dir = next(d for d in by_dir if d != "d000001")
    assert set(by_dir[new_dir]) == {f"bucket={b}" for b in dirty}
    assert not set(by_dir[new_dir]) & set(by_dir["d000001"])
    # the new dir's bytes on disk cover only dirty buckets
    from pathlib import Path
    written = sorted(p.name for p in (s.base.dir / new_dir).iterdir()
                     if p.is_dir())
    assert set(written) == {f"bucket={b}" for b in dirty}
    # view correctness: pending set identical to the naive fold
    assert _urls(s) == sorted(expect)
    assert s.delta.n_segments() == 0 and s.removed.n_segments() == 0
    # clean buckets are still served from the ORIGINAL files
    from pyspark.sql import functions as SF
    files = [r.f for r in s.base.read()
             .filter(~SF.col("bucket").isin(dirty))
             .select(SF.input_file_name().alias("f")).distinct().collect()]
    assert files and all("/d000001/" in f for f in files)


def test_incremental_compaction_entry_cap_folds_to_one_dir(spark, tmp_path):
    """After max_base_entries incremental compactions the next fold
    rewrites the whole base into a single dir (bounded read fan-in)."""
    s = FrontierStore(spark, tmp_path, schemas.FRONTIER, compact_every=1,
                      max_base_entries=3)
    s.bootstrap(_rows(spark, [f"https://h0.x/p{i}" for i in range(30)], 0))
    expect = {f"https://h0.x/p{i}" for i in range(30)}
    for rnd in range(1, 6):
        new = [f"https://h{rnd}.x/n{j}" for j in range(2)]
        gone = [sorted(expect)[0]]
        s.commit_round(_rows(spark, new, rnd), _rm(spark, gone))
        expect = (expect - set(gone)) | set(new)
        m = s.base._manifest()
        n_entries = len(m["versions"][str(m["current"])])
        assert n_entries <= 3
        assert _urls(s) == sorted(expect)
    # at least one fold hit the cap and produced a single-dir version
    # (entry count dropped back to 1 at some point above); final state
    # must still be exact, bucket pruning still static
    some_bucket = s.base.read().select("bucket").first()["bucket"]
    from pyspark.sql import functions as SF
    files = [r.f for r in s.discovered([some_bucket])
             .select(SF.input_file_name().alias("f")).distinct().collect()]
    assert files and all(f"bucket={some_bucket}/" in f for f in files)


def test_mid_incremental_compaction_crash_rolls_back(spark, tmp_path):
    """A crash between the incremental base commit and the log
    truncations must be fully undone by rollback to the checkpointed
    versions (the crawl's resume path)."""
    s = FrontierStore(spark, tmp_path, schemas.FRONTIER, compact_every=1)
    s.bootstrap(_rows(spark, [f"https://h0.x/p{i}" for i in range(20)], 0))
    s.commit_round(_rows(spark, ["https://h1.x/a"], 1),
                   _rm(spark, ["https://h0.x/p0"]), compact=False)
    v = s.versions()
    before = _urls(s)

    # crash INSIDE compact(): base committed, truncations never ran
    real_truncate = type(s.delta).truncate

    def boom(self):
        raise RuntimeError("crash before truncate")

    type(s.delta).truncate = boom
    try:
        with pytest.raises(RuntimeError):
            s.compact()
    finally:
        type(s.delta).truncate = real_truncate
    s.rollback(v)
    assert _urls(s) == before
    # and a re-run compaction completes cleanly after rollback
    s.compact()
    assert _urls(s) == before


def test_compaction_survives_legacy_null_hash_tombstones(spark, tmp_path):
    """A removed-log segment written before url_hash joined
    REMOVED_SCHEMA reads back null — bucket location is unknowable, so
    compaction must fall back to the full rewrite (which folds on url)
    instead of crashing on int(None)."""
    s = FrontierStore(spark, tmp_path, schemas.FRONTIER, compact_every=1)
    s.bootstrap(_rows(spark, [f"https://h0.x/p{i}" for i in range(4)], 0))
    # legacy tombstone: url only, url_hash null
    legacy = spark.createDataFrame([("https://h0.x/p0", None)],
                                   "url string, url_hash long")
    s.removed.write(legacy, mode="append")
    assert s._dirty_buckets() == list(range(s.n_buckets))
    s.compact()  # must not raise
    assert _urls(s) == sorted([f"https://h0.x/p{i}" for i in range(1, 4)])
    assert s.removed.n_segments() == 0


def test_frontier_report(spark, store):
    from data_crawler_spark.plans.frontier import frontier_report
    store.commit_round(_rows(spark, ["https://h1.x/a", "https://h1.x/b",
                                     "https://h2.x/c"], 1),
                       _rm(spark, ["https://h0.x/p0", "https://h0.x/p1"]))
    rep = frontier_report(store, top_hosts=2)
    assert rep["pending"] == 5
    assert rep["discovered"] == 7
    assert rep["seen"] == 2
    assert rep["depth_histogram"] == {1: 5}
    assert [h["host"] for h in rep["top_hosts"]] == ["h0.x", "h1.x"]
    assert rep["top_hosts"][0]["pending"] == 2
    assert rep["priority"]["max"] == pytest.approx(0.5)
    assert rep["base_bytes"] > 0
    assert rep["delta_segments"] == 1
    assert set(rep["versions"]) >= {"base", "delta", "removed"}

    # empty store: no pending -> null-free report
    import data_crawler_spark.schemas as schemas_mod
    from data_crawler_spark.plans.frontier import FrontierStore
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        s2 = FrontierStore(spark, td, schemas_mod.FRONTIER)
        s2.bootstrap(_rows(spark, [], 0))
        rep2 = frontier_report(s2)
        assert rep2["pending"] == 0 and rep2["priority"] is None


def test_compaction_crash_at_every_commit_point(spark, tmp_path):
    """Systematic crash sweep over compact(): inject a crash AFTER the
    k-th manifest commit inside compact() for EVERY k, then recover by
    the crawl's contract (rollback to the checkpointed versions) and
    assert the pending view is exactly the pre-compaction view and a
    re-run compaction completes. Post-op injection at every index
    covers every inter-commit crash window at commit granularity (the
    _BUCKETS-marker ordering bug was exactly this class). Runs the
    sweep on BOTH compaction paths: incremental (few dirty buckets)
    and full rewrite (most buckets dirty)."""
    from data_crawler_spark.plans.snapshots import SnapshotTable

    real_commit = SnapshotTable._commit

    def build(root, wide):
        s = FrontierStore(spark, root, schemas.FRONTIER, compact_every=1)
        s.bootstrap(_rows(spark, [f"https://h0.x/p{i}" for i in range(20)], 0))
        if wide:  # touch most buckets -> full-rewrite path
            new = [f"https://h{j}.x/w{j}" for j in range(1, 60)]
        else:
            new = ["https://h1.x/a"]
        s.commit_round(_rows(spark, new, 1),
                       _rm(spark, ["https://h0.x/p0"]), compact=False)
        return s

    for wide in (False, True):
        # count the commit ops of an uninterrupted compact()
        counter = {"n": 0, "crash_at": None}

        def commit(self, manifest):
            real_commit(self, manifest)
            counter["n"] += 1
            if counter["crash_at"] is not None \
                    and counter["n"] == counter["crash_at"]:
                counter["crash_at"] = None  # fire once
                raise RuntimeError(f"injected after commit {counter['n']}")

        SnapshotTable._commit = commit
        try:
            probe = build(tmp_path / f"probe{wide}", wide)
            want = _urls(probe)
            counter.update(n=0, crash_at=None)  # count compact() only
            probe.compact()
            assert _urls(probe) == want
            total = counter["n"]
            assert total >= 2  # the sweep must cover >1 window

            for k in range(1, total + 1):
                root = tmp_path / f"crash_{wide}_{k}"
                counter.update(n=0, crash_at=None)
                s = build(root, wide)
                v = s.versions()
                before = _urls(s)
                counter.update(n=0, crash_at=k)
                with pytest.raises(RuntimeError, match="injected"):
                    s.compact()
                # the crawl's resume path: a fresh store over the same
                # dir, rolled back to the checkpointed versions
                s2 = FrontierStore(spark, root, schemas.FRONTIER,
                                   compact_every=1)
                s2.rollback(v)
                assert _urls(s2) == before, f"wide={wide} k={k}"
                s2.compact()
                assert _urls(s2) == before, f"wide={wide} k={k} post"
        finally:
            SnapshotTable._commit = real_commit


def test_layout_knobs_never_change_the_view(spark, tmp_path):
    """n_buckets and compact_every are LAYOUT knobs: any combination
    must serve byte-identical pending and discovered views for the
    same commit sequence (a 100x retune of either on a real cluster
    must never change crawl semantics)."""
    script = [
        (["https://h1.x/a", "https://h1.x/b", "https://h2.x/c"],
         ["https://h0.x/p0", "https://h0.x/p1"]),
        (["https://h3.x/d"], ["https://h1.x/a"]),
        ([], ["https://h1.x/b", "https://h2.x/c"]),
        (["https://h4.x/e", "https://h4.x/f"], ["https://h3.x/d"]),
    ]
    seeds = [f"https://h0.x/p{i}" for i in range(8)]

    def run(n_buckets, compact_every):
        root = tmp_path / f"nb{n_buckets}_ce{compact_every}"
        s = FrontierStore(spark, root, schemas.FRONTIER,
                          compact_every=compact_every, n_buckets=n_buckets)
        s.bootstrap(_rows(spark, seeds, 0))
        for rnd, (new, gone) in enumerate(script, start=1):
            s.commit_round(_rows(spark, new, rnd), _rm(spark, gone))
        pending = sorted(map(tuple, s.read().collect()))
        return pending, s

    base_pending, base_store = run(64, 3)
    for nb, ce in [(1, 1), (4, 1), (4, 3), (64, 1), (16, 2)]:
        pending, store = run(nb, ce)
        assert pending == base_pending, f"nb={nb} ce={ce}"
        # discovered-set membership identical too
        got = sorted(r.url for r in store.discovered().select("url").collect())
        want = sorted(
            r.url for r in base_store.discovered().select("url").collect())
        assert got == want, f"nb={nb} ce={ce}"
