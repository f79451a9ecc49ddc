"""op 41: kill-and-resume — a crawl stopped after round k and resumed
produces exactly the same state as an uninterrupted run; uncommitted
partial rounds are rolled back (BASELINE.json:6,14 "resumable
mid-crawl")."""

from pyspark.sql import functions as F

from data_crawler_spark.plans.crawl import open_crawl, run_crawl, visit_order_df
from data_crawler_spark.plans.fsck import fsck_state, repair_state

ROUNDS = 5


def _state_signature(ctx):
    order = [(r.round, r.seq, r.url) for r in visit_order_df(ctx).collect()]
    seen = sorted(r.url for r in ctx.seen.read().select("url").collect())
    frontier = sorted(
        (r.url, r.depth, r.discovered_round) for r in ctx.frontier.read().collect())
    return order, seen, frontier


def test_kill_resume_equals_uninterrupted(spark, web1k, tmp_path):
    full = run_crawl(spark, web1k, tmp_path / "full", max_rounds=ROUNDS)

    part = run_crawl(spark, web1k, tmp_path / "split", max_rounds=2)
    assert part["ctx"].checkpoint.load()["round"] == 2
    # "new driver": fresh context over the same state dir
    resumed = run_crawl(spark, web1k, tmp_path / "split", max_rounds=ROUNDS)

    assert _state_signature(resumed["ctx"]) == _state_signature(full["ctx"])


def test_crash_mid_round_rolls_back(spark, web1k, tmp_path):
    state = tmp_path / "crash"
    r1 = run_crawl(spark, web1k, state, max_rounds=2)
    ctx = r1["ctx"]
    cp_before = ctx.checkpoint.load()

    # simulate a crash AFTER some table commits of round 2 but BEFORE
    # the round checkpoint: append junk to scheduled + extracted (the
    # seen set is a VIEW over scheduled, so poisoning scheduled poisons
    # both — the rollback must scrub it from both surfaces)
    junk = ctx.spark.createDataFrame(
        [(2, 1, "https://junk.example.com/x", 0, "junk.example.com", 0, 1.0, 1)],
        ctx.scheduled.schema)
    ctx.scheduled.write(junk, mode="append")
    ctx.extracted.write(
        ctx.spark.createDataFrame(
            [("https://junk.example.com/x", None, "junk", "en", 4, 2)],
            ctx.extracted.schema), mode="append")
    assert ctx.scheduled.current_version() != cp_before["scheduled_v"]

    resumed = run_crawl(spark, web1k, state, max_rounds=ROUNDS)
    rctx = resumed["ctx"]
    urls = {r.url for r in rctx.seen.read().select("url").collect()}
    assert "https://junk.example.com/x" not in urls
    ex_urls = {r.url for r in rctx.extracted.read().select("url").collect()}
    assert "https://junk.example.com/x" not in ex_urls

    full = run_crawl(spark, web1k, tmp_path / "full2", max_rounds=ROUNDS)
    assert _state_signature(rctx) == _state_signature(full["ctx"])


def test_lineage_versions_tracked(spark, web1k, tmp_path):
    res = run_crawl(spark, web1k, tmp_path / "lin", max_rounds=2)
    ctx = res["ctx"]
    lin = ctx.lineage.read()
    assert lin.filter(F.col("metric") == "scheduled").count() > 0
    assert ctx.checkpoint.load()["lineage_v"] == ctx.lineage.current_version()


def test_gc_prunes_but_preserves_resume(spark, web1k, tmp_path):
    """With gc_keep, old snapshot dirs are dropped but the crawl still
    resumes and matches the unpruned run."""
    a = run_crawl(spark, web1k, tmp_path / "gc", max_rounds=2, gc_keep=3)
    a2 = run_crawl(spark, web1k, tmp_path / "gc", max_rounds=4, gc_keep=3)
    b = run_crawl(spark, web1k, tmp_path / "nogc", max_rounds=4)
    assert _state_signature(a2["ctx"]) == _state_signature(b["ctx"])
    manifest = a2["ctx"].seen._manifest()
    assert len(manifest["versions"]) <= 3


def test_crash_at_every_commit_point_resumes_exact(spark, web1k, tmp_path):
    """Systematic crash sweep (op 41 hardening): inject a crash AFTER
    the k-th manifest/checkpoint commit for EVERY k across bootstrap +
    the first two rounds, then resume with a fresh context and assert
    the final state is EXACTLY the uninterrupted run's — visit order,
    seen set, and frontier. Post-op injection at every index covers
    every inter-commit crash window at commit granularity (commit-file
    renames themselves are atomic). Compaction-window crashes have
    their own sweep in test_frontier."""
    import threading

    from data_crawler_spark.plans.snapshots import Checkpoint, SnapshotTable

    FINAL = 3
    full = run_crawl(spark, web1k, tmp_path / "full3", max_rounds=FINAL)
    want = _state_signature(full["ctx"])

    real_commit = SnapshotTable._commit
    real_cp = Checkpoint.commit
    lock = threading.Lock()
    counter = {"n": 0, "crash_at": None, "fired": False}

    def bump():
        with lock:
            counter["n"] += 1
            hit = counter["crash_at"] is not None \
                and counter["n"] == counter["crash_at"]
            if hit:
                counter["crash_at"] = None  # fire once; resume runs clean
                counter["fired"] = True
        if hit:
            raise RuntimeError(f"injected after commit op {counter['n']}")

    def commit(self, manifest):
        real_commit(self, manifest)
        bump()

    def cp_commit(self, payload):
        real_cp(self, payload)
        bump()

    SnapshotTable._commit = commit
    Checkpoint.commit = cp_commit
    try:
        # count the commit ops of an uninterrupted bootstrap + 2 rounds
        counter.update(n=0, crash_at=None, fired=False)
        run_crawl(spark, web1k, tmp_path / "count", max_rounds=2)
        total = counter["n"]
        assert total >= 8, f"sweep too small to be meaningful: {total}"

        for k in range(1, total + 1):
            state = tmp_path / f"crash{k}"
            counter.update(n=0, crash_at=k, fired=False)
            try:
                run_crawl(spark, web1k, state, max_rounds=2)
            except Exception:
                pass  # the injected crash (possibly wrapped)
            assert counter["fired"], f"crash point {k} never fired"
            # every legal post-crash shape must fsck with zero errors
            rep = fsck_state(state)
            assert rep["ok"], (k, rep["errors"])
            # ... and repairing it (reclaiming staged garbage, which
            # crash legs are exactly what produces) must never break
            # the subsequent resume
            repair_state(state, min_age_s=0.0)
            resumed = run_crawl(spark, web1k, state, max_rounds=FINAL)
            assert _state_signature(resumed["ctx"]) == want, f"k={k}"
    finally:
        SnapshotTable._commit = real_commit
        Checkpoint.commit = real_cp


def test_crash_sweep_through_compaction_round(spark, web1k, tmp_path):
    """Crash sweep over the commit window that CONTAINS the bloom fold
    and the bucket-level frontier compaction (compact_every=4: the
    fourth delta append triggers the fold inside round 3's commit
    group). Every leg restarts from one shared three-round state copy
    and sweeps ONLY round 3's commits (plain-round windows are covered
    by the sweep above); resume after each injected crash must
    reproduce the uninterrupted four-round run exactly."""
    import shutil
    import threading

    from data_crawler_spark.plans.snapshots import Checkpoint, SnapshotTable

    FINAL = 4
    full = run_crawl(spark, web1k, tmp_path / "full4", max_rounds=FINAL)
    want = _state_signature(full["ctx"])
    base_state = tmp_path / "base3"
    run_crawl(spark, web1k, base_state, max_rounds=3)

    real_commit = SnapshotTable._commit
    real_cp = Checkpoint.commit
    lock = threading.Lock()
    counter = {"n": 0, "crash_at": None, "fired": False}

    def bump():
        with lock:
            counter["n"] += 1
            hit = counter["crash_at"] is not None \
                and counter["n"] == counter["crash_at"]
            if hit:
                counter["crash_at"] = None
                counter["fired"] = True
        if hit:
            raise RuntimeError(f"injected after commit op {counter['n']}")

    def commit(self, manifest):
        real_commit(self, manifest)
        bump()

    def cp_commit(self, payload):
        real_cp(self, payload)
        bump()

    SnapshotTable._commit = commit
    Checkpoint.commit = cp_commit
    try:
        # count the ops of an uninterrupted round 3 (from the copy) and
        # prove the window really contains the compaction: the delta
        # log must come out truncated
        count_dir = tmp_path / "count4"
        shutil.copytree(base_state, count_dir)
        counter.update(n=0, crash_at=None, fired=False)
        res = run_crawl(spark, web1k, count_dir, max_rounds=FINAL)
        assert res["ctx"].frontier.delta.n_segments() == 0, \
            "sweep window missed the compaction"
        total = counter["n"]
        assert total >= 6, f"sweep too small to be meaningful: {total}"

        for k in range(1, total + 1):
            state = tmp_path / f"ccrash{k}"
            shutil.copytree(base_state, state)
            counter.update(n=0, crash_at=k, fired=False)
            try:
                run_crawl(spark, web1k, state, max_rounds=FINAL)
            except Exception:
                pass
            assert counter["fired"], f"crash point {k} never fired"
            rep = fsck_state(state)
            assert rep["ok"], (k, rep["errors"])
            resumed = run_crawl(spark, web1k, state, max_rounds=FINAL)
            assert _state_signature(resumed["ctx"]) == want, f"k={k}"
    finally:
        SnapshotTable._commit = real_commit
        Checkpoint.commit = real_cp
