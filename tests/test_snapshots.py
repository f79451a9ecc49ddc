"""ops 02/04/41: snapshot table commit protocol — versioning, O(delta)
append, time travel, rollback, prune, atomic manifest."""

import json

import pytest
from pyspark.sql import Row

from data_crawler_spark.plans.snapshots import Checkpoint, SnapshotTable

SCHEMA = "k long, v string"


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def test_versioning_and_time_travel(spark, tmp_state):
    t = SnapshotTable(spark, tmp_state, "t", _df(spark, []).schema)
    assert t.current_version() == 0
    assert t.read().count() == 0

    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert t.current_version() == 3
    assert {r.k for r in t.read(1).collect()} == {1}
    assert {r.k for r in t.read(2).collect()} == {1, 2}
    assert {r.k for r in t.read().collect()} == {9}


def test_append_is_incremental(spark, tmp_state):
    """Append must commit one new data dir, not rewrite the table."""
    t = SnapshotTable(spark, tmp_state, "t", _df(spark, []).schema)
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="append")
    m = json.loads((t.dir / "manifest.json").read_text())
    assert m["versions"]["2"][0] == m["versions"]["1"][0]  # dir reuse
    assert len(m["versions"]["2"]) == 2


def test_rollback(spark, tmp_state):
    t = SnapshotTable(spark, tmp_state, "t", _df(spark, []).schema)
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.rollback(1)
    assert t.current_version() == 1
    assert {r.k for r in t.read().collect()} == {1}
    # a new write after rollback proceeds normally
    t.write(_df(spark, [(3, "c")]), mode="append")
    assert {r.k for r in t.read().collect()} == {1, 3}


def test_uncommitted_write_invisible(spark, tmp_state):
    """A data dir without a manifest commit is not part of any version
    (crash-before-rename leaves the old snapshot current)."""
    t = SnapshotTable(spark, tmp_state, "t", _df(spark, []).schema)
    t.write(_df(spark, [(1, "a")]))
    _df(spark, [(99, "crash")]).write.mode("overwrite").parquet(str(t.dir / "d000099"))
    assert {r.k for r in t.read().collect()} == {1}


def test_prune(spark, tmp_state):
    t = SnapshotTable(spark, tmp_state, "t", _df(spark, []).schema)
    for i in range(5):
        t.write(_df(spark, [(i, "x")]), mode="overwrite")
    t.prune(keep_last=2)
    assert {r.k for r in t.read().collect()} == {4}
    assert {r.k for r in t.read(4).collect()} == {3}
    live_dirs = [d.name for d in t.dir.iterdir() if d.is_dir()]
    assert len(live_dirs) == 2


def test_checkpoint_roundtrip(tmp_state):
    cp = Checkpoint(tmp_state)
    assert cp.load() is None
    cp.commit({"round": 3, "frontier_v": 4})
    assert cp.load() == {"round": 3, "frontier_v": 4}


def test_read_missing_version_raises(spark, tmp_path):
    """Explicit time travel to a pruned or never-committed version is
    an error (like rollback), not a silent empty frame; version 0 stays
    the legitimate empty initial state."""
    from data_crawler_spark.plans.snapshots import SnapshotTable

    t = SnapshotTable(spark, tmp_path, "t", "a long")
    df = spark.createDataFrame([(1,)], "a long")
    t.write(df); t.write(df, mode="append"); t.write(df, mode="append")
    assert t.read(0).count() == 0
    assert t.read(2).count() == 2
    with pytest.raises(ValueError, match="no version 99"):
        t.read(99)
    t.prune(keep_last=1)
    with pytest.raises(ValueError, match="no version 1"):
        t.read(1)


def test_diff_snapshots(spark):
    from data_crawler_spark.plans.snapshots import diff_snapshots
    old = spark.createDataFrame(
        [("a", b"1", 10), ("b", b"2", 20), ("c", b"3", 30)],
        "url string, html binary, size int")
    new = spark.createDataFrame(
        [("a", b"1", 10), ("b", b"2x", 20), ("d", b"4", 40)],
        "url string, html binary, size int")
    got = {r["url"]: r["change"]
           for r in diff_snapshots(old, new, "url").collect()}
    assert got == {"b": "changed", "c": "removed", "d": "added"}


def test_diff_snapshots_subset_cols(spark):
    from data_crawler_spark.plans.snapshots import diff_snapshots
    old = spark.createDataFrame([("a", b"1", 1)],
                                "url string, html binary, v int")
    new = spark.createDataFrame([("a", b"1", 2)],
                                "url string, html binary, v int")
    # compare only html: the v flip is invisible -> empty diff
    assert diff_snapshots(old, new, "url", ["html"]).count() == 0
    assert {r["change"] for r in
            diff_snapshots(old, new, "url", ["v"]).collect()} == {"changed"}


def test_diff_snapshots_fingerprints_before_join(spark):
    """html must not cross the diff shuffle: both exchange inputs
    project to (key, int64 fingerprint)."""
    from data_crawler_spark.plans.snapshots import diff_snapshots
    old = spark.createDataFrame([("a", b"1")], "url string, html binary")
    new = spark.createDataFrame([("a", b"2")], "url string, html binary")
    plan = (diff_snapshots(old, new, "url")._jdf.queryExecution()
            .executedPlan().toString())
    import re
    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "html" not in m.group(0)
