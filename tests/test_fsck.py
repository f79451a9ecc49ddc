"""State-dir fsck (plans/fsck.py): every legal post-crash shape passes
with zero errors; every damaged shape is caught."""

import json
import shutil

from data_crawler_spark.plans.crawl import run_crawl
from data_crawler_spark.plans.fsck import fsck_state


def _crawl_state(spark, web1k, tmp_path, rounds=2):
    state = tmp_path / "state"
    run_crawl(spark, web1k, state, max_rounds=rounds)
    return state


def test_clean_state_is_ok(spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    rep = fsck_state(state)
    assert rep["ok"], rep["errors"]
    assert rep["errors"] == []
    # a clean shutdown leaves no table ahead of the checkpoint
    assert not any("ahead of checkpoint" in w for w in rep["warnings"])
    assert rep["tables"]["frontier"]["present"]
    assert rep["checkpoint"]["round"] == 2


def test_table_ahead_of_checkpoint_is_warning_then_resume_cleans(
        spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    ctx = run_crawl(spark, web1k, state, max_rounds=2)["ctx"]
    # simulate a crash after a table commit, before the round checkpoint
    junk = ctx.spark.createDataFrame(
        [(2, 1, "https://junk.example.com/x", 0, "junk.example.com",
          0, 1.0, 1)], ctx.scheduled.schema)
    ctx.scheduled.write(junk, mode="append")
    rep = fsck_state(state)
    assert rep["ok"], rep["errors"]  # legal post-crash shape
    assert any("scheduled" in w and "ahead of checkpoint" in w
               for w in rep["warnings"])
    # resume rolls the round back; fsck is clean again
    run_crawl(spark, web1k, state, max_rounds=3)
    rep2 = fsck_state(state)
    assert rep2["ok"] and not any("ahead of checkpoint" in w
                                  for w in rep2["warnings"])


def test_missing_referenced_dir_is_error(spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    m = json.loads((state / "scheduled" / "manifest.json").read_text())
    victim = m["versions"][str(m["current"])][0]
    victim = victim if isinstance(victim, str) else victim["dir"]
    shutil.rmtree(state / "scheduled" / victim)
    rep = fsck_state(state)
    assert not rep["ok"]
    assert any("missing dir" in e and "scheduled" in e
               for e in rep["errors"])


def test_orphan_dir_and_stale_tmp_are_warnings(spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    (state / "extracted" / "d999999").mkdir()
    (state / "extracted" / "manifest.json.tmp").write_text("{}")
    rep = fsck_state(state)
    assert rep["ok"], rep["errors"]
    assert any("unreferenced dir d999999" in w for w in rep["warnings"])
    assert any("stale temp" in w for w in rep["warnings"])


def test_corrupt_manifest_and_table_behind_checkpoint_are_errors(
        spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    (state / "lineage" / "manifest.json").write_text("{not json")
    rep = fsck_state(state)
    assert not rep["ok"]
    assert any("lineage" in e and "unreadable" in e for e in rep["errors"])

    # table rolled back below the checkpoint (no crash produces this)
    state2 = tmp_path / "behind"
    shutil.copytree(_crawl_state(spark, web1k, tmp_path / "b2"), state2)
    m = json.loads((state2 / "scheduled" / "manifest.json").read_text())
    m["current"] = 1
    m["versions"] = {"1": m["versions"]["1"]}
    (state2 / "scheduled" / "manifest.json").write_text(json.dumps(m))
    rep2 = fsck_state(state2)
    assert not rep2["ok"]
    assert any("BEHIND checkpoint" in e for e in rep2["errors"])


def test_missing_buckets_marker_is_error(spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    (state / "frontier" / "_BUCKETS").unlink()
    rep = fsck_state(state)
    assert not rep["ok"]
    assert any("_BUCKETS" in e for e in rep["errors"])


def test_nonexistent_state_dir(tmp_path):
    rep = fsck_state(tmp_path / "nope")
    assert not rep["ok"] and rep["errors"]


def test_repair_reclaims_orphans_and_tmp_only(spark, web1k, tmp_path):
    from data_crawler_spark.plans.fsck import repair_state

    state = _crawl_state(spark, web1k, tmp_path)
    (state / "extracted" / "d999999").mkdir()
    (state / "extracted" / "d999999" / "junk.parquet").write_text("x")
    (state / "frontier" / "manifest.json.tmp").write_text("{}")
    before = {str(p) for p in state.rglob("*")}

    res = repair_state(state, min_age_s=0.0)
    assert any("d999999" in r for r in res["repaired"])
    assert any("manifest.json.tmp" in r for r in res["repaired"])
    assert res["report"]["ok"]
    assert not any("unreferenced" in w or "stale temp" in w
                   for w in res["report"]["warnings"])
    # nothing else was touched
    after = {str(p) for p in state.rglob("*")}
    gone = before - after
    assert all("d999999" in g or g.endswith(".tmp") for g in gone)
    # the repaired state still resumes exactly
    run_crawl(spark, web1k, state, max_rounds=3)

    # young garbage is skipped under the default in-flight guard
    (state / "extracted" / "d888888").mkdir()
    res2 = repair_state(state)  # min_age_s=3600
    assert any("d888888" in s for s in res2["skipped_young"])
    assert (state / "extracted" / "d888888").is_dir()

    # refuses to touch a damaged state
    (state / "lineage" / "manifest.json").write_text("{not json")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="refusing"):
        repair_state(state, min_age_s=0.0)


def test_repair_dry_run_previews_without_deleting(spark, web1k, tmp_path,
                                                  capsys):
    """--repair --dry-run lists exactly what a real repair would
    reclaim (paths + bytes) and deletes NOTHING."""
    import importlib.util
    import json as _json
    from pathlib import Path as _P

    from data_crawler_spark.plans.fsck import repair_state

    state = _crawl_state(spark, web1k, tmp_path)
    (state / "extracted" / "d999999").mkdir()
    (state / "extracted" / "d999999" / "junk.parquet").write_text("xyz")
    (state / "frontier" / "manifest.json.tmp").write_text("{}")
    before = {str(p) for p in state.rglob("*")}

    res = repair_state(state, min_age_s=0.0, dry_run=True)
    assert res["dry_run"] is True
    paths = [w["path"] for w in res["would_repair"]]
    assert any("d999999" in p for p in paths)
    assert any("manifest.json.tmp" in p for p in paths)
    assert res["reclaimable_bytes"] >= 3  # junk.parquet's 3 bytes
    assert all(w["bytes"] >= 0 for w in res["would_repair"])
    # nothing deleted
    assert {str(p) for p in state.rglob("*")} == before

    # the preview matches what the real repair then reclaims
    real = repair_state(state, min_age_s=0.0)
    assert sorted(real["repaired"]) == sorted(paths)

    # CLI: --dry-run without --repair is a usage error; with it, JSON
    spec = importlib.util.spec_from_file_location(
        "fsck_cli", _P("tools/fsck_state.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    (state / "extracted" / "d777777").mkdir()
    (state / "extracted" / "d777777" / "j.parquet").write_text("q")
    rc = cli.main(["fsck_state.py", str(state), "--repair", "--dry-run",
                   "--min-age-s", "0"])
    out = _json.loads(capsys.readouterr().out)
    assert rc == 0 and out["dry_run"] is True
    assert any("d777777" in w["path"] for w in out["would_repair"])
    assert (state / "extracted" / "d777777").is_dir()  # still there
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        cli.main(["fsck_state.py", str(state), "--dry-run"])


def test_fsck_index_search_and_ann(spark, tmp_path):
    import json as _json

    from data_crawler_spark.operators.search import SearchIndex
    from data_crawler_spark.plans.fsck import fsck_index

    corpus = spark.createDataFrame(
        [(1, "spark shuffle partitions and catalyst optimizer"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "spark catalyst plans broadcast joins")],
        "doc_id long, text string")
    idx = SearchIndex.build(spark, tmp_path, corpus)
    rep = fsck_index(tmp_path, "bm25")
    assert rep["ok"], rep["errors"]
    assert rep["warnings"] == []

    # crash between commits: postings ahead of the pin -> warning only
    extra = spark.createDataFrame(
        [("spark", 7, 5, 5)],
        "term string, doc_id long, tf bigint, doc_len bigint")
    idx._postings.write(extra, mode="append")
    rep2 = fsck_index(tmp_path, "bm25")
    assert rep2["ok"], rep2["errors"]
    assert any("ahead of pin" in w for w in rep2["warnings"])

    # pin pointing at a version the data manifest no longer has -> error
    mpath = tmp_path / "bm25_postings" / "manifest.json"
    m = _json.loads(mpath.read_text())
    m["versions"].pop("1")  # the build's version — the stats pin target
    mpath.write_text(_json.dumps(m))
    rep3 = fsck_index(tmp_path, "bm25")
    assert not rep3["ok"]
    assert any("missing from the data manifest" in e
               for e in rep3["errors"])

    # unknown name
    rep4 = fsck_index(tmp_path, "nope")
    assert not rep4["ok"]


def test_fsck_index_ann(spark, tmp_path):
    import numpy as np

    from data_crawler_spark.operators.similarity import AnnIndex
    from data_crawler_spark.plans.fsck import fsck_index

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(32).astype(float).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    AnnIndex.build(emb, str(tmp_path), id_col="vec_id",
                   n_lists=4, n_subspaces=4, n_centroids=16)
    rep = fsck_index(tmp_path, "ann")
    assert rep["ok"], rep["errors"]


def test_legacy_checkpoint_shapes_tolerated(spark, web1k, tmp_path):
    """Resume tolerates a pre-FrontierStore int frontier_v and missing
    *_v keys (crawl.py uses cp.get(key, 0)); fsck must report those as
    warnings, never crash or error."""
    state = _crawl_state(spark, web1k, tmp_path)
    cp = json.loads((state / "checkpoint.json").read_text())
    cp["frontier_v"] = cp["frontier_v"]["base"]  # legacy int shape
    del cp["scheduled_v"]
    (state / "checkpoint.json").write_text(json.dumps(cp))
    rep = fsck_state(state)
    assert rep["ok"], rep["errors"]
    assert any("legacy int frontier_v" in w for w in rep["warnings"])
    assert any("lacks version for scheduled" in w for w in rep["warnings"])


def test_malformed_bucket_dir_is_error_not_crash(spark, web1k, tmp_path):
    state = _crawl_state(spark, web1k, tmp_path)
    base_dir = next(d for d in sorted((state / "frontier").iterdir())
                    if d.is_dir() and d.name.startswith("d"))
    bad = base_dir / "bucket=__HIVE_DEFAULT_PARTITION__"
    bad.mkdir()
    rep = fsck_state(state)  # must not raise
    assert not rep["ok"]
    assert any("non-integer bucket value" in e for e in rep["errors"])


def test_unpinned_search_meta_is_error(spark, tmp_path):
    """SearchIndex.__init__ reads meta['postings_version'] with no
    fallback — an unpinned stats row is unopenable, so fsck_index must
    call it an error (only AnnIndex has the legacy .get fallback)."""
    import json as _json

    from data_crawler_spark.operators.search import SearchIndex
    from data_crawler_spark.plans.fsck import fsck_index
    from data_crawler_spark.plans.snapshots import SnapshotTable
    from pyspark.sql.types import _parse_datatype_string

    corpus = spark.createDataFrame(
        [(1, "spark catalyst optimizer"), (2, "arrow batches")],
        "doc_id long, text string")
    SearchIndex.build(spark, tmp_path, corpus)
    stats = SnapshotTable(spark, tmp_path, "bm25_stats",
                          _parse_datatype_string("kind string, s string"))
    meta = _json.loads(stats.read().filter("kind = 'meta'").first()["s"])
    del meta["postings_version"]
    stats.write(spark.createDataFrame([("meta", _json.dumps(meta))],
                                      "kind string, s string"),
                mode="overwrite")
    rep = fsck_index(tmp_path, "bm25")
    assert not rep["ok"]
    assert any("fail to open" in e for e in rep["errors"])


def test_cli_repair_on_damaged_state_prints_json(spark, web1k, tmp_path,
                                                 capsys):
    import importlib.util
    import json as _json
    from pathlib import Path as _P

    spec = importlib.util.spec_from_file_location(
        "fsck_cli", _P("tools/fsck_state.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    state = _crawl_state(spark, web1k, tmp_path)
    (state / "lineage" / "manifest.json").write_text("{not json")
    rc = cli.main(["fsck_state.py", str(state), "--repair",
                   "--min-age-s", "0"])
    out = capsys.readouterr().out
    rep = _json.loads(out)  # the promised JSON report, not a traceback
    assert rc == 1 and not rep["ok"]


def test_resume_refuses_damaged_state(spark, web1k, tmp_path):
    """run_crawl fscks the state before resuming: damage fails fast
    with the error list; verify_state=False is the escape hatch."""
    import pytest as _pytest

    state = _crawl_state(spark, web1k, tmp_path)
    m = json.loads((state / "scheduled" / "manifest.json").read_text())
    victim = m["versions"][str(m["current"])][0]
    victim = victim if isinstance(victim, str) else victim["dir"]
    shutil.rmtree(state / "scheduled" / victim)
    with _pytest.raises(RuntimeError, match="integrity check"):
        run_crawl(spark, web1k, state, max_rounds=3)
    # the escape hatch skips the check (and then fails later, deeper —
    # exactly the behavior the default protects against)
    try:
        run_crawl(spark, web1k, state, max_rounds=3, verify_state=False)
    except Exception as e:
        assert "integrity check" not in str(e)
