"""Per-round typed race-event mining inside the crawl loop
(extract_events=True): each round commits an `events` snapshot of
race_event_records over the round's fetched pages — the reference
crawler's end product (/root/reference/README.md:2) as a first-class
crawl output table, checkpointed and resumable like every other state
table."""

from __future__ import annotations

import json
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_crawler_spark.plans.crawl import run_crawl
from oracle import events as oracle_events


def _eventize(web_dir, out_dir):
    """Copy a fixture web, appending a deterministic JSON-LD event
    block + results table to every page's html (keyed on the page's
    position so the oracle can recompute expectations)."""
    shutil.copytree(web_dir, out_dir)
    t = pq.read_table(out_dir / "pages.parquet")
    htmls = t.column("html").to_pylist()
    out = []
    for i, h in enumerate(htmls):
        ev = {"@type": "SportsEvent", "name": f"Race {i}",
              "startDate": f"2026-{(i % 12) + 1:02d}-01",
              "location": {"name": f"City {i % 5}"},
              "distance": f"{(i % 40)}.{i % 10} km"}
        extra = ('<script type="application/ld+json">' + json.dumps(ev)
                 + "</script>")
        if i % 3 == 0:
            extra += ('<table class="results">'
                      "<tr><th>Place</th><th>Name</th><th>Time</th></tr>"
                      f"<tr><td>1</td><td>Winner {i}</td>"
                      f"<td>2:{i % 60:02d}:30</td></tr>"
                      f"<tr><td>2</td><td>Second {i}</td>"
                      f"<td>2:{i % 60:02d}:59</td></tr></table>")
        out.append(h + extra.encode())
    cols = {name: t.column(name) for name in t.column_names}
    cols["html"] = pa.array(out, pa.binary())
    (out_dir / "pages.parquet").unlink()
    pq.write_table(pa.table(cols), out_dir / "pages.parquet")


@pytest.fixture(scope="module")
def event_web(web1k, tmp_path_factory):
    out = tmp_path_factory.mktemp("event_web") / "web"
    _eventize(web1k, out)
    return out


def test_crawl_commits_typed_events_per_round(spark, event_web,
                                              tmp_path):
    res = run_crawl(spark, event_web, tmp_path / "s", max_rounds=3,
                    extract_events=True)
    ctx = res["ctx"]
    got = {(r["url"], r["round"]): r.asDict()
           for r in ctx.events.read().collect()}
    # every scheduled url with a page got exactly one event record in
    # its round, matching the pure-Python oracle over that page's html
    pages = pq.read_table(event_web / "pages.parquet")
    html_by_url = dict(zip(pages.column("url").to_pylist(),
                           pages.column("html").to_pylist()))
    sched = ctx.scheduled.read().select("url", "round").collect()
    expected = {}
    for r in sched:
        h = html_by_url.get(r["url"])
        if h is None:
            continue
        rec = oracle_events.race_event_records(r["url"], h)
        if rec is not None:
            rec["round"] = r["round"]
            expected[(r["url"], r["round"])] = rec
    assert set(got) == set(expected)
    for k, exp in expected.items():
        g = got[k]
        for f in ("event_name", "start_date", "location_name",
                  "distance_km", "n_finishers", "winner",
                  "winner_time_s"):
            assert g[f] == exp[f], (k, f, g[f], exp[f])
    # pages with a results table carry the parsed aggregate
    assert any(v["n_finishers"] == 2 for v in got.values())
    assert any(v["n_finishers"] is None for v in got.values())

    # resume continues the events table exactly (no replays, no holes)
    res2 = run_crawl(spark, event_web, tmp_path / "s", max_rounds=5,
                     extract_events=True)
    ev2 = res2["ctx"].events.read().select("url", "round").collect()
    assert len(ev2) == len({(r["url"], r["round"]) for r in ev2})
    assert {r["round"] for r in ev2} == {0, 1, 2, 3, 4}

    # the state (with the optional table) passes fsck
    from data_crawler_spark.plans.fsck import fsck_state
    rep = fsck_state(tmp_path / "s")
    assert rep["ok"], rep["errors"]


def test_events_off_keeps_table_empty_and_fsck_quiet(spark, web1k,
                                                     tmp_path):
    run_crawl(spark, web1k, tmp_path / "s", max_rounds=2)
    from data_crawler_spark.plans.fsck import fsck_state
    rep = fsck_state(tmp_path / "s")
    assert rep["ok"], rep["errors"]
    # optional table absent or empty -> no "lacks version" noise
    assert not any("events" in w for w in rep["warnings"])