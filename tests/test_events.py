"""Race-event structured extraction (operators/structured.py
race_events / results_table_rows / race_event_records) vs the pure
Python executable spec (oracle/events.py) — the reference crawler's
marathon/trail-race payload (/root/reference/README.md:2) re-expressed
as native Spark plans.

Value-level parity on a battery of synthesized pages (quote styles,
attribute order, wrappers, broken JSON, header permutations, DNF
times), plus the plan contract: the JSON-LD/table parsers are pure
map over the page scan (zero Exchange, zero Python), and the merged
record pipeline never puts html on a shuffle."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.structured import (
    race_event_records,
    race_events,
    results_table_rows,
)
from oracle import events as oracle_events


def _event_block(i: int) -> str:
    """Deterministic JSON-LD variants, one per page index."""
    ev = {"@type": ["SportsEvent", "Event", "ExerciseEvent"][i % 3],
          "name": f"Race {i}",
          "startDate": f"2026-{(i % 12) + 1:02d}-{(i % 27) + 1:02d}",
          "location": {"@type": "Place", "name": f"City {i % 7}"},
          "distance": [f"{i % 50}.{i % 10} km", f"{i % 20}K",
                       f"{i % 30} mi", f"{(i % 40) * 250} m",
                       str(i % 25), ""][i % 6]}
    if i % 5 == 0:
        del ev["location"]
    if i % 7 == 0:
        del ev["startDate"]
    if i % 4 == 0:  # array wrapper with a non-event leading record
        return json.dumps([{"@type": "Organization", "name": "Org"}, ev])
    if i % 4 == 1:  # @graph envelope
        return json.dumps({"@context": "https://schema.org",
                           "@graph": [ev]})
    return json.dumps(ev)


def _results_table(i: int) -> str:
    if i % 5 == 4:
        return ""  # no results table
    cols = [["Place", "Bib", "Name", "Time"],
            ["Time", "Place", "Name", "Bib"],
            ["Name", "Time", "Place"],       # no bib column
            ["place", "name", "time"]][i % 4]
    rows = []
    for p in range(1, (i % 6) + 2):
        t = (f"{p + i % 3}:{(i + p) % 60:02d}:{(p * 7) % 60:02d}"
             if p % 4 else "DNF")
        vals = {"Place": str(p), "Bib": str(100 + p),
                "Name": f"Runner {i}-{p}", "Time": t,
                "place": str(p), "name": f"Runner {i}-{p}", "time": t}
        rows.append("<tr>" + "".join(
            f"<td>{vals[c]}</td>" for c in cols) + "</tr>")
    hdr = "<tr>" + "".join(f"<th>{c}</th>" for c in cols) + "</tr>"
    klass = ["results", "finish results", "results striped"][i % 3]
    return f'<table class="{klass}">{hdr}{"".join(rows)}</table>'


def _page(i: int) -> tuple[str, bytes]:
    quote = "'" if i % 2 else '"'
    block = _event_block(i).replace("</", "<\\/") if i % 11 == 0 \
        else _event_block(i)
    parts = [f"<html><head><title>p{i}</title>"]
    if i % 9 == 0:  # a broken JSON block BEFORE the real one
        parts.append('<script type="application/ld+json">{nope'
                     "</script>")
    if i % 10 != 9:  # one page in ten has no JSON-LD at all
        parts.append(
            f"<script async type={quote}application/ld+json{quote}>\n"
            f"{block}\n</script>")
    parts.append("</head><body><p>prose</p>")
    parts.append(_results_table(i))
    # a decoy non-results table must never parse
    parts.append("<table class='layout'><tr><td>x</td></tr></table>")
    parts.append("</body></html>")
    return f"https://ev{i}.test/race{i}.html", "".join(parts).encode()


N = 60
PAGES = [_page(i) for i in range(N)]
# ragged/degenerate tables (ADVICE r5): a data row SHORTER than the
# header (colspan/malformed HTML — ANSI element_at aborted the job
# here), one longer than the header, and a header-only table; the
# oracle yields None cells / no rows for these, and Spark must match
# instead of crashing
PAGES += [
    ("https://ragged.test/r1.html",
     b'<html><body><table class="results">'
     b"<tr><th>Place</th><th>Bib</th><th>Name</th><th>Time</th></tr>"
     b"<tr><td>1</td><td>101</td><td>A Runner</td><td>1:02:03</td></tr>"
     b"<tr><td>2</td></tr>"  # ragged: 1 cell vs 4-col header
     b"<tr><td>3</td><td>103</td><td>C Runner</td><td>2:03:04</td>"
     b"<td>extra</td></tr>"  # longer than the header
     b"</table></body></html>"),
    ("https://ragged.test/hdr-only.html",
     b'<html><body><table class="results">'
     b"<tr><th>Place</th><th>Name</th><th>Time</th></tr>"
     b"</table></body></html>"),
    # dict-valued @graph is NOT an envelope (ADVICE r5): the oracle
    # keeps the outer dict (typeless -> dropped); Spark must not
    # coerce the lone inner object into a 1-element record array
    ("https://graphdict.test/e.html",
     b'<html><head><script type="application/ld+json">'
     b'{"@graph": {"@type": "SportsEvent", "name": "Lone", '
     b'"distance": "10K"}}'
     b"</script></head><body></body></html>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html binary")


def _norm(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_race_events_parity(pages):
    cols = ["url", "block_idx", "rec_idx", "event_type", "event_name",
            "start_date", "location_name", "distance_km"]
    got = _norm(race_events(pages).collect(), cols)
    want = sorted(tuple(d[c] for c in cols)
                  for url, html in PAGES
                  for d in oracle_events.race_events(url, html))
    assert got == want
    assert len(got) > 40  # the battery really produces events


def test_results_rows_parity(pages):
    cols = ["url", "place", "bib", "runner", "time_s"]
    got = _norm(results_table_rows(pages).collect(), cols)
    want = sorted(tuple(d[c] for c in cols)
                  for url, html in PAGES
                  for d in oracle_events.results_rows(url, html))
    assert got == want
    assert len(got) > 100
    # DNF rows survive with null time_s, never dropped
    assert any(t[4] is None for t in got)


def test_race_event_records_parity(pages):
    cols = ["url", "event_name", "start_date", "location_name",
            "distance_km", "n_finishers", "winner", "winner_time_s"]
    got = _norm(race_event_records(pages).collect(), cols)
    want = sorted(
        tuple(d[c] for c in cols)
        for d in (oracle_events.race_event_records(url, html)
                  for url, html in PAGES) if d is not None)
    assert got == want


def test_distance_and_time_edge_cases(spark):
    from oracle.events import distance_km, time_seconds
    cases = [("42.195 km", 42.195), ("10K", 10.0), ("26.2 mi", 42.165),
             ("5000 m", 5.0), ("13.1 miles", 21.082), ("7", 7.0),
             ("", None), (None, None), ("soon", None)]
    df = spark.createDataFrame([(c,) for c, _ in cases], "d string")
    from data_crawler_spark.operators.structured import _distance_km_col
    got = [r[0] for r in df.select(_distance_km_col(F.col("d"))).collect()]
    assert got == [e for _, e in cases]
    assert [distance_km(c) for c, _ in cases] == [e for _, e in cases]
    assert time_seconds("2:29:59") == 8999
    assert time_seconds("59:59") == 3599
    assert time_seconds("DNF") is None and time_seconds("") is None


def test_event_plans(pages):
    """Parsers are pure map (fused into the page scan); the merged
    pipeline shuffles only typed rows — html appears in no Exchange."""
    for df in (race_events(pages), results_table_rows(pages)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "EvalPython" not in plan
    plan = (race_event_records(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PythonUDF" not in plan and "EvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html" not in line
