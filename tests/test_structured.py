"""Structured-data mining (operators/structured.py): JSON-LD block
extraction and <meta> tag mining pinned against hand-written HTML,
plus the zero-Exchange / zero-Python plan contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.structured import (
    jsonld_col,
    jsonld_objects,
    meta_entries_col,
    page_meta,
)

EVENT = {"@type": "Event", "name": "City Marathon",
         "startDate": "2026-04-12"}

PAGES = [
    # two JSON-LD blocks (one with extra script attrs + single quotes),
    # og/meta tags with both attribute orders and a duplicate property
    ("http://a.test/p1",
     "<html><head>"
     '<meta property="og:title" content="Race Day">'
     '<meta content="desc text" name="description">'
     '<meta property="og:title" content="Race Day 2">'
     '<meta name="keywords">'                       # no content: skipped
     '<meta content="orphan">'                      # no key: skipped
     '<script type="application/ld+json">\n'
     + json.dumps(EVENT) +
     "\n</script>"
     "<script async type='application/ld+json'>{broken json</script>"
     "</head><body>hello</body></html>"),
    # case-insensitive tag/type matching, no meta
    ("http://a.test/p2",
     '<HTML><SCRIPT TYPE="APPLICATION/LD+JSON">'
     '{"@type": "Event", "name": "5k Fun Run"}'
     "</SCRIPT></HTML>"),
    # nothing structured at all
    ("http://a.test/p3", "<html><body>plain prose only</body></html>"),
]

SCHEMA = "`@type` string, name string, startDate string"


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_jsonld_col_extracts_trimmed_blocks(pages):
    rows = {r["url"]: r["blocks"] for r in pages.select(
        "url", jsonld_col(F.col("html")).alias("blocks")).collect()}
    assert rows["http://a.test/p1"] == [json.dumps(EVENT), "{broken json"]
    assert rows["http://a.test/p2"] == [
        '{"@type": "Event", "name": "5k Fun Run"}']
    assert rows["http://a.test/p3"] == []


def test_jsonld_col_on_binary_html(spark):
    df = spark.createDataFrame(
        [(PAGES[1][1].encode("utf-8"),)], "html binary")
    [r] = df.select(jsonld_col(F.col("html")).alias("b")).collect()
    assert r["b"] == ['{"@type": "Event", "name": "5k Fun Run"}']


def test_jsonld_objects_typed_rows(pages):
    rows = jsonld_objects(pages, SCHEMA).collect()
    by_key = {(r["url"], r["block_idx"]): r["obj"] for r in rows}
    assert set(by_key) == {("http://a.test/p1", 0),
                           ("http://a.test/p1", 1),
                           ("http://a.test/p2", 0)}
    ev = by_key[("http://a.test/p1", 0)]
    assert (ev["@type"], ev["name"], ev["startDate"]) == (
        "Event", "City Marathon", "2026-04-12")
    # unparseable block -> null obj, row preserved for the caller
    assert by_key[("http://a.test/p1", 1)] is None
    assert by_key[("http://a.test/p2", 0)]["name"] == "5k Fun Run"


def test_meta_entries_order_and_skips(pages):
    rows = {r["url"]: r["m"] for r in pages.select(
        "url", meta_entries_col(F.col("html")).alias("m")).collect()}
    p1 = [(e["key"], e["value"]) for e in rows["http://a.test/p1"]]
    # document order, duplicates preserved, keys lowercased,
    # attribute order free, incomplete tags skipped
    assert p1 == [("og:title", "Race Day"),
                  ("description", "desc text"),
                  ("og:title", "Race Day 2")]
    assert rows["http://a.test/p2"] == []
    assert rows["http://a.test/p3"] == []


def test_page_meta_exploded_shape(pages):
    rows = page_meta(pages).collect()
    assert len(rows) == 3
    assert {(r["url"], r["key"], r["value"]) for r in rows} == {
        ("http://a.test/p1", "og:title", "Race Day"),
        ("http://a.test/p1", "description", "desc text"),
        ("http://a.test/p1", "og:title", "Race Day 2"),
    }


def test_structured_plans_pure_map(pages):
    """Both extractors fuse into the page scan: no Exchange, no
    Python eval anywhere in the plan."""
    for df in (jsonld_objects(pages, SCHEMA), page_meta(pages)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "EvalPython" not in plan
