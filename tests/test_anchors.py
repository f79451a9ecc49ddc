"""Anchor extraction + per-target aggregation (operators/anchors.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from data_crawler_spark.functions.extract import extract_anchors_series
from data_crawler_spark.operators.anchors import anchor_summary, page_anchors


def _html(*links):
    body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
    return f"<html><body>{body}</body></html>".encode()


def test_extract_anchors_series_strips_and_collapses():
    s = pd.Series([
        b'<a href="/x" class="c"> Hello\n  <b>big</b>   world </a>',
        b"<p>no links</p>",
        None,
    ])
    got = list(extract_anchors_series(s))
    assert got[0] == [("/x", "Hello big world")]
    assert got[1] == []
    assert got[2] is None


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("https://a.com/1", _html(("https://t.com/page", "Spark Engine"),
                                  ("/local", "Home"))),
        ("https://a.com/2", _html(("https://t.com/page", "Spark Engine"))),
        ("https://b.org/x", _html(("https://t.com/page#frag", "spark engine"),
                                  ("https://t.com/page", "Docs"))),
        ("https://c.net/", None),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    return page_anchors(pages)


def test_page_anchors_resolution(edges):
    got = {(r["src_url"], r["target_url"], r["anchor"])
           for r in edges.collect()}
    # relative href resolved against the source; fragment canonicalized off
    assert ("https://a.com/1", "https://a.com/local", "Home") in got
    assert ("https://b.org/x", "https://t.com/page", "spark engine") in got
    assert len(got) == 5  # null-html page emits nothing


def test_anchor_summary_topk(edges):
    rows = {r["target_url"]: r
            for r in anchor_summary(edges, top_k=2).collect()}
    t = rows["https://t.com/page"]
    assert t["n_inlinks"] == 4
    assert t["n_distinct_anchors"] == 3
    # freq: "Spark Engine" x2; ties ("Docs", "spark engine") break lex
    assert t["top_anchors"] == ["Spark Engine", "Docs"]
    assert rows["https://a.com/local"]["top_anchors"] == ["Home"]


def test_anchor_summary_two_exchanges(edges):
    plan = (anchor_summary(edges)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 2
    # skew pre-agg is map-side combinable
    assert "partial_count" in plan


def test_page_anchors_nofollow(spark):
    html = (
        '<html><p>x</p>'
        '<a href="https://a.com/good">endorsed</a>'
        '<a href="https://a.com/spam" rel="nofollow">spam link</a>'
        '<a href="https://a.com/ugc" rel="ugc nofollow noopener">ugc</a>'
        '<a href="https://a.com/follow" rel="noopener">fine</a>'
        '<a href="https://a.com/good" rel="nofollow">same href, '
        'this occurrence declined</a></html>').encode()
    pages = spark.createDataFrame([("https://s.com/p", html)],
                                  "url string, html binary")
    got = {(r["target_url"], r["anchor"]): r["nofollow"]
           for r in page_anchors(pages, with_nofollow=True).collect()}
    assert got == {
        ("https://a.com/good", "endorsed"): False,
        ("https://a.com/spam", "spam link"): True,
        ("https://a.com/ugc", "ugc"): True,
        ("https://a.com/follow", "fine"): False,
        ("https://a.com/good", "same href, this occurrence declined"): True,
    }
    # default shape is unchanged (no nofollow column), same edges
    base = page_anchors(pages)
    assert base.columns == ["src_url", "target_url", "anchor"]
    assert base.count() == 5
