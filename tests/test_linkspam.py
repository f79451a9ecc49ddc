"""Per-domain link-spam signals (operators/linkspam.py)."""

from __future__ import annotations

import pytest

from data_crawler_spark.operators.linkspam import domain_link_signals


@pytest.fixture(scope="module")
def signals(spark):
    rows = [
        # farm.biz: 2 pages, every link external, all to one target
        ("https://farm.biz/1",
         ["https://casino.win/a", "https://casino.win/b",
          "https://casino.win/c"]),
        ("https://farm.biz/2",
         ["https://casino.win/d", "https://other.net/x"]),
        # blog.org: mixed internal/external, diverse targets
        ("https://blog.org/post", ["/about", "https://ref1.com/",
                                   "https://ref2.com/"]),
        ("https://www.blog.org/about", ["/post"]),
        # lonely.io: a linkless page
        ("https://lonely.io/", []),
    ]
    df = spark.createDataFrame(rows, "url string, links array<string>")
    return {r["src_domain"]: r for r in domain_link_signals(df).collect()}


def test_link_farm_signature(signals):
    f = signals["farm.biz"]
    assert (f["n_pages"], f["n_outlinks"]) == (2, 5)
    assert f["external_ratio"] == 1.0
    assert f["n_dst_domains"] == 2
    assert f["top_dst_share"] == pytest.approx(4 / 5)


def test_normal_site(signals):
    b = signals["blog.org"]
    assert (b["n_pages"], b["n_outlinks"]) == (2, 4)
    # /about and /post resolve within blog.org (www stripped by the
    # registered-domain reduction)
    assert b["external_ratio"] == pytest.approx(2 / 4)
    assert b["n_dst_domains"] == 2
    assert b["top_dst_share"] == pytest.approx(1 / 2)
    assert b["outlinks_per_page"] == pytest.approx(2.0)


def test_linkless_domain(signals):
    l = signals["lonely.io"]
    assert (l["n_pages"], l["n_outlinks"]) == (1, 0)
    assert l["external_ratio"] == 0.0
    assert l["top_dst_share"] == 0.0
