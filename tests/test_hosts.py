"""Registered domains, host reputation, leakage-free split
(operators/links.registered_domain_col + operators/hosts.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.hosts import (
    domain_split,
    host_stats,
    reputation_filter,
)
from data_crawler_spark.operators.links import registered_domain_col


@pytest.mark.parametrize("url,expected", [
    ("https://www.example.com/a", "example.com"),
    ("https://a.b.example.co.uk/x?q=1", "example.co.uk"),
    ("http://news.bbc.ac.jp:8080/", "bbc.ac.jp"),
    ("https://example.de/", "example.de"),
    ("https://sub.example.de/", "example.de"),
    ("https://co.uk/", "co.uk"),           # 2 labels pass through
    ("http://localhost/", "localhost"),
    ("http://10.0.0.1:8080/x", "10.0.0.1"),
    ("https://a.gov.example.com/", "example.com"),  # sld rule needs cc-TLD
])
def test_registered_domain(spark, url, expected):
    got = (spark.range(1)
           .select(registered_domain_col(F.lit(url)).alias("d"))
           .first()["d"])
    assert got == expected


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # spam.com: 3 pages, 2 identical -> dup_ratio 1/3
        ("https://spam.com/1", "buy cheap pills now", "en"),
        ("https://www.spam.com/2", "buy cheap pills now", "en"),
        ("https://spam.com/3", "totally different pills", "en"),
        # good.org: 2 unique pages, mixed lang, modal en (tie -> low)
        ("https://good.org/a", "a long and thoughtful essay about the "
                               "nature of things and the world", "en"),
        ("https://good.org/b", "une dissertation longue et reflechie",
         "fr"),
        ("https://sub.good.org/c", "another decent piece of writing "
                                   "with many common words", "en"),
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


def test_host_stats(corpus):
    got = {r["domain"]: r for r in host_stats(corpus).collect()}
    assert set(got) == {"spam.com", "good.org"}
    s = got["spam.com"]
    assert (s["n_pages"], s["n_unique"]) == (3, 2)
    assert s["dup_ratio"] == pytest.approx(1 / 3)
    g = got["good.org"]
    assert g["n_pages"] == 3 and g["n_unique"] == 3
    assert g["dup_ratio"] == 0.0
    assert g["top_lang"] == "en"


def test_reputation_filter(corpus):
    stats = host_stats(corpus)
    kept = reputation_filter(corpus, stats, max_dup_ratio=0.3)
    assert {r["url"] for r in kept.select("url").collect()} == {
        "https://good.org/a", "https://good.org/b",
        "https://sub.good.org/c"}
    # no corpus-side shuffle: the bad-domain side broadcasts
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_domain_split_no_leakage(corpus):
    out = domain_split(corpus, fractions={"train": 0.5, "val": 0.5},
                       seed=7)
    per_domain = (out.select(
        registered_domain_col(F.col("url")).alias("d"), "split")
        .distinct().groupBy("d").count().collect())
    assert all(r["count"] == 1 for r in per_domain)
    # deterministic across recomputation
    a = sorted((r["url"], r["split"]) for r in out.collect())
    b = sorted((r["url"], r["split"]) for r in out.collect())
    assert a == b


def test_host_stats_single_exchange(corpus):
    plan = (host_stats(corpus)._jdf.queryExecution()
            .executedPlan().toString())
    # one exchange on domain (countDistinct expands within the same key)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "partial_count" in plan
