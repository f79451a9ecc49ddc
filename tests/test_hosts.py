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


# ------------------------------------------------- mirror detection

def _mirror_pages(spark):
    paths = [f"/art/{i}" for i in range(12)]
    rows = []
    # m2 fully mirrors m1 (same 12 paths, same text)
    for p in paths:
        rows.append((f"https://m1.com{p}", f"text of {p}"))
        rows.append((f"https://m2.org{p}", f"text of {p}"))
    # p1 mirrors only 3 of m1's paths (below min_shared=5)
    for p in paths[:3]:
        rows.append((f"https://p1.net{p}", f"text of {p}"))
    # u1 is unrelated
    for i in range(10):
        rows.append((f"https://u1.com/page/{i}", f"unique {i}"))
    # ubiquitous path on every host — must be df-capped away
    for h in ("m1.com", "m2.org", "p1.net", "u1.com"):
        rows.append((f"https://{h}/", "home"))
    return spark.createDataFrame(rows, "url string, text string")


def test_mirror_candidates_planted(spark):
    from data_crawler_spark.operators.hosts import mirror_candidates

    got = mirror_candidates(_mirror_pages(spark), min_shared=5,
                            min_overlap=0.5, max_feature_df=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.host_a, r.host_b) == ("m1.com", "m2.org")
    assert r.shared == 12          # the "/" feature was df-capped out
    assert r.overlap == pytest.approx(12 / 12)


def test_mirror_candidates_subset_containment(spark):
    """A complete mirror of a SUBTREE scores overlap 1.0 (containment
    divides by the smaller host)."""
    from data_crawler_spark.operators.hosts import mirror_candidates

    rows = [(f"https://big.com/a/{i}", f"t{i}") for i in range(20)]
    rows += [(f"https://sub.com/a/{i}", f"t{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "url string, text string")
    got = mirror_candidates(df, min_shared=5, min_overlap=0.9).collect()
    assert len(got) == 1
    assert got[0].overlap == pytest.approx(1.0)
    assert (got[0].n_a, got[0].n_b) == (20, 6)


def test_mirror_candidates_content_mode(spark):
    """Same path layout + different content: a mirror in path mode,
    NOT in content-aware mode."""
    from data_crawler_spark.operators.hosts import mirror_candidates

    rows = []
    for i in range(8):
        rows.append((f"https://x.com/p/{i}", f"x content {i}"))
        rows.append((f"https://y.com/p/{i}", f"y content {i}"))
    df = spark.createDataFrame(rows, "url string, text string")
    by_path = mirror_candidates(df, min_shared=5, min_overlap=0.5)
    assert by_path.count() == 1
    by_content = mirror_candidates(df, text_col="text", min_shared=5,
                                   min_overlap=0.5)
    assert by_content.count() == 0
    with pytest.raises(ValueError):
        mirror_candidates(df, min_shared=0)
    with pytest.raises(ValueError):
        mirror_candidates(df, max_feature_df=1)
