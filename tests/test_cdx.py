"""CDX index / SURT keys (operators/cdx.py): SURT spec vs a pure-Python
mirror, digest parity with hashlib, global sort order, as-of lookup
semantics, and prefix-scan correctness."""

from __future__ import annotations

import hashlib
from datetime import datetime
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.functions.canonicalize import canonicalize_series
from data_crawler_spark.operators.cdx import (
    cdx_index,
    cdx_lookup_asof,
    cdx_prefix_scan,
    surt_col,
)


def surt_py(url: str) -> str:
    """Independent SURT mirror over the canonical form."""
    import pandas as pd
    u = canonicalize_series(pd.Series([url])).iloc[0]
    sp = urlsplit(u)
    host = sp.netloc
    port = ""
    if ":" in host:
        host, _, p = host.partition(":")
        port = ":" + p
    if host.startswith("www.") and len(host) > 4:
        host = host[4:]
    key = ",".join(reversed(host.split("."))) + port + ")" + (sp.path or "/")
    if sp.query:
        key += "?" + sp.query
    return key


SURT_CASES = [
    "https://www.Example.COM/a/b?q=1",
    "http://example.com:80/",
    "https://example.com:8443/x",
    "http://sub.www.example.com/p",       # only a LEADING www strips
    "https://www.example.com",            # empty path -> '/'
    "http://host0.example.com/sec1/p5.html",
    "https://example.com/a/../b/./c?z=2&a=1#frag",
    "http://www/",                        # host 'www' alone must NOT strip
    "HTTPS://UPPER.example.com/Case?Q=V",
]


def test_surt_matches_python_mirror(spark):
    df = spark.createDataFrame([(u,) for u in SURT_CASES], "url string")
    got = [r[0] for r in df.select(surt_col(F.col("url"))).collect()]
    exp = [surt_py(u) for u in SURT_CASES]
    assert got == exp


def test_surt_is_native(spark):
    df = spark.createDataFrame([("https://a.b/c",)], "url string")
    plan = (df.select(surt_col(F.col("url")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def _pages(spark):
    rows = [
        ("https://www.example.com/a", datetime(2026, 8, 1), b"v1"),
        ("https://www.example.com/a", datetime(2026, 8, 10), b"v2"),
        ("https://www.example.com/a", datetime(2026, 8, 20), b"v3"),
        ("https://example.com/b", datetime(2026, 8, 5), b"bb"),
        ("https://other.net/z", datetime(2026, 8, 7), b"zz"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")


def test_index_digest_and_order(spark):
    idx = cdx_index(_pages(spark)).collect()
    keys = [(r["surt_key"], r["warc_ts"]) for r in idx]
    assert keys == sorted(keys)
    by_url = {(r["url"], r["warc_ts"]): r for r in idx}
    r = by_url[("https://www.example.com/a", datetime(2026, 8, 10))]
    assert r["digest"] == hashlib.sha1(b"v2").hexdigest()
    assert r["length"] == 2
    assert r["surt_key"] == "com,example)/a"


def test_lookup_asof(spark):
    idx = cdx_index(_pages(spark))
    q = spark.createDataFrame(
        [("https://example.com/a",),       # www-insensitive via SURT
         ("https://example.com/b",),
         ("https://missing.org/x",)], "url string")
    got = {r["query_url"]: r for r in
           cdx_lookup_asof(idx, q, datetime(2026, 8, 12)).collect()}
    assert got["https://example.com/a"]["digest"] == hashlib.sha1(b"v2").hexdigest()
    assert got["https://example.com/a"]["warc_ts"] == datetime(2026, 8, 10)
    assert got["https://example.com/b"]["digest"] == hashlib.sha1(b"bb").hexdigest()
    assert "https://missing.org/x" not in got  # nothing as-of -> no row
    # asof before everything -> empty
    assert cdx_lookup_asof(idx, q, datetime(2026, 7, 1)).count() == 0


def test_revisits(spark):
    """Same digest at a later ts for the same SURT key is a revisit
    pointing at the ORIGINAL capture; a content change is not."""
    from data_crawler_spark.operators.cdx import cdx_revisits
    rows = [
        ("https://example.com/a", datetime(2026, 8, 1), b"v1"),
        ("https://example.com/a", datetime(2026, 8, 5), b"v2"),   # changed
        ("https://www.example.com/a", datetime(2026, 8, 9), b"v1"),  # back to v1
        ("https://example.com/a", datetime(2026, 8, 12), b"v1"),  # v1 again
        ("https://other.net/a", datetime(2026, 8, 2), b"v1"),     # other site
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    rev = cdx_revisits(cdx_index(pages)).orderBy("warc_ts").collect()
    assert [(r["warc_ts"], r["original_ts"]) for r in rev] == [
        (datetime(2026, 8, 9), datetime(2026, 8, 1)),
        (datetime(2026, 8, 12), datetime(2026, 8, 1)),
    ]
    assert all(r["digest"] == hashlib.sha1(b"v1").hexdigest() for r in rev)


def test_prefix_scan(spark):
    idx = cdx_index(_pages(spark))
    site = cdx_prefix_scan(idx, "com,example)").collect()
    assert sorted({r["url"] for r in site}) == [
        "https://example.com/b", "https://www.example.com/a"]
    assert cdx_prefix_scan(idx, "net,other)").count() == 1
