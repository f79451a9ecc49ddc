"""op 05/06: canonicalizer spec cases, idempotence property, and
engine/oracle agreement on href resolution + host/path parsing."""

import pandas as pd
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_crawler_spark.functions.canonicalize import (
    canonicalize_one,
    canonicalize_series,
    host_of_series,
    path_of_series,
    resolve_href,
)
from data_crawler_spark.functions.extract import extract_links_series
from data_crawler_spark.operators.links import (
    host_col,
    path_col,
    resolve_href_col,
)

SPEC = [
    ("https://Example.COM/a/b", "https://example.com/a/b"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a/./b", "https://example.com/a/b"),
    ("https://example.com/a/../b", "https://example.com/b"),
    ("https://example.com/a//b///c", "https://example.com/a/b/c"),
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?q=1#frag", "https://example.com/a?q=1"),
    ("https://example.com/a?", "https://example.com/a"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("HTTPS://EXAMPLE.com/A/B", "https://example.com/A/B"),  # path case kept
    ("https://example.com/../a", "https://example.com/a"),
    ("https://example.com/a/b/../../c", "https://example.com/c"),
    ("https://example.com/a/.", "https://example.com/a"),
    ("mailto:x@y.z", "mailto:x@y.z"),  # non-URL passthrough (filtered later)
    ("notaurl", "notaurl"),
    # terminal-junk interactions (idempotence regressions, round 3):
    # whitespace shielding slashes/dots from the path rules, hostport
    # whitespace shielding the default-port strip, doubled ports
    ("https://ex.com/0/ ?", "https://ex.com/0"),
    ("HTTP://h.io:80 ?", "http://h.io:80 /"),  # ws INSIDE host group stays
    ("https://q.com:443/. ?", "https://q.com/"),
    ("https://q.com/a/ /. ?", "https://q.com/a"),
    ("https://q.com/a/ /..", "https://q.com/a"),
    ("https://h//b/a/.../a//a./ /..", "https://h/b/a/.../a/a."),
    ("http://h.io:80:80/x", "http://h.io/x"),
    ("https://q.com:8080/x", "https://q.com:8080/x"),  # :8080 is NOT :80
    ("https://q.com/a?b/ ", "https://q.com/a?b/"),  # query kept verbatim
]


def test_spec_cases():
    got = canonicalize_series(pd.Series([s for s, _ in SPEC], dtype=object))
    for (inp, want), out in zip(SPEC, got):
        assert out == want, f"{inp!r}: {out!r} != {want!r}"


def test_null_passthrough():
    out = canonicalize_series(pd.Series([None, "https://a.com/"], dtype=object))
    assert out[0] is None and out[1] == "https://a.com/"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcXYZ04819:/.?#%~_- \t", max_size=40))
def test_idempotent_random(suffix):
    # alphabet includes 4/8/tab so doubled default ports (:443:443)
    # and whitespace-shielded junk are reachable
    for prefix in ("https://Ex.COM", "HTTP://h.io:80"):
        u = prefix + suffix
        c1 = canonicalize_one(u)
        assert canonicalize_one(c1) == c1, u


def test_idempotent_on_generated_links(web1k):
    pages = pq.read_table(web1k / "pages.parquet", columns=["url", "html"]).to_pandas()
    # resolve each href against its own page
    out = []
    for url, links in zip(pages["url"], extract_links_series(pages["html"])):
        out.extend(resolve_href(url, h) for h in links)
    c1 = canonicalize_series(pd.Series(out, dtype=object))
    c2 = canonicalize_series(c1)
    assert c1.equals(c2)


def test_native_resolution_matches_pure_python(spark, web1k):
    """The engine resolves hrefs with JVM-native expressions; the oracle
    uses resolve_href. They must agree on every generated link."""
    pages = spark.read.parquet(str(web1k / "pages.parquet"))
    from data_crawler_spark.functions.spark_udfs import extract_links_udf
    df = (
        pages.select("url", F.explode(extract_links_udf("html")).alias("href"))
        .withColumn("resolved", resolve_href_col(F.col("url"), F.col("href")))
    )
    rows = df.collect()
    assert len(rows) > 1000
    for r in rows:
        assert r.resolved == resolve_href(r.url, r.href), (r.url, r.href)


def test_host_path_parsing_matches(spark, web1k):
    pages = spark.read.parquet(str(web1k / "pages.parquet"))
    rows = (
        pages.select("url", host_col(F.col("url")).alias("h"),
                     path_col(F.col("url")).alias("p"))
        .limit(500).collect()
    )
    urls = pd.Series([r.url for r in rows], dtype=object)
    hs = host_of_series(urls)
    ps = path_of_series(urls)
    for r, h, p in zip(rows, hs, ps):
        assert r.h == h and r.p == p


def test_native_canonicalize_matches_spec(spark, web1k):
    """canonicalize_col (JVM fast path used by the crawl's link
    pipeline) must be byte-identical to canonicalize_series (the
    executable spec shared with the oracle)."""
    import random

    from data_crawler_spark.operators.links import canonicalize_col

    rnd = random.Random(7)
    alpha = "abcXYZ019:/.?#%~_- " + "\t\n\r\x1c\x85\xa0 "
    vals = [s for s, _ in SPEC] + [None, "", " "]
    vals += ["https://Ex.COM" + "".join(rnd.choice(alpha) for _ in range(rnd.randrange(0, 40)))
             for _ in range(2000)]
    seg = ["a", "b", ".", "..", "...", "", "..a", "a.", " "]
    vals += ["https://h/" + "/".join(rnd.choice(seg) for _ in range(rnd.randrange(0, 10)))
             for _ in range(2000)]
    # full generated-link corpus
    pages = pq.read_table(web1k / "pages.parquet", columns=["url", "html"]).to_pandas()
    for url, links in zip(pages["url"], extract_links_series(pages["html"])):
        vals.extend(resolve_href(url, h) for h in links)

    want = canonicalize_series(pd.Series(vals, dtype=object))
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    got = [r.c for r in df.select(canonicalize_col(F.col("u")).alias("c")).collect()]
    for v, w, g in zip(vals, want, got):
        w = None if w is None else w
        assert w == g, f"in={v!r} spec={w!r} native={g!r}"


def test_resolve_href_protocol_relative_and_foreign_schemes(spark):
    """Protocol-relative hrefs inherit the base scheme; foreign-scheme
    hrefs (mailto:, javascript:) pass through untouched so the http
    filter drops them — gluing either onto the base path minted bogus
    same-host URLs. Native and spec mirror must agree byte-for-byte."""
    from pyspark.sql import functions as F

    from data_crawler_spark.functions.canonicalize import resolve_href
    from data_crawler_spark.operators.links import resolve_href_col

    base = "https://a.com/x/y.html"
    cases = [
        ("//cdn.b.com/z.js", "https://cdn.b.com/z.js"),
        ("mailto:x@y.test", "mailto:x@y.test"),
        ("javascript:void(0)", "javascript:void(0)"),
        ("ftp://f.test/a", "ftp://f.test/a"),
        ("data:text/plain,hi", "data:text/plain,hi"),
        ("/abs", "https://a.com/abs"),
        ("rel.html", "https://a.com/x/rel.html"),
        ("a:b.html", "a:b.html"),     # first segment with ':' IS a scheme
        ("http://c.com/q", "http://c.com/q"),
    ]
    for href, want in cases:
        assert resolve_href(base, href) == want, href
    df = spark.createDataFrame([(base, h) for h, _ in cases],
                               "base string, href string")
    got = [r.r for r in df.select(
        resolve_href_col(F.col("base"), F.col("href")).alias("r"))
        .collect()]
    assert got == [w for _, w in cases]
