"""URL / domain blocklist filtering (links.host_blocklist_filter)."""

from pyspark.sql import functions as F

from data_crawler_spark.operators.links import (host_blocklist_filter,
                                                host_suffixes_col)

ROWS = [
    (1, "http://spam.example.com/page"),        # subdomain of blocked
    (2, "http://example.com/index.html"),       # exact blocked domain
    (3, "http://notexample.com/a"),             # suffix ONLY at dot boundary
    (4, "http://good.org/b"),
    (5, "http://sub.good.org/c"),
    (6, "http://example.com.evil.net/d"),       # blocked dom as LABEL, not suffix
    (7, "https://EXAMPLE.com:8080/e"),          # case + port insensitive
    (8, "ftp://example.com/f"),                 # non-http: passes through
]
BLOCK = ["example.com", "tracker.net"]


def _hosts(rows):
    return sorted(r[0] for r in rows)


def test_host_suffixes():
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    got = (spark.range(1)
           .select(host_suffixes_col(F.lit("a.b.Example.COM:8080"))
                   .alias("s")).first().s)
    # the ported full-host entry leads (docstring contract: a
    # blocklist row 'h:8080' is matchable); dot suffixes are portless
    assert got == ["a.b.example.com:8080", "a.b.example.com",
                   "b.example.com", "example.com", "com"]


def test_blocklist_literal_and_dataframe_agree(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, url string")
    lit_ids = {r.doc_id for r in host_blocklist_filter(df, BLOCK).collect()}
    bl_df = spark.createDataFrame([(d,) for d in BLOCK], "domain string")
    df_ids = {r.doc_id for r in host_blocklist_filter(df, bl_df).collect()}
    assert lit_ids == df_ids == {3, 4, 5, 6, 8}


def test_blocklist_exact_host_mode(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, url string")
    ids = {r.doc_id for r in
           host_blocklist_filter(df, BLOCK, match_subdomains=False).collect()}
    # subdomain (1) now survives; exact-host matches (2, 7) still drop
    assert ids == {1, 3, 4, 5, 6, 8}
    bl_df = spark.createDataFrame([(d,) for d in BLOCK], "domain string")
    ids2 = {r.doc_id for r in
            host_blocklist_filter(df, bl_df, match_subdomains=False).collect()}
    assert ids2 == ids


def test_blocklist_literal_is_pure_map(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, url string")
    plan = host_blocklist_filter(df, BLOCK)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


# ---------------------------------------------------------------------------
# sitemap.xml parsing (operators/links.py::parse_sitemap_col / sitemap_urls)
# ---------------------------------------------------------------------------

def test_sitemap_urls_end_to_end(spark):
    from data_crawler_spark.operators.links import sitemap_urls

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.com/page?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>
     http://a.com/spaced/
  </loc></url>
  <url><loc>ftp://a.com/skip-me</loc></url>
  <url><loc>http://a.com/entities/&apos;q&apos;/&lt;b&gt;</loc></url>
</urlset>"""
    idx = """<sitemapindex>
  <sitemap><loc>http://b.com/sitemap1.xml</loc></sitemap>
  <sitemap><loc>http://b.com/sitemap2.xml</loc></sitemap>
</sitemapindex>"""
    df = spark.createDataFrame(
        [("http://a.com/sitemap.xml", xml),
         ("http://b.com/sitemap_index.xml", idx),
         ("http://c.com/sitemap.xml", "not xml at all")],
        "url string, sitemap_xml string")
    out = sitemap_urls(df)
    got = {(r.sitemap_url, r.url) for r in out.collect()}
    from data_crawler_spark.functions.canonicalize import canonicalize_one as canonicalize_url
    want_a = {canonicalize_url(u) for u in
              ("http://a.com/page?x=1&y=2", "http://a.com/spaced/",
               "http://a.com/entities/'q'/<b>")}
    assert {u for s_, u in got if s_ == "http://a.com/sitemap.xml"} == want_a
    assert {u for s_, u in got if s_.startswith("http://b.com")} == {
        canonicalize_url("http://b.com/sitemap1.xml"),
        canonicalize_url("http://b.com/sitemap2.xml")}
    assert not any(s_ == "http://c.com/sitemap.xml" for s_, _ in got)
    # pure map + explode: no shuffle, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# spider-trap template mining (url_template_col / spider_trap_templates /
# trap_filter)
# ---------------------------------------------------------------------------

def test_url_template_col_folds_generators(spark):
    from data_crawler_spark.operators.links import url_template_col
    from pyspark.sql import functions as F

    urls = [
        "http://e.com/cal/2026/08/18",
        "http://e.com/cal/1999/01/02",
        "http://e.com/item?page=7&sid=deadbeefcafe1234",
        "http://e.com/item?sid=0123456789abcdef&page=12",
        "http://e.com/about",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.t for r in
           df.select(url_template_col(F.col("url")).alias("t")).collect()]
    assert got[0] == got[1] == "/cal/#/#/#?"
    assert got[2] == got[3] == "/item?page&sid"   # keys sorted, values gone
    assert got[4] == "/about?"


def test_spider_trap_mining_and_filter(spark):
    from data_crawler_spark.operators.links import (spider_trap_templates,
                                                    trap_filter)

    trap_urls = [(f"http://e.com/cal/{y}/{m:02d}", "e.com")
                 for y in range(2000, 2020) for m in range(1, 13)]  # 240
    good_urls = [(f"http://e.com/post/{i}", "e.com") for i in range(5)] + \
                [("http://f.com/cal/2026/01", "f.com")]
    df = spark.createDataFrame(trap_urls + good_urls, "url string, host string")
    mined = spider_trap_templates(df, max_urls_per_template=100)
    rows = {(r.host, r.template): (r.n_urls, r.trap) for r in mined.collect()}
    assert rows[("e.com", "/cal/#/#?")] == (240, True)
    assert rows[("e.com", "/post/#?")] == (5, False)
    assert rows[("f.com", "/cal/#/#?")] == (1, False)  # per-host, not global
    kept = {r.url for r in trap_filter(df, mined).collect()}
    assert kept == {u for u, _ in good_urls} | set()
    assert len(kept) == 6
    # the anti-join must be broadcast (frontier never shuffles)
    plan = (trap_filter(df, mined)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_trap_counts_distinct_urls_not_rows(spark):
    from data_crawler_spark.operators.links import spider_trap_templates

    # one popular URL discovered 500 times is NOT a trap
    rows = [("http://e.com/post/7", "e.com")] * 500 + \
           [(f"http://e.com/post/{i}", "e.com") for i in range(50)]
    df = spark.createDataFrame(rows, "url string, host string")
    mined = {r.template: (r.n_urls, r.trap)
             for r in spider_trap_templates(
                 df, max_urls_per_template=100).collect()}
    assert mined["/post/#?"] == (50, False)


def test_trap_filter_custom_host_col_and_template_col(spark):
    from data_crawler_spark.operators.links import (spider_trap_templates,
                                                    trap_filter)

    rows = ([(f"http://e.com/cal/{i}", "e.com", "keepme")
             for i in range(20)]
            + [("http://e.com/about", "e.com", "keepme")])
    df = spark.createDataFrame(rows, "url string, h string, template string")
    mined = spider_trap_templates(df, host_col="h",
                                  max_urls_per_template=10)
    out = trap_filter(df, mined, host_col="h")
    got = out.collect()
    assert {r.url for r in got} == {"http://e.com/about"}
    # the caller's own 'template' column survives untouched
    assert [r.template for r in got] == ["keepme"]


def test_sitemap_entity_order_and_uppercase_scheme(spark):
    from data_crawler_spark.operators.links import (parse_sitemap_col,
                                                    sitemap_urls)
    from pyspark.sql import functions as F

    # a URL literally containing &lt;b&gt; is sitemap-escaped with
    # &amp;lt; — amp-first decoding would double-unescape it to <b>
    xml = "<urlset><url><loc>http://a.com/?q=&amp;lt;b&amp;gt;</loc></url></urlset>"
    df = spark.createDataFrame([(xml,)], "x string")
    got = df.select(parse_sitemap_col(F.col("x")).alias("u")).collect()[0].u
    assert got == ["http://a.com/?q=&lt;b&gt;"]

    xml2 = "<urlset><url><loc>HTTP://A.com/x</loc></url></urlset>"
    df2 = spark.createDataFrame([("http://a.com/s.xml", xml2)],
                                "url string, sitemap_xml string")
    out = sitemap_urls(df2).collect()
    assert len(out) == 1 and out[0].url.startswith("http://a.com/")


def test_sitemap_entries_metadata(spark):
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.links import sitemap_entries
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://a.test/p1 </loc>"
        "<lastmod>2026-03-01T12:30:00+00:00</lastmod>"
        "<changefreq>Daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>http://a.test/p2&amp;x=1</loc>"
        "<lastmod>2026-04-02</lastmod></url>"
        "<url><loc>http://a.test/bad</loc><lastmod>soonish</lastmod>"
        "<priority>high</priority></url>"
        "<url><loc>ftp://a.test/skip</loc></url>"
        "</urlset>")
    df = spark.createDataFrame([("http://a.test/sitemap.xml", xml)],
                               "url string, sitemap_xml string")
    rows = {r.url: r for r in sitemap_entries(df).collect()}
    assert set(rows) == {"http://a.test/p1", "http://a.test/p2&x=1",
                         "http://a.test/bad"}
    r1 = rows["http://a.test/p1"]
    assert str(r1.lastmod).startswith("2026-03-01 12:30:00")
    assert r1.changefreq == "daily" and r1.priority == 0.8
    r2 = rows["http://a.test/p2&x=1"]
    assert r2.lastmod is not None and r2.changefreq is None
    bad = rows["http://a.test/bad"]
    assert bad.lastmod is None and bad.priority is None
    # pure map: no Exchange, no Python
    plan = sitemap_entries(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    assert rows["http://a.test/p1"].sitemap_url \
        == "http://a.test/sitemap.xml"
    _ = F  # imported for parity with module conventions


def test_feed_urls_rss_and_atom(spark):
    from data_crawler_spark.functions.canonicalize import canonicalize_one
    from data_crawler_spark.operators.links import feed_urls

    rss = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <link>http://r.com/</link>
  <item>
    <link>
      http://r.com/post/1?a=1&amp;b=2
    </link>
    <guid isPermaLink="true">http://r.com/post/1</guid>
  </item>
  <item>
    <link>http://r.com/post/2</link>
    <guid isPermaLink="false">opaque-id-123</guid>
  </item>
  <item><guid>http://r.com/post/3</guid></item>
  <item><guid>tag:not-a-url,2026:x</guid></item>
</channel></rss>"""
    atom = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <link rel="self" href="http://at.com/feed.xml"/>
  <entry><link href="http://at.com/e/1?x=&lt;1&gt;"/></entry>
  <entry><link rel='alternate' href='http://at.com/e/2'/></entry>
  <entry><link>http://at.com/text-link</link></entry>
</feed>"""
    df = spark.createDataFrame(
        [("http://r.com/feed", rss), ("http://at.com/feed.xml", atom),
         ("http://n.com/feed", "not a feed")],
        "url string, feed_xml string")
    got = {(r.feed_url, r.url) for r in feed_urls(df).collect()}

    want_rss = {canonicalize_one(u) for u in (
        "http://r.com/", "http://r.com/post/1?a=1&b=2",
        "http://r.com/post/1", "http://r.com/post/2",
        "http://r.com/post/3")}
    # the isPermaLink=false guid and the tag: guid must NOT appear
    assert {u for s, u in got if s == "http://r.com/feed"} == want_rss

    want_atom = {canonicalize_one(u) for u in (
        "http://at.com/feed.xml", "http://at.com/e/1?x=<1>",
        "http://at.com/e/2", "http://at.com/text-link")}
    assert {u for s, u in got if s == "http://at.com/feed.xml"} == want_atom
    assert not any(s == "http://n.com/feed" for s, _ in got)


def test_feed_urls_selfclosing_then_text_link_no_span(spark):
    """A self-closing Atom link followed by a text link must not make
    the text-form regex span the gap (the bare-<link>-only rule)."""
    from data_crawler_spark.functions.canonicalize import canonicalize_one
    from data_crawler_spark.operators.links import feed_urls

    xml = ('<feed><link href="http://x.com/a"/>'
           "<junk>ignore</junk>"
           "<link>http://x.com/b</link></feed>")
    df = spark.createDataFrame([("http://x.com/f", xml)],
                               "url string, feed_xml string")
    got = {r.url for r in feed_urls(df).collect()}
    assert got == {canonicalize_one("http://x.com/a"),
                   canonicalize_one("http://x.com/b")}


def test_registered_domain_trailing_dot_and_sitemap_case(spark):
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.links import (parse_sitemap_col,
                                                    registered_domain_col)

    df = spark.createDataFrame(
        [("https://a.example.com./p",), ("https://b.other.com./p",),
         ("https://plain.example.com/p",)], "url string")
    got = [r.d for r in df.select(
        registered_domain_col(F.col("url")).alias("d")).collect()]
    # FQDN trailing dots no longer collapse every .com. host into 'com.'
    assert got == ["example.com", "other.com", "example.com"]

    xml = ('<URLSET><URL><LOC>http://a.com/x</LOC></URL>'
           '<url><loc>http://a.com/y</loc></url></URLSET>')
    sm = spark.createDataFrame([(xml,)], "sitemap_xml string")
    urls = sm.select(parse_sitemap_col(F.col("sitemap_xml"))
                     .alias("u")).collect()[0].u
    assert urls == ["http://a.com/x", "http://a.com/y"]


def test_host_suffixes_keep_ported_entry(spark):
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.links import (host_blocklist_filter,
                                                    host_suffixes_col)

    df = spark.createDataFrame([("evil.com:8080",)], "h string")
    sufs = df.select(host_suffixes_col(F.col("h")).alias("s")) \
        .collect()[0].s
    assert sufs == ["evil.com:8080", "evil.com", "com"]

    urls = spark.createDataFrame(
        [("http://evil.com:8080/x",), ("http://evil.com/x",)],
        "url string")
    kept = [r.url for r in host_blocklist_filter(
        urls, ["evil.com:8080"]).collect()]
    assert kept == ["http://evil.com/x"]


def test_asset_url_filter(spark):
    """Extension gate: known asset extensions drop (or invert-select),
    versioned paths / query strings / extensionless URLs survive, and
    the gate is a pure map (zero Exchange / zero Python)."""
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.links import (asset_url_filter,
                                                    url_extension_col)

    rows = [
        (1, "http://a.com/pic.JPG"),            # asset (case-folded)
        (2, "http://a.com/doc.pdf?dl=1"),       # asset; query ignored
        (3, "http://a.com/page.html"),          # html keeps
        (4, "http://a.com/release/v1.2"),       # ext "2" not in set
        (5, "http://a.com/api/data.json"),      # json not an asset ext
        (6, "http://a.com/dir/"),               # trailing slash: no ext
        (7, "http://a.com/archive.tar.gz"),     # last ext wins: gz
        (8, "http://a.com/page.php#frag.png"),  # fragment ignored
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    exts = {r.id: r.e for r in df.select(
        "id", url_extension_col(F.col("url")).alias("e")).collect()}
    assert exts == {1: "jpg", 2: "pdf", 3: "html", 4: "2", 5: "json",
                    6: "", 7: "gz", 8: "php"}
    kept = {r.id for r in asset_url_filter(df).collect()}
    assert kept == {3, 4, 5, 6, 8}
    assets = {r.id for r in asset_url_filter(df, keep_assets=True)
              .collect()}
    assert assets == {1, 2, 7}
    # custom deny set
    assert {r.id for r in asset_url_filter(
        df, extensions=frozenset({"php"})).collect()} == \
        {1, 2, 3, 4, 5, 6, 7}

    plan = asset_url_filter(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
