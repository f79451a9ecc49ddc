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


def test_canonical_url_col_variants(spark):
    from data_crawler_spark.operators.structured import canonical_url_col
    rows = [
        # absolute href, extra attrs, rel after href
        ("http://a.test/page?utm=x",
         '<html><head><link href="HTTP://A.test/page" rel="canonical">'
         "</head></html>"),
        # relative href resolves against the page, unquoted rel
        ("http://b.test/dir/page2",
         '<link rel=canonical href="../canon">'),
        # root-relative
        ("http://c.test/x/y", '<link rel="canonical" href="/top">'),
        # no canonical declared -> null
        ("http://d.test/p", '<link rel="stylesheet" href="/s.css">'),
        # rel list containing canonical still matches the word boundary
        ("http://e.test/p",
         '<link rel="canonical alternate" href="/e">'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["url"]: r["c"] for r in df.select(
        "url", canonical_url_col(F.col("url"), F.col("html"))
        .alias("c")).collect()}
    assert got["http://a.test/page?utm=x"] == "http://a.test/page"
    assert got["http://b.test/dir/page2"] == "http://b.test/canon"
    assert got["http://c.test/x/y"] == "http://c.test/top"
    assert got["http://d.test/p"] is None
    assert got["http://e.test/p"] == "http://e.test/e"


def test_canonical_dedup_keep_rules(spark):
    from data_crawler_spark.operators.structured import canonical_dedup
    canon = '<link rel="canonical" href="http://s.test/article">'
    rows = [
        # three variants + the canonical page itself: the canonical
        # page must be the survivor
        ("http://s.test/article", canon + "A"),
        ("http://s.test/article?utm=1", canon + "B"),
        ("http://s.test/article/print", canon + "C"),
        # variants whose canonical target was never captured:
        # min-url survivor among the variants
        ("http://t.test/p?b=2",
         '<link rel="canonical" href="http://t.test/gone">'),
        ("http://t.test/p?a=1",
         '<link rel="canonical" href="http://t.test/gone">'),
        # no declaration: survives on its own url
        ("http://u.test/solo", "<html>no links</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = canonical_dedup(df.repartition(5))
    got = {r["url"] for r in out.collect()}
    assert got == {"http://s.test/article", "http://t.test/p?a=1",
                   "http://u.test/solo"}
    assert set(out.columns) == {"url", "html"}


def test_clean_corpus_group_cap_stage(spark):
    from data_crawler_spark.plans.corpus_pipeline import clean_corpus
    rows = [(i, "dom-a" if i < 6 else "dom-b",
             f"document number {i} with plenty of distinct words")
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, "
                                     "text string")
    out = clean_corpus(df, quality=False, repetition=False, exact=False,
                       near_dup_threshold=None, group_cap=("domain", 2))
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 6, 7}


def test_meta_and_canonical_quote_styles(spark):
    from data_crawler_spark.operators.structured import (
        canonical_url_col, meta_entries_col)
    rows = [
        ("http://q.test/p",
         "<meta name='author' content='Ada L'>"
         '<meta name="mixed" content=\'single content\'>'
         "<link rel=canonical href=http://q.test/canon>")]
    df = spark.createDataFrame(rows, "url string, html string")
    [r] = df.select(
        meta_entries_col(F.col("html")).alias("m"),
        canonical_url_col(F.col("url"), F.col("html")).alias("c")
    ).collect()
    assert [(e["key"], e["value"]) for e in r["m"]] == [
        ("author", "Ada L"), ("mixed", "single content")]
    assert r["c"] == "http://q.test/canon"


ROBOTS_PAGES = [
    # plain noindex
    ("http://r.test/p1",
     '<html><meta name="robots" content="noindex"><body>x</body></html>'),
    # nofollow only, single quotes + mixed case name
    ("http://r.test/p2",
     "<html><meta name='ROBOTS' content='NOFOLLOW'></html>"),
    # none == noindex,nofollow; unquoted name attr
    ("http://r.test/p3", "<html><meta name=robots content='none'></html>"),
    # spaced comma list, attribute order reversed
    ("http://r.test/p4",
     '<html><meta content=" noindex ,  nofollow " name="robots"></html>'),
    # multiple tags combine most-restrictive-wins
    ("http://r.test/p5",
     '<html><meta name="robots" content="index, follow">'
     '<meta name="robots" content="nofollow"></html>'),
    # description meta is NOT a robots tag; no robots meta at all
    ("http://r.test/p6",
     '<html><meta name="description" content="noindex"></html>'),
    ("http://r.test/p7", "<html><body>no meta</body></html>"),
]


@pytest.fixture(scope="module")
def robots_pages(spark):
    from data_crawler_spark.operators.structured import (
        robots_directives_col)
    df = spark.createDataFrame(ROBOTS_PAGES, "url string, html string")
    return df, {r["url"]: (r["d"]["noindex"], r["d"]["nofollow"])
                for r in df.select(
                    "url", robots_directives_col(F.col("html"))
                    .alias("d")).collect()}


def test_robots_directives_forms(robots_pages):
    _, d = robots_pages
    assert d["http://r.test/p1"] == (True, False)
    assert d["http://r.test/p2"] == (False, True)
    assert d["http://r.test/p3"] == (True, True)   # none
    assert d["http://r.test/p4"] == (True, True)   # spaced list
    assert d["http://r.test/p5"] == (False, True)  # tags combine
    assert d["http://r.test/p6"] == (False, False)  # not a robots tag
    assert d["http://r.test/p7"] == (False, False)


def test_noindex_filter_and_plan(robots_pages):
    from data_crawler_spark.operators.structured import noindex_filter
    df, _ = robots_pages
    kept = noindex_filter(df)
    assert {r["url"] for r in kept.select("url").collect()} == {
        "http://r.test/p2", "http://r.test/p5",
        "http://r.test/p6", "http://r.test/p7"}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "EvalPython" not in plan


def test_apply_meta_nofollow_drops_source_edges(spark, robots_pages):
    from data_crawler_spark.operators.structured import apply_meta_nofollow
    df, _ = robots_pages
    edges = spark.createDataFrame(
        [(u, f"http://t.test/{i}") for i, (u, _) in enumerate(ROBOTS_PAGES)]
        + [("http://r.test/p2", "http://t.test/extra")],
        "src string, dst string")
    out = apply_meta_nofollow(edges, df)
    srcs = {r["src"] for r in out.select("src").collect()}
    # nofollow sources (p2, p3, p4, p5) lose ALL their outlinks
    assert srcs == {"http://r.test/p1", "http://r.test/p6",
                    "http://r.test/p7"}
    # edge count: one edge per remaining src
    assert out.count() == 3


def test_unquoted_attr_values(spark):
    """Unquoted attribute values (legal HTML for space-free tokens)
    parse in meta entries, robots directives, and canonical hrefs."""
    from data_crawler_spark.operators.structured import (
        canonical_url_col, meta_entries_col, robots_directives_col)
    df = spark.createDataFrame(
        [("http://u.test/p",
          "<html><meta name=viewport content=width=device-width>"
          "<meta name=robots content=noindex,nofollow>"
          "<link rel=canonical href=http://u.test/canon></html>")],
        "url string, html string")
    [r] = df.select(
        meta_entries_col(F.col("html")).alias("m"),
        robots_directives_col(F.col("html")).alias("d"),
        canonical_url_col(F.col("url"), F.col("html")).alias("c"),
    ).collect()
    pairs = [(e["key"], e["value"]) for e in r["m"]]
    assert ("viewport", "width=device-width") in pairs
    assert (r["d"]["noindex"], r["d"]["nofollow"]) == (True, True)
    assert r["c"] == "http://u.test/canon"


def test_hreflang_entries_forms(spark):
    """All three attribute quote forms, relative href resolution +
    canonicalization, token-list rel matching, case folding; pages
    without alternates emit nothing; html never leaves the scan
    (pure map + explode — no Exchange/Python)."""
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.structured import hreflang_entries

    pages = [
        ("http://a.com/en/p",
         '<link rel="alternate" hreflang="de" href="http://a.com/de/p">'
         "<link rel='alternate' hreflang='FR' href='/fr/p'>"
         '<link rel=alternate hreflang=x-default href=../p>'
         '<link rel="alternate stylesheet" hreflang="xx" href="/s.css">'
         '<link rel="stylesheet" href="/style.css">'
         '<link rel="alternate" type="application/rss+xml" href="/feed">'),
        ("http://b.com/solo", "<p>no links</p>"),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    got = {(r.url, r.hreflang, r.alt_url)
           for r in hreflang_entries(df).collect()}
    assert got == {
        ("http://a.com/en/p", "de", "http://a.com/de/p"),
        ("http://a.com/en/p", "fr", "http://a.com/fr/p"),
        ("http://a.com/en/p", "x-default", "http://a.com/p"),
        # rel token-list: "alternate stylesheet" DOES carry the
        # alternate token and an hreflang, so it is (correctly) kept
        ("http://a.com/en/p", "xx", "http://a.com/s.css"),
    }

    plan = hreflang_entries(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_language_variant_clusters(spark):
    """Captured variants cluster through an UNCAPTURED hub (the
    x-default page links both), unrelated pages stay singletons,
    alt-only vertices don't appear in the output, layout-invariant."""
    from data_crawler_spark.operators.structured import \
        language_variant_clusters

    hub_links = ('<link rel="alternate" hreflang="en" '
                 'href="http://s.com/en">'
                 '<link rel="alternate" hreflang="de" '
                 'href="http://s.com/de">')
    pages = [
        # en and de each declare only the uncaptured x-default hub
        ("http://s.com/en", '<link rel="alternate" hreflang="x-default"'
                            ' href="http://s.com/">'),
        ("http://s.com/de", '<link rel="alternate" hreflang="x-default"'
                            ' href="http://s.com/">'),
        ("http://other.com/q", "<p>plain page</p>"),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    for src in (df, df.repartition(5)):
        got = {r.url: r.cluster_id
               for r in language_variant_clusters(src).collect()}
        # min url over {s.com/, s.com/de, s.com/en} is the hub itself
        assert got == {
            "http://s.com/en": "http://s.com/",
            "http://s.com/de": "http://s.com/",
            "http://other.com/q": "http://other.com/q",
        }
    # hub page text never captured -> not a row in the output
    assert "http://s.com/" not in got

    # sanity: hub_links present on a captured hub merges the same way
    df2 = spark.createDataFrame(
        [("http://s.com/", hub_links), *pages[:2]],
        "url string, html string")
    got2 = {r.url: r.cluster_id
            for r in language_variant_clusters(df2).collect()}
    assert set(got2.values()) == {"http://s.com/"}
