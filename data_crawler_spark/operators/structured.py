"""Structured-data mining from HTML: JSON-LD blocks and <meta> tags.

Web pages carry machine-readable payloads besides their prose —
schema.org JSON-LD in ``<script type="application/ld+json">`` and
OpenGraph/Twitter-card ``<meta>`` tags. Corpus pipelines mine both:
JSON-LD yields typed records (products, events, articles — the
reference crawler's race-event extraction is exactly this shape done
by hand), and og:/twitter: tags give curated titles/descriptions that
double as quality and topicality signals.

Scale shape: everything here is NATIVE expressions (regexp extraction
+ higher-order array functions + from_json) — zero Python, zero
Exchange; whole plans fuse into the page scan (plan-tested). The html
column is consumed inside the map and never rides a shuffle.

Input contract: pages with valid-UTF-8 html (the engine's PAGES shape;
run hygiene.decode_pages first on raw fetched bytes)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.links import (canonicalize_col,
                                                resolve_href_col)

__all__ = ["jsonld_col", "jsonld_objects", "jsonld_typed_records",
           "meta_entries_col",
           "page_meta", "canonical_url_col", "canonical_dedup",
           "robots_directives_col", "noindex_filter",
           "apply_meta_nofollow", "hreflang_entries",
           "language_variant_clusters",
           "race_events", "results_table_rows", "race_event_records"]

_JSONLD_RE = (r'(?is)<script[^>]*type\s*=\s*["\']application/ld\+json'
              r'["\'][^>]*>(.*?)</script>')
_META_TAG_RE = r"(?is)<meta\b[^>]*>"


def _attr(tag: Column, name_re: str) -> Column:
    """First ``name="..."`` / ``name='...'`` / unquoted ``name=...``
    attribute value on a tag fragment — real-world meta tags mix all
    three forms (unquoted is legal HTML for space-free values).

    The name must start the attribute: ``(?<![\\w-])`` rejects
    ``data-src``/``data-href`` (lazy-load markup puts them BEFORE the
    real attribute, and ``\\b`` treats the hyphen as a boundary)."""
    pre = r"(?<![\w-])"
    dq = F.regexp_extract(
        tag, rf'(?is){pre}(?:{name_re})\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(
        tag, rf"(?is){pre}(?:{name_re})\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(
        tag, rf"(?is){pre}(?:{name_re})\s*=\s*([^\s\"'>][^\s>]*)", 1)
    return F.when(dq != "", dq).otherwise(F.when(sq != "", sq)
                                          .otherwise(uq))


def jsonld_col(html: Column) -> Column:
    """html (string or valid-UTF-8 binary) -> array<string> of raw
    JSON-LD payloads, document order, whitespace-trimmed."""
    s = html.cast("string")
    # regex trim: SQL trim() strips only ' ', and blocks are usually
    # newline-wrapped inside their <script> tag
    return F.transform(
        F.regexp_extract_all(s, F.lit(_JSONLD_RE), 1),
        lambda b: F.regexp_replace(b, r"^\s+|\s+$", ""))


def jsonld_objects(pages: DataFrame, schema: str,
                   url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """Explode every JSON-LD block into a typed row:
    ``(url, block_idx, obj: schema)`` — ``schema`` is a DDL string for
    ``from_json`` (unparseable blocks yield a null ``obj``; callers
    filter). Pure map + explode over the page scan.

    ``from_json`` alone cannot signal failure (PERMISSIVE mode fills
    an all-null struct — indistinguishable from valid JSON missing
    every schema field), so validity is gated on the native
    ``try_parse_json`` (null iff the block is not JSON)."""
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.posexplode(jsonld_col(F.col(html_col)))
                    .alias("block_idx", "raw"))
            .select("url", "block_idx",
                    F.when(F.try_parse_json(F.col("raw")).isNotNull(),
                           F.from_json(F.col("raw"), schema))
                    .alias("obj")))


def jsonld_typed_records(pages: DataFrame, schema: str,
                         url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """Like ``jsonld_objects`` but tolerant of the two common publisher
    wrappers: a top-level ARRAY of records and an ``@graph`` envelope.
    Every JSON-LD block yields 0+ typed rows
    ``(url, block_idx, rec_idx, obj: schema)``; non-JSON blocks yield
    nothing (callers never see null objs). Pure map + two narrow
    explodes — html never leaves the page scan."""
    raw = F.col("raw")
    # @graph envelope -> its array; bare array -> itself; single
    # object -> wrapped in [] so one from_json covers all three.
    # The @graph branch is gated on the extracted value being a JSON
    # ARRAY (ADVICE r5): a dict-valued @graph is NOT an envelope — the
    # oracle keeps the outer dict as the (typeless, hence dropped)
    # record, and from_json would otherwise coerce the lone object
    # into a 1-element array and emit it. Known convention gap, by
    # design: non-object members of a record ARRAY ([{...}, "x"])
    # occupy a rec_idx here (null obj, filtered by typed consumers)
    # but are filtered before enumeration in oracle/events.py.
    graph_raw = F.get_json_object(raw, "$['@graph']")
    graph = F.when(F.startswith(F.ltrim(graph_raw), F.lit("[")),
                   graph_raw)
    arr = F.coalesce(
        graph,
        F.when(F.startswith(F.ltrim(raw), F.lit("[")), raw)
        .otherwise(F.concat(F.lit("["), raw, F.lit("]"))))
    # `arr` is staged into its own projection (round 6): the validity
    # gate + parse referenced it twice, re-running the @graph probe per
    # reference (these Projects are CodegenFallback territory where
    # common-subexpression elimination is unreliable)
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.posexplode(jsonld_col(F.col(html_col)))
                    .alias("block_idx", "raw"))
            .select("url", "block_idx", arr.alias("_arr"))
            .select("url", "block_idx",
                    F.when(F.try_parse_json(F.col("_arr")).isNotNull(),
                           F.from_json(F.col("_arr"),
                                       f"array<struct<{schema}>>"))
                    .alias("objs"))
            .filter(F.col("objs").isNotNull())
            .select("url", "block_idx",
                    F.posexplode("objs").alias("rec_idx", "obj")))


# schema.org types a race-event crawler keeps (reference README.md:1-2:
# the reference exists to scrape marathon/trail-race data; its per-page
# requests+LLM structuring is replaced here by typed JSON-LD mining —
# BASELINE.json:6)
_RACE_EVENT_TYPES = ("SportsEvent", "ExerciseEvent", "Event")
_EVENT_SCHEMA = ("`@type` string, name string, startDate string, "
                 "endDate string, url string, "
                 "location struct<name:string, address:string>, "
                 "distance string")


def _distance_km_col(d: Column) -> Column:
    """Race-distance string -> km double (3 dp): ``42.195 km``,
    ``10K``, ``26.2 mi``/``miles``, ``5000 m``; a bare number reads as
    km (the schema.org convention for running events is km-or-explicit
    unit). Unparseable/absent -> null."""
    num = F.regexp_extract(
        d, r"(?i)([0-9]+(?:\.[0-9]+)?)\s*(km|miles?|mi|k|m)?\b", 1)
    unit = F.lower(F.regexp_extract(
        d, r"(?i)([0-9]+(?:\.[0-9]+)?)\s*(km|miles?|mi|k|m)?\b", 2))
    factor = (F.when(unit.isin("mi", "mile", "miles"), F.lit(1.609344))
              .when(unit == "m", F.lit(0.001))
              .otherwise(F.lit(1.0)))  # km / K / bare number
    return F.when(num != "",
                  F.round(num.cast("double") * factor, 3))


def race_events(pages: DataFrame, url_col: str = "url",
                html_col: str = "html") -> DataFrame:
    """Typed race-event records from schema.org JSON-LD:
    ``(url, block_idx, rec_idx, event_type, event_name, start_date,
    location_name, distance_km)`` — one row per SportsEvent/
    ExerciseEvent/Event record on the page (other types are dropped).
    Native regex + from_json over the page scan: zero Python, zero
    Exchange; the 100 TB shape is a pure map stage."""
    recs = jsonld_typed_records(pages, _EVENT_SCHEMA, url_col, html_col)
    o = F.col("obj")
    return (recs
            .filter(o["@type"].isin(*_RACE_EVENT_TYPES))
            .select("url", "block_idx", "rec_idx",
                    o["@type"].alias("event_type"),
                    o["name"].alias("event_name"),
                    o["startDate"].alias("start_date"),
                    o["location"]["name"].alias("location_name"),
                    _distance_km_col(o["distance"]).alias("distance_km")))


_RESULTS_TABLE_RE = (r'(?is)<table\b[^>]*class\s*=\s*["\'][^"\']*'
                     r'\bresults\b[^"\']*["\'][^>]*>(.*?)</table>')
_TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"


def _cell_text(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"(?is)<[^>]*>", ""))


def _time_seconds_col(t: Column) -> Column:
    """``H:MM:SS`` / ``HH:MM:SS`` / ``MM:SS`` -> seconds (bigint);
    anything else (DNF, empty) -> null."""
    ok = t.rlike(r"^\d{1,2}:\d{2}(:\d{2})?$")
    p = F.split(t, ":")
    secs = F.when(
        F.size(p) == 3,
        p[0].cast("long") * 3600 + p[1].cast("long") * 60
        + p[2].cast("long")
    ).otherwise(p[0].cast("long") * 60 + p[1].cast("long"))
    return F.when(ok, secs)


def results_table_rows(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """Parse each page's ``<table class="...results...">`` into typed
    finisher rows ``(url, place:int, bib:string, runner:string,
    time_s:bigint)`` — the reference crawler's hand-scraped
    race-results payload as a declarative plan. Columns are matched BY
    HEADER (first ``<tr>``; ``place``/``bib``/``name``/``time``,
    case-insensitive), so column order is free; pages without a
    results table or a recognized header yield nothing.

    Shape: native regex chain + one explode — html is consumed inside
    the map, nothing but the typed rows leaves the scan."""
    s = F.col(html_col).cast("string")
    tbl = F.regexp_extract(s, _RESULTS_TABLE_RE, 1)
    cells = lambda r: F.transform(  # noqa: E731
        F.regexp_extract_all(r, F.lit(_CELL_RE), 1), _cell_text)

    # Round-6 staging: the table/row regex chain is extracted ONCE into
    # `_rows` — the old single projection re-derived the table regex
    # for the filter, the header and the explode (CodegenFallback, no
    # reliable CSE). The `tbl != ''` pre-filter is gone: a page whose
    # `_rows` is empty explodes into nothing, which is the same output
    # (and dodges the pushed-down-filter duplicate evaluation).
    staged = pages.select(
        F.col(url_col).alias("url"),
        F.regexp_extract_all(tbl, F.lit(_TR_RE), 1).alias("_rows"))
    rows = F.col("_rows")
    # try_element_at (not element_at): under ANSI mode (default-on in
    # Spark 4) element_at ABORTS the job on any out-of-range index — a
    # rows-less table here, a ragged data row (colspan, malformed HTML)
    # in col_at below. The oracle (oracle/events.py results_rows)
    # returns None for both shapes; try_element_at matches it.
    hdr = F.transform(cells(F.try_element_at(rows, F.lit(1))), F.lower)

    def col_at(row_cells: Column, name: str) -> Column:
        pos = F.array_position(hdr, name)
        return F.when(pos > 0,
                      F.try_element_at(row_cells, pos.cast("int")))

    parsed = (staged
              .select("url", hdr.alias("_hdr"),
                      F.explode(F.slice(
                          rows, 2, F.greatest(F.size(rows) - 1, F.lit(0))))
                      .alias("_row"))
              .select("url", "_hdr", cells(F.col("_row")).alias("_cells")))
    hdr = F.col("_hdr")  # rebind: after the explode, hdr is a real column
    return (parsed
            .select("url",
                    col_at(F.col("_cells"), "place").cast("int")
                    .alias("place"),
                    col_at(F.col("_cells"), "bib").alias("bib"),
                    col_at(F.col("_cells"), "name").alias("runner"),
                    _time_seconds_col(col_at(F.col("_cells"), "time"))
                    .alias("time_s"))
            .filter(F.col("place").isNotNull()))


def race_event_records(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """The reference's end product (README.md:2): one typed record per
    race-event page — JSON-LD event fields joined with the page's
    parsed results table, ``(url, event_name, start_date,
    location_name, distance_km, n_finishers, winner, winner_time_s)``.
    Pages with an event record but no results table keep nulls on the
    results side (left join); the results aggregate is a pre-grouped
    skinny frame, so the join shuffles only typed rows, never html."""
    ev = race_events(pages, url_col, html_col)
    res = results_table_rows(pages, url_col, html_col)
    agg = (res.groupBy("url")
           .agg(F.count("*").cast("long").alias("n_finishers"),
                F.min_by("runner", F.struct("place", "runner"))
                .alias("winner"),
                F.min_by("time_s", F.struct("place", "runner"))
                .alias("winner_time_s")))
    # the page's FIRST event-typed record in document order (a page may
    # lead with e.g. an Organization block that race_events drops — the
    # first surviving record is the event, whatever its block index)
    first = (ev.groupBy("url")
             .agg(F.min_by(
                 F.struct("event_name", "start_date", "location_name",
                          "distance_km"),
                 F.struct("block_idx", "rec_idx")).alias("_e"))
             .select("url", "_e.event_name", "_e.start_date",
                     "_e.location_name", "_e.distance_km"))
    return first.join(agg, "url", "left")


def meta_entries_col(html: Column) -> Column:
    """html -> array<struct<key,value>> of ``<meta name|property=...
    content=...>`` pairs, document order, attribute order free (content
    may precede name). Tags missing either attribute are skipped."""
    s = html.cast("string")
    tags = F.regexp_extract_all(s, F.lit(_META_TAG_RE), 0)
    entry = lambda t: F.struct(  # noqa: E731
        F.lower(_attr(t, "name|property")).alias("key"),
        _attr(t, "content").alias("value"))
    return F.filter(F.transform(tags, entry),
                    lambda e: (e["key"] != "") & (e["value"] != ""))


def page_meta(pages: DataFrame, url_col: str = "url",
              html_col: str = "html") -> DataFrame:
    """PAGES -> exploded ``(url, key, value)`` meta-tag rows — the
    join-friendly shape (no map-type dedup semantics to trip on when
    a page repeats a property; duplicates are preserved in document
    order). Pure map + explode, zero Exchange, zero Python."""
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.explode(meta_entries_col(F.col(html_col)))
                    .alias("e"))
            .select("url", F.col("e.key").alias("key"),
                    F.col("e.value").alias("value")))


_CANON_TAG_RE = (r'(?is)<link\b[^>]*\brel\s*=\s*["\']?canonical\b'
                 r"[^>]*>")


def canonical_url_col(page_url: Column, html: Column) -> Column:
    """First ``<link rel=canonical href=...>`` of the page, resolved
    against the page URL and run through the frontier's canonicalizer
    — null when the page declares none. Native regex chain, pure map."""
    tag = F.regexp_extract(html.cast("string"), _CANON_TAG_RE, 0)
    href = _attr(tag, "href")   # all three quote forms, one grammar
    # resolve_href_col's absolute test is case-sensitive by contract
    # (the link extractor's python-parity path); canonical hrefs in the
    # wild carry uppercase schemes, which the canonicalizer lowercases,
    # so absolutes bypass resolution here
    resolved = F.when(href.rlike(r"(?i)^https?://"), href) \
        .otherwise(resolve_href_col(page_url, href))
    return F.when(href != "", canonicalize_col(resolved))


def canonical_dedup(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Collapse URL-level duplicates onto the page's DECLARED canonical
    (the crawler-side dedup sites ask for: print/mobile/tracking
    variants all point their rel=canonical at one URL). Key =
    declared canonical, else the page's own URL; one survivor per key
    — the page whose url IS the key when captured, else min url (a
    total order, deterministic under any partitioning).

    Scale shape: one shuffle on the canonical key via the salted
    two-phase cap (a viral canonical target with millions of variants
    never funnels through a single window task); the html column rides
    the shuffle only as far as phase 1's per-salt survivor (one row
    per (key, salt))."""
    from data_crawler_spark.operators.sampling import cap_per_group

    keyed = pages.withColumn(
        "_ckey", F.coalesce(
            canonical_url_col(F.col(url_col), F.col(html_col)),
            F.col(url_col)))
    out = cap_per_group(
        keyed, "_ckey", 1,
        order_by=[F.desc(F.col(url_col) == F.col("_ckey"))],
        id_col=url_col)
    return out.drop("_ckey")


_ROBOTS_META_RE = (r'(?is)<meta\b[^>]*\bname\s*=\s*["\']?robots\b'
                   r"[^>]*>")


def robots_directives_col(html: Column) -> Column:
    """Page-level robots ``<meta name=robots content="...">``
    directives -> ``struct<noindex:boolean, nofollow:boolean>``.

    Publishers gate indexing/link-following per PAGE this way (the
    REP's HTML half next to the per-HOST robots.txt); corpus pipelines
    honor ``noindex`` as "do not keep this content" and ``nofollow``
    as "discard this page's outlinks". Semantics per the de-facto
    spec: directives are comma-separated and case-insensitive,
    ``none`` == ``noindex, nofollow``, MULTIPLE robots meta tags
    combine most-restrictive-wins (any tag asserting a directive sets
    it). Native regex + higher-order exists — pure map, the html never
    leaves the scan."""
    s = html.cast("string")
    tags = F.regexp_extract_all(s, F.lit(_ROBOTS_META_RE), 0)
    toks = F.flatten(F.transform(
        tags,
        lambda t: F.split(F.lower(_attr(t, "content")), r"\s*,\s*")))
    has = lambda d: F.exists(toks, lambda x: F.trim(x) == d)  # noqa: E731
    none = has("none")
    return F.struct(
        (has("noindex") | none).alias("noindex"),
        (has("nofollow") | none).alias("nofollow"))


def noindex_filter(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta asserts ``noindex`` (or ``none``)
    — the publisher opt-out a webtext pipeline must honor before any
    content lands in a training corpus. Pure map over the page scan
    (zero Exchange / zero Python, plan-tested)."""
    return pages.filter(
        ~robots_directives_col(F.col(html_col))["noindex"])


def apply_meta_nofollow(edges: DataFrame, pages: DataFrame,
                        src_col: str = "src",
                        url_col: str = "url",
                        html_col: str = "html") -> DataFrame:
    """Drop every outlink whose SOURCE page asserts page-level
    ``nofollow`` (``<meta name=robots>``) — the page-granular
    complement to ``anchors.page_anchors``' per-occurrence
    ``rel=nofollow`` flag. The nofollow page set is tiny next to the
    corpus (most pages carry no robots meta), so the shape is a
    left-anti join of the edge stream against the FILTERED page urls:
    the html never leaves the page scan, the edge stream shuffles only
    if AQE declines to broadcast the nofollow set."""
    nf = (pages
          .filter(robots_directives_col(F.col(html_col))["nofollow"])
          .select(F.col(url_col).alias("_nf_src")))
    return (edges.join(nf, edges[src_col] == nf["_nf_src"], "left_anti"))


_LINK_TAG_RE = r"(?is)<link\b[^>]*>"


def hreflang_entries(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """Per-page language alternates: every ``<link rel=alternate
    hreflang=... href=...>`` as ``(url, hreflang, alt_url)`` rows —
    hreflang lowercased (BCP 47 tags incl. ``x-default``), href
    resolved against the page URL and run through the frontier's
    canonicalizer. ``rel`` must carry the token ``alternate``
    (token-list match — ``rel="alternate stylesheet"`` without
    hreflang never gets here because hreflang is required non-empty).
    Native regex + explode, pure map + one narrow explode — html
    never leaves the scan."""
    s = F.col(html_col).cast("string")
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.regexp_extract_all(s, F.lit(_LINK_TAG_RE), 0))
        .alias("tag"))
    rel = F.lower(_attr(F.col("tag"), "rel"))
    hl = F.lower(_attr(F.col("tag"), "hreflang"))
    href = _attr(F.col("tag"), "href")
    resolved = F.when(href.rlike(r"(?i)^https?://"), href) \
        .otherwise(resolve_href_col(F.col("url"), href))
    return (tags
            .filter(rel.rlike(r"(^|\s)alternate(\s|$)")
                    & (hl != "") & (href != ""))
            .select("url", hl.alias("hreflang"),
                    canonicalize_col(resolved).alias("alt_url")))


def language_variant_clusters(pages: DataFrame, url_col: str = "url",
                              html_col: str = "html",
                              max_iter: int = 25) -> DataFrame:
    """Group pages that are language variants of one another —
    ``(url, cluster_id)`` where cluster_id is the min URL in the
    hreflang-connected component (pages declaring no alternates are
    singletons). Translations are invisible to textual near-dup (zero
    shingle overlap across languages) yet are the same *content* —
    this is the explicit publisher-declared signal a multilingual
    corpus uses for language-balanced sampling (cap per cluster, not
    per page) and leakage-free splits (a cluster never straddles
    train/eval).

    Cluster over the union of captured URLs and all declared alt
    URLs, so two captured variants still land in one cluster when
    only a third, uncaptured variant links them both. Edges are the
    tiny hreflang pair set; components converge in O(log diameter)
    pointer-jumping rounds (dedup.connected_components); the page
    table contributes only its url column."""
    from data_crawler_spark.operators.dedup import connected_components

    entries = hreflang_entries(pages, url_col, html_col)
    caught = pages.select(F.col(url_col).alias("url"))
    vertices = (caught
                .unionByName(entries.select("url"))
                .unionByName(entries.select(F.col("alt_url").alias("url")))
                .distinct())
    edges = (entries.filter(F.col("url") != F.col("alt_url"))
             .select(F.col("url").alias("id_a"),
                     F.col("alt_url").alias("id_b"))
             .distinct())
    comps = connected_components(vertices, edges, id_col="url",
                                 max_iter=max_iter)
    # report clusters for the CAPTURED pages (alt-only vertices served
    # to connect components; they are not corpus rows)
    return comps.join(caught, "url", "left_semi")
