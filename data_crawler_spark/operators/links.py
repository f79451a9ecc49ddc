"""Link discovery: href resolution + URL parsing as NATIVE column
expressions (SURVEY.md §2 ops 05/06/43).

Resolution runs JVM-side (whole-stage codegen) because at 10^10-URL
scale the exploded link table is the biggest intermediate in a round;
only canonicalization crosses into a pandas UDF. The pure-Python
mirror of this exact logic is functions/canonicalize.resolve_href and
tests assert both agree on every generated link.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROOT_RE = r"^(https?://[^/?#]+)"
_BASEDIR_RE = r"^(https?://.*/)[^/]*$"


def resolve_href_col(base: Column, href: Column) -> Column:
    """Absolute URL for ``href`` found on page ``base`` (native exprs;
    byte-identical to functions.canonicalize.resolve_href — parity-
    fuzzed). Protocol-relative ``//host/p`` inherits the base scheme;
    an href carrying any OTHER scheme (mailto:, javascript:, ftp:) is
    returned untouched so is_http_col drops it — gluing it onto the
    base path minted bogus same-host URLs that polluted the
    frontier."""
    root = F.regexp_extract(base, _ROOT_RE, 1)
    basedir = F.regexp_extract(base, _BASEDIR_RE, 1)
    scheme = F.regexp_extract(base, r"^([a-z][a-z0-9+.\-]*):", 1)
    prefix = F.when(basedir != "", basedir).otherwise(F.concat(root, F.lit("/")))
    return (
        F.when(href.startswith("http://") | href.startswith("https://"), href)
        .when(root == "", href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), href)
        .when(href.startswith("/"), F.concat(root, href))
        .otherwise(F.concat(prefix, href))
    )


def host_col(url: Column) -> Column:
    """host[:port] of a canonical URL — same regex as host_of_series."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)


def scheme_col(url: Column) -> Column:
    """scheme of a canonical URL ('' when malformed)."""
    return F.regexp_extract(url, r"^([a-z][a-z0-9+.\-]*)://", 1)


def after_authority_col(url: Column) -> Column:
    """everything past scheme://authority — path + query, byte-exact
    (the piece a host/scheme rewrite must carry over unchanged)."""
    return F.regexp_replace(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]*", "")


def path_col(url: Column) -> Column:
    """path ('/' if empty) of a canonical URL — mirror of path_of_series."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def is_http_col(url: Column) -> Column:
    return url.startswith("http://") | url.startswith("https://")


# Known non-HTML asset extensions (the Nutch/Heritrix-style default
# suffix blocklist, public knowledge): a text crawl drops these from
# the frontier BEFORE they consume fetch budget; a media crawl routes
# them to the multimodal path instead. Deny-SET gating keeps the
# extension heuristic safe — "/release/v1.2" parses extension "2",
# which is simply not in the set.
ASSET_EXTENSIONS = frozenset({
    # images
    "gif", "jpg", "jpeg", "png", "bmp", "webp", "ico", "svg", "tif",
    "tiff", "avif", "heic",
    # audio / video
    "mp3", "wav", "ogg", "oga", "flac", "aac", "m4a", "mid",
    "mp4", "m4v", "mkv", "avi", "mov", "wmv", "flv", "webm", "mpg",
    "mpeg", "3gp",
    # styles / scripts / fonts
    "css", "js", "mjs", "woff", "woff2", "ttf", "otf", "eot",
    # archives / packages / binaries
    "zip", "gz", "tgz", "bz2", "xz", "7z", "rar", "tar", "jar", "war",
    "exe", "bin", "dmg", "iso", "apk", "msi", "deb", "rpm", "swf",
    # documents (non-HTML)
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx", "odt", "ods",
    "odp", "ps", "eps", "epub",
})


def url_extension_col(url: Column) -> Column:
    """Lowercased filename extension of a URL's path's last segment
    ('' when none): the token after the final '.' of the final '/'
    segment, 1-6 chars of [a-z0-9]. Query/fragment never contribute
    (path_col excludes them); a trailing-slash or extensionless path
    yields ''. Pure map — safe to apply to the full frontier stream."""
    seg = F.element_at(F.split(path_col(url), "/"), -1)
    return F.lower(F.regexp_extract(seg, r"\.([A-Za-z0-9]{1,6})$", 1))


def asset_url_filter(candidates: DataFrame, url_col: str = "url",
                     extensions: frozenset[str] = ASSET_EXTENSIONS,
                     keep_assets: bool = False) -> DataFrame:
    """Gate frontier candidates on known non-HTML asset extensions —
    the cheapest fetch-budget saver a text crawl has (every dropped
    .jpg/.zip is a politeness slot given to a page that can yield
    text or links). ``keep_assets=True`` inverts the gate, SELECTING
    asset URLs — the discovery feed for a media/multimodal crawl.

    Pure map over the candidate stream (an in-set check against a
    literal array; zero Exchange / zero Python): content-type is not
    known before the fetch, so extension gating is the pre-fetch
    heuristic and ``hygiene.media_class_col`` (on the fetched
    Content-Type) is the post-fetch truth."""
    ext = url_extension_col(F.col(url_col))
    is_asset = ext.isin(*sorted(extensions)) if extensions else F.lit(False)
    return candidates.filter(is_asset if keep_assets else ~is_asset)


# Second-level labels that act as public suffixes under a 2-letter
# country TLD (the tldextract-style fallback heuristic: "bbc.co.uk"
# registers at three labels, "example.de" at two). A deliberate
# HEURISTIC subset of the public-suffix list — the full PSL is a
# runtime data file this sandbox doesn't ship; the seam to swap it in
# is this one tuple.
_PSL_SLD = ("co", "com", "net", "org", "ac", "gov", "edu", "mil", "sch")


def registered_domain_col(url_or_host: Column,
                          is_host: bool = False) -> Column:
    """Registrable domain of a URL (or bare host with
    ``is_host=True``): the unit crawl budgets, host reputation, and
    leakage-free train/val splits group on (every subdomain of one
    site shares it). ``a.b.example.co.uk`` -> ``example.co.uk``;
    ``www.example.com`` -> ``example.com``; IPs/single-label hosts
    pass through. Pure native expressions — no Python, no lookup
    join."""
    host = url_or_host if is_host else host_col(url_or_host)
    host = F.regexp_replace(host, r":\d+\z", "")  # strip port
    # a trailing FQDN dot would leave an empty last label, collapsing
    # every 'x.<anything>.com.' host into the pseudo-domain 'com.'
    host = F.regexp_replace(host, r"\.\z", "")
    is_ip = host.rlike(r"\A\d+\.\d+\.\d+\.\d+\z")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    take3 = ((n >= F.lit(3))
             & F.element_at(labels, -2).isin(*_PSL_SLD)
             & (F.length(F.element_at(labels, -1)) == 2))
    return (
        F.when(is_ip | (n <= 2), host)
        .when(take3, F.array_join(F.slice(labels, -3, 3), "."))
        .otherwise(F.array_join(F.slice(labels, -2, 2), "."))
    )


# ---------------------------------------------------------------------------
# Native canonicalizer (SURVEY.md §2 op 05, JVM fast path).
#
# Byte-identical mirror of functions/canonicalize.canonicalize_series —
# the executable spec shared with the oracle — re-expressed as Catalyst
# expressions so the crawl's hottest pipeline (every exploded link,
# every round) never crosses into a Python worker: at web10m/local[32]
# the pandas-UDF canonicalizer was ~155 CPU-seconds per round (~40% of
# round compute). Parity is enforced by tests/test_canonicalize.py
# (spec cases, hypothesis fuzz, and full generated-link corpus).
#
# Regex translation notes (Python `re` -> Java):
#   - the spec anchors with Python \Z (absolute end) == Java \z
#     (Java's \Z is the one that accepts a final line terminator).
#   - Python non-DOTALL `.` == `[^\n]`; Java `.` additionally excludes
#     \r, U+0085, U+2028, U+2029 — so the spec's query group `(.*)` is
#     spelled `([^\n]*)` here. (?s) `.` matches everything in both.
#   - pandas .str.strip() strips Py_UNICODE_ISSPACE (Unicode
#     White_Space plus \x1c-\x1f), not just ASCII space — hence _WS.
# The dot-segment fixed-point loop of the spec is equivalent to the
# classic RFC 3986 remove_dot_segments stack fold ('' and '.' skip,
# '..' pops or, unpoppable at the path start, is dropped; '..' itself
# is never pushed, matching the spec's `(?!\.\.(?:/|\Z))` guard) —
# implemented with split + aggregate(). Equivalence is fuzz-tested
# over 130k adversarial inputs plus the full generated-link corpus
# (tests/test_canonicalize.py).
# ---------------------------------------------------------------------------

_WS = r"[\p{IsWhite_Space}\x1c-\x1f]"
_NATIVE_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?]*)(?:\?([^\n]*))?\z"


def _strip_col(c: Column) -> Column:
    return F.regexp_replace(c, f"^{_WS}+|{_WS}+$", "")


def canonicalize_col(x: Column) -> Column:
    """Native mirror of ``canonicalize_series`` (nulls stay null)."""
    u = _strip_col(F.regexp_replace(_strip_col(x), r"(?s)#.*", ""))

    ok = u.rlike(_NATIVE_URL_RE)
    scheme = F.lower(F.regexp_extract(u, _NATIVE_URL_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _NATIVE_URL_RE, 2))
    raw_path = F.regexp_extract(u, _NATIVE_URL_RE, 3)
    query = F.regexp_extract(u, _NATIVE_URL_RE, 4)

    # strip the whole trailing default-port RUN (mirror of the spec):
    # "h.io:80:80" canonicalizes in one pass; ":8080" untouched
    hostport = (
        F.when(scheme == "http",
               F.regexp_replace(hostport, r"(?::80)+\z", ""))
        .when(scheme == "https",
              F.regexp_replace(hostport, r"(?::443)+\z", ""))
        .otherwise(hostport)
    )

    # remove_dot_segments as a stack fold over '/'-split segments (the
    # URL_RE path group always starts with '/' or is empty; '..' never
    # survives on the stack, so an unpoppable '..' is simply dropped —
    # the spec's leading-'/..' strip). Rows WITH a query keep their
    # path bytes verbatim beyond this fold.
    segs = F.split(raw_path, "/", -1)
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when((s == "") | (s == "."), acc)
            .when(s == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    path_q = F.when(F.size(folded) == 0, F.lit("/")).otherwise(
        F.concat(F.lit("/"), F.array_join(folded, "/")))

    # QUERYLESS rows: the query/fragment is gone, so the path's
    # trailing whitespace is terminal junk — and junk shedding must
    # interleave with dot handling ("/. " hides a dot segment behind a
    # space; "/a/.. " hides a pop). The spec iterates regex rules to a
    # fixed point; the native mirror is a single RIGHT-to-left fold
    # with three zones: in the pure TERMINAL zone (nothing kept yet,
    # no pending pops) a segment is judged on its whitespace-rstripped
    # form (''/'.' skip, '..' counts a pop, ordinary kept RSTRIPPED);
    # with pops pending, segments are judged RAW — the spec's '/X/../'
    # rule consumes the literal previous segment, whitespace-only or
    # not — and after the first keep, interior segments are judged and
    # kept with their original bytes (interior whitespace is content).
    # Fuzz-tested byte-equal to the spec loop
    # (tests/test_canonicalize.py).
    zero = F.struct(F.lit(0).cast("int").alias("pops"),
                    F.lit(False).alias("took"),
                    F.array().cast("array<string>").alias("acc"))

    def _rstep(st, s):
        t = F.regexp_replace(s, f"{_WS}+\\z", "")
        pre0 = ~st["took"] & (st["pops"] == 0)
        j = F.when(pre0, t).otherwise(s)  # judged form per zone
        skip = (j == "") | (j == ".")
        pop = j == ".."
        ordinary = ~skip & ~pop
        consumed = ordinary & (st["pops"] > 0)
        keep = ordinary & ~consumed
        kept_val = F.when(pre0, t).otherwise(s)
        return F.struct(
            (F.when(pop, st["pops"] + 1)
             .when(consumed, st["pops"] - 1)
             .otherwise(st["pops"])).cast("int").alias("pops"),
            (st["took"] | keep).alias("took"),
            F.when(keep, F.concat(st["acc"], F.array(kept_val)))
            .otherwise(st["acc"]).alias("acc"),
        )

    kept = F.reverse(F.aggregate(F.reverse(segs), zero, _rstep)["acc"])
    path_noq = F.when(F.size(kept) == 0, F.lit("/")).otherwise(
        F.concat(F.lit("/"), F.array_join(kept, "/")))

    path = F.when(query != "", path_q).otherwise(path_noq)
    res = F.concat(scheme, F.lit("://"), hostport, path)
    res = F.when(query != "",
                 _strip_col(F.concat(res, F.lit("?"), query))).otherwise(res)
    return F.when(ok, res).otherwise(u)


def url_struct_col(url: Column) -> Column:
    """op 06: url -> struct(scheme, host, path, query)."""
    return F.struct(
        F.regexp_extract(url, r"^([a-z][a-z0-9+.\-]*)://", 1).alias("scheme"),
        host_col(url).alias("host"),
        path_col(url).alias("path"),
        F.regexp_extract(url, r"\?([^#]*)", 1).alias("query"),
    )


# ---------------------------------------------------------------------------
# URL / domain blocklist filtering (RefinedWeb-style pre-filter)
# ---------------------------------------------------------------------------

def host_suffixes_col(host: Column) -> Column:
    """Every dot-boundary suffix of a host, longest first:
    ``a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com]`` — the set a domain blocklist entry can match at (exact host
    or any parent domain). Port, if present, stays on the full-host
    entry only (``h:8080`` suffixes are computed on the host part)."""
    low = F.lower(host)
    h = F.regexp_replace(low, r":\d+$", "")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    sufs = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."))
    # the docstring's contract: a ported entry ('evil.com:8080') is
    # matchable as the exact host — prepend it when a port exists
    return F.when(low != h, F.concat(F.array(low), sufs)).otherwise(sufs)


def host_blocklist_filter(df, blocklist, url_col: str = "url",
                          match_subdomains: bool = True):
    """Drop rows whose URL host is on a domain blocklist — the URL-level
    pre-filter every published webtext pipeline runs before content
    filters (RefinedWeb §3.1 runs a 4.6M-domain list). A blocklist
    entry matches the exact host and, with ``match_subdomains`` (the
    standard semantics), every subdomain of it.

    ``blocklist`` is either a Python iterable of domains (list-sized
    blocklists: compiled into a literal array, the filter is a PURE MAP
    over the scan — zero exchange) or a one-column DataFrame (the
    millions-of-domains regime: the corpus's (url, suffix) rows stream
    into a BROADCAST semi-join, the matched url set comes back as an
    anti-join — the corpus itself is never shuffled, the same shape as
    decontaminate)."""
    from pyspark.sql import DataFrame as _DF

    u = F.lower(F.col(url_col))
    sufs = F.when(is_http_col(u), host_suffixes_col(host_col(u))) \
            .otherwise(F.expr("array()").cast("array<string>"))
    # exact-host mode matches the host in BOTH forms — ported entry
    # ('evil.com:8080', suffix 1 when a port exists) and port-stripped
    # — but never the parent domain
    exact = F.filter(
        sufs, lambda d, i: (i == 0)
        | ((i == 1) & F.get(sufs, 0).contains(":")))
    if isinstance(blocklist, _DF):
        bl_col = blocklist.columns[0]
        bl = (blocklist.select(F.lower(F.col(bl_col)).alias("_dom"))
              .distinct())
        if not match_subdomains:
            sufs = exact
        hits = (df.select(F.col(url_col).alias("_u"),
                          F.explode(sufs).alias("_dom"))
                .join(F.broadcast(bl), "_dom", "left_semi")
                .select(F.col("_u").alias(url_col)).distinct())
        return df.join(hits, url_col, "left_anti")
    domains = F.array(*[F.lit(str(d).lower()) for d in blocklist])
    if not match_subdomains:
        hit = F.arrays_overlap(exact, domains)
    else:
        hit = F.arrays_overlap(sufs, domains)
    return df.filter(~F.coalesce(hit, F.lit(False)))


def _decode_entities(u: Column) -> Column:
    """The five predefined XML entities, ``&amp;`` LAST (amp-first
    would double-unescape a value literally containing ``&lt;``)."""
    for ent, ch in (("&apos;", "'"), ("&quot;", '"'),
                    ("&gt;", ">"), ("&lt;", "<"), ("&amp;", "&")):
        u = F.replace(u, F.lit(ent), F.lit(ch))
    return u


def parse_sitemap_col(xml: Column) -> Column:
    """URL array from a sitemap.xml (or sitemap-index) document: the
    ``<loc>`` elements, whitespace-trimmed, with the five predefined
    XML entities decoded (sitemaps escape URLs per the protocol at
    sitemaps.org; ``&amp;`` decodes LAST — amp-first would
    double-unescape a URL that literally contains ``&lt;``). One
    native regexp_extract_all + transform chain — no XML library, no
    Python; the seam between a fetched sitemap page table and the
    seed/frontier source."""
    # (?is): uppercase <LOC> tags must parse identically to
    # sitemap_entries' case-insensitive grammar
    locs = F.regexp_extract_all(
        xml, F.lit(r"(?is)<loc>\s*(.*?)\s*</loc>"), 1)
    return F.transform(locs, _decode_entities)


def sitemap_urls(sitemaps: DataFrame, xml_col: str = "sitemap_xml",
                 url_col: str = "url") -> DataFrame:
    """Explode a per-host sitemap page table into (source url,
    discovered url) rows, http(s)-filtered and canonicalized with the
    SAME canonicalize_col the frontier keys on — ready to union into
    the seed list or the discovered-link stream. Pure map + explode,
    zero shuffle."""
    return (sitemaps
            .select(F.col(url_col).alias("sitemap_url"),
                    F.explode(parse_sitemap_col(F.col(xml_col)))
                    .alias("raw"))
            .select("sitemap_url",
                    canonicalize_col(F.col("raw")).alias("url"))
            # filter the CANONICAL form: HTTP://A.com normalizes to a
            # valid http url and must survive
            .filter(is_http_col(F.col("url"))))


def sitemap_entries(sitemaps: DataFrame, xml_col: str = "sitemap_xml",
                    url_col: str = "url") -> DataFrame:
    """Full per-``<url>``-block sitemap parse: ``(sitemap_url, url,
    lastmod, changefreq, priority)`` — the scheduling metadata
    sitemaps.org defines beyond the bare locs (``sitemap_urls`` stays
    the cheap seed path). lastmod try_casts to timestamp (W3C
    datetimes are ISO-8601; date-only forms cast too), priority to
    double, malformed values null. Same canonicalizer + http(s)
    filter as the frontier; same native regex chain, pure map +
    explode, zero Exchange / zero Python.

    Feeds ``freshness.recrawl_priority`` (lastmod/changefreq are the
    publisher's own change-rate claim) and ``schedule_per_host``'s
    priority column."""
    blocks = F.regexp_extract_all(F.col(xml_col),
                                  F.lit(r"(?is)<url\b[^>]*>(.*?)</url>"), 1)

    def field(b: Column, tag: str) -> Column:
        return F.regexp_extract(b, rf"(?is)<{tag}>\s*(.*?)\s*</{tag}>", 1)

    def entry(b: Column) -> Column:
        return F.struct(
            field(b, "loc").alias("loc"),
            field(b, "lastmod").alias("lastmod"),
            F.lower(field(b, "changefreq")).alias("changefreq"),
            field(b, "priority").alias("priority"))

    e = F.col("e")
    return (sitemaps
            .select(F.col(url_col).alias("sitemap_url"),
                    F.explode(F.transform(blocks, entry)).alias("e"))
            .select(
                "sitemap_url",
                canonicalize_col(_decode_entities(e["loc"])).alias("url"),
                e["lastmod"].try_cast("timestamp").alias("lastmod"),
                F.when(e["changefreq"] != "", e["changefreq"])
                .alias("changefreq"),
                e["priority"].try_cast("double").alias("priority"))
            .filter(is_http_col(F.col("url"))))


def url_template_col(url: Column) -> Column:
    """Structural URL template for trap mining: path + sorted query
    KEYS with every digit run and every >=8-char hex run collapsed to
    ``#`` — calendar pages, pagination, session ids and content hashes
    all fold onto one template per generator. Native expressions only."""
    path = path_col(url)
    q = F.regexp_extract(url, r"\?([^#]*)", 1)  # first ?, fragment off
    keys = F.array_sort(F.transform(
        F.filter(F.split(q, "&"), lambda p: F.length(p) > 0),
        lambda p: F.substring_index(p, "=", 1)))
    shape = F.regexp_replace(path, r"[0-9a-fA-F]{8,}", "#")
    shape = F.regexp_replace(shape, r"[0-9]+", "#")
    return F.concat(shape, F.lit("?"), F.array_join(keys, "&"))


def spider_trap_templates(candidates: DataFrame, url_col: str = "url",
                          host_col: str = "host",
                          max_urls_per_template: int = 1000) -> DataFrame:
    """Mine (host, template) groups whose URL count explodes past
    ``max_urls_per_template`` — the classic spider-trap signature (one
    generator minting unbounded distinct URLs: calendars, faceted
    search, session tokens). DISTINCT URLs per template — duplicate
    discoveries of one popular URL are endorsements, not a trap — via
    Spark's two-stage distinct aggregate over the frontier; output is
    O(distinct templates) rows with ``trap`` flagged. Thread the flagged frame into ``trap_filter`` to cap the
    frontier's exposure before scheduling."""
    t = url_template_col(F.col(url_col))
    return (candidates
            .groupBy(F.col(host_col).alias("host"),
                     t.alias("template"))
            .agg(F.count_distinct(F.col(url_col)).alias("n_urls"))
            .withColumn("trap",
                        F.col("n_urls") > F.lit(max_urls_per_template)))


def trap_filter(candidates: DataFrame, traps: DataFrame,
                url_col: str = "url",
                host_col: str = "host") -> DataFrame:
    """Drop candidates whose (host, template) is a flagged trap — a
    broadcast anti-join on the tiny trap frame (traps are by
    definition few templates, however many URLs they mint), so the
    frontier itself never shuffles."""
    flagged = F.broadcast(
        traps.filter("trap")
        .select(F.col("host").alias(host_col),
                F.col("template").alias("_trap_template")))
    keyed = candidates.withColumn("_trap_template",
                                  url_template_col(F.col(url_col)))
    return (keyed.join(flagged, [host_col, "_trap_template"], "left_anti")
            .drop("_trap_template"))


# ---------------------------------------------------------------------------
# RSS / Atom feed discovery (the sitemap path's sibling seed source)
# ---------------------------------------------------------------------------

def parse_feed_col(xml: Column) -> Column:
    """URL array from an RSS 2.0 or Atom feed document — the freshness
    side of seed discovery (feeds announce NEW pages the moment they
    publish; sitemaps enumerate the backlog). Three published places a
    feed carries URLs, all extracted natively (no XML library, no
    Python):

    - RSS ``<link>url</link>`` element text (only BARE ``<link>``
      opens the text form: an Atom self-closing ``<link href=…/>``
      followed later by a text link would otherwise span the gap and
      capture garbage),
    - Atom ``<link … href="…">`` attributes (double- or single-quoted
      — feeds are XML, so attribute values are always quoted),
    - RSS ``<guid>`` permalinks (``isPermaLink`` defaults to true per
      the RSS 2.0 spec; an explicit ``false`` marks an opaque id,
      skipped — and non-URL guids die at the http filter anyway).

    The five predefined XML entities decode last, ``&amp;`` last of
    all (the sitemap parser's rule, shared via ``_decode_entities``).
    """
    text_links = F.regexp_extract_all(
        xml, F.lit(r"(?is)<link\s*>\s*(.*?)\s*</link>"), 1)
    hrefs_dq = F.regexp_extract_all(
        xml, F.lit(r'(?is)<link\b[^>]*\bhref\s*=\s*"([^"]*)"'), 1)
    hrefs_sq = F.regexp_extract_all(
        xml, F.lit(r"(?is)<link\b[^>]*\bhref\s*=\s*'([^']*)'"), 1)
    guid_tags = F.regexp_extract_all(
        xml, F.lit(r"(?is)<guid\b[^>]*>\s*.*?\s*</guid>"), 0)
    guids = F.transform(
        F.filter(guid_tags,
                 lambda t: ~t.rlike(
                     r"""(?is)isPermaLink\s*=\s*["']\s*false""")),
        lambda t: F.regexp_extract(t, r"(?is)<guid\b[^>]*>\s*(.*?)\s*</guid>",
                                   1))
    all_raw = F.concat(text_links, hrefs_dq, hrefs_sq, guids)
    return F.transform(all_raw, _decode_entities)


def feed_urls(feeds: DataFrame, xml_col: str = "feed_xml",
              url_col: str = "url") -> DataFrame:
    """Explode a fetched feed page table into (feed_url, discovered
    url) rows, canonicalized with the SAME canonicalize_col the
    frontier keys on and http(s)-filtered on the canonical form —
    drop-in alongside ``sitemap_urls`` for the seed/discovered-link
    stream. Pure map + explode, zero shuffle."""
    return (feeds
            .select(F.col(url_col).alias("feed_url"),
                    F.explode(parse_feed_col(F.col(xml_col)))
                    .alias("raw"))
            .select("feed_url",
                    canonicalize_col(F.col("raw")).alias("url"))
            .filter(is_http_col(F.col("url"))))
