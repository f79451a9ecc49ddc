"""CDX capture index + SURT keys — the web-archive lookup seam.

Public web archives (Internet Archive, Common Crawl's cc-index) locate
captures through a CDX index: one row per (page, capture time), keyed
by the URL's SURT form (Sort-friendly URI Reordering Transform —
host labels reversed and comma-joined, ``com,example)/path?q``) so a
lexicographic sort co-locates every capture of a site/prefix. This
module builds that index over the engine's ``PAGES`` table and serves
the two standard queries: exact-URL time-travel ("the capture of u as
of t") and SURT-prefix range scans ("everything under
``com,example)``").

Scale shape: the index build is one projection + one range-partitioned
sort (the same total-order machinery as the crawl sort, op 26); the
sorted layout means a 100 TB archive's lookups are partition-prunable
range scans, and the as-of join broadcasts the (small) query side so
the index itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.links import (
    canonicalize_col,
    host_col,
    path_col,
)


def surt_col(url: Column, canonicalize: bool = True,
             strip_www: bool = True) -> Column:
    """URL -> SURT key: ``https://www.Example.com:8080/a/b?q=1`` ->
    ``com,example:8080)/a/b?q=1``.

    Scheme dropped; host lowercased (via the op-05 canonicalizer),
    labels reversed and comma-joined; a single leading ``www`` label
    stripped (the IA default); any explicit non-default port rides
    after the reversed host; path and query verbatim from the
    canonical form. Pure native expressions — zero Exchange, zero
    Python."""
    u = canonicalize_col(url) if canonicalize else url
    hostport = host_col(u)
    host = F.regexp_replace(hostport, r":\d+\z", "")
    port = F.regexp_extract(hostport, r"(:\d+)\z", 1)
    if strip_www:
        host = F.regexp_replace(host, r"\Awww\.(?=.)", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    key = F.concat(rev, port, F.lit(")"), path_col(u))
    return F.when(query == "", key).otherwise(
        F.concat(key, F.lit("?"), query))


def cdx_index(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", html_col: str = "html") -> DataFrame:
    """PAGES -> sorted CDX index
    ``(surt_key, warc_ts, url, digest, length)``.

    digest is the content SHA-1 hex (the CDX convention; revisit
    detection = same digest at a later ts). Globally ordered by
    (surt_key, warc_ts): range exchange + in-partition sort, so the
    written index is binary-searchable / prefix-prunable. One pass
    over the page scan, one exchange total."""
    return (
        pages.select(
            surt_col(F.col(url_col)).alias("surt_key"),
            F.col(ts_col).alias("warc_ts"),
            F.col(url_col).alias("url"),
            F.sha1(F.col(html_col)).alias("digest"),
            F.length(F.col(html_col)).cast("long").alias("length"),
        )
        .orderBy("surt_key", "warc_ts")
    )


def cdx_lookup_asof(index: DataFrame, queries: DataFrame,
                    asof, url_col: str = "url") -> DataFrame:
    """Latest capture per queried URL with ``warc_ts <= asof``
    (time-travel). The query side is broadcast (lookups are small by
    nature); the index never shuffles — matching rows reduce through
    a map-side-partial max_by."""
    q = queries.select(
        F.col(url_col).alias("_q_url"),
        surt_col(F.col(url_col)).alias("_q_surt"))
    hits = index.join(
        F.broadcast(q), index["surt_key"] == q["_q_surt"], "inner"
    ).where(F.col("warc_ts") <= F.lit(asof))
    cap = F.struct("surt_key", "warc_ts", "url", "digest", "length")
    return (
        hits.groupBy("_q_url")
        # tie-break same-ts captures on the row values (two URLs can
        # share a SURT key — scheme is dropped), the siblings' rule
        .agg(F.max_by(cap, F.struct(F.col("warc_ts"), cap)).alias("cap"))
        .select(F.col("_q_url").alias("query_url"), "cap.*")
    )


def cdx_revisits(index: DataFrame) -> DataFrame:
    """Revisit detection — the web-archive dedup signal: a capture
    whose content digest already appeared at an EARLIER ts for the
    same SURT key stores no payload in a deduplicated archive, only a
    pointer to the original. Emits those recaptures with
    ``original_ts`` (the first capture of that digest).

    One hash exchange on (surt_key, digest) — the window key — and
    ties at identical ts break deterministically (the co-timed capture
    set beyond the first is revisits)."""
    from pyspark.sql import Window

    w = (Window.partitionBy("surt_key", "digest")
         .orderBy("warc_ts", "url"))
    return (
        index
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("original_ts", F.first("warc_ts").over(w))
        .where(F.col("_rn") > 1)
        .drop("_rn")
    )


def cdx_prefix_scan(index: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (``com,example)`` = the whole
    site) — a pure range predicate on the sort key, so a parquet- or
    bucket-backed index answers it with partition pruning, no job-wide
    scan."""
    return index.where(F.col("surt_key").startswith(F.lit(surt_prefix)))
