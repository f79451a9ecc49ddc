"""Anchor-text extraction and per-target aggregation.

Anchor text — the words other pages use when they link to a URL — is
one of the strongest web-scale relevance/quality signals (it is how a
page can rank for terms it never contains) and a standard
training-data artifact: (anchor, target-page) pairs are mined as
query–document supervision. This module extracts (source, target,
anchor) triples from the PAGES table and aggregates an anchor profile
per target URL.

Scale shape: html crosses exactly ONE Arrow stage (the same rule as
the extraction sweep — operators/extractor.py); href resolution and
canonicalization are the native op-05 expressions after the explode,
so no Python touches the exploded edge stream. The per-target summary
pre-aggregates on (target, anchor) FIRST — that is the skew breaker:
a head target with 10^9 in-links collapses to at most its distinct
anchor strings before any single task sees it — then tops-k inside
one collect_list + sort_array + slice, so the whole summary is two
hash exchanges and no window.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.functions.extract import (
    _TAG_RX,
    decode_html_series,
    extract_anchors_series,
)
from data_crawler_spark.operators.links import (
    canonicalize_col,
    resolve_href_col,
)

__all__ = ["page_anchors", "anchor_summary"]

_RAW_SCHEMA = ("url string, "
               "anchors array<struct<href:string, anchor:string>>")
_PAIR_TYPE = pa.list_(pa.struct(
    [("href", pa.string()), ("anchor", pa.string())]))
_RAW_SCHEMA_NF = ("url string, anchors array<struct<href:string, "
                  "anchor:string, nofollow:boolean>>")
_TRIPLE_TYPE = pa.list_(pa.struct(
    [("href", pa.string()), ("anchor", pa.string()),
     ("nofollow", pa.bool_())]))

# SAME occurrence structure as extract.ANCHOR_RE, with the attribute
# tail captured so rel can be inspected per occurrence — keeps the
# nofollow stream aligned 1:1 with extract_anchors_series' matches
_A_ATTRS_RX = re.compile(r'(?s)<a href="([^"]*)"([^>]*)>(.*?)</a>')
# all three attribute quote forms (real-world pages mix them — the
# structured.py lesson), anchored at an attribute boundary so
# data-rel="nofollow" never matches
_NOFOLLOW_RX = re.compile(
    r'(?i)(?:^|\s)rel\s*=\s*('
    r'"[^"]*\bnofollow\b[^"]*"'
    r"|'[^']*\bnofollow\b[^']*'"
    r'|nofollow(?=[\s>/]|$))')


def _anchor_triples_series(html: pd.Series) -> pd.Series:
    """Like extract_anchors_series, plus a per-occurrence ``nofollow``
    flag (rel="...nofollow..." on the tag, any attribute order after
    href). PageRank/HITS pipelines drop nofollow edges — the publisher
    explicitly declined to endorse the target."""
    h = decode_html_series(html)

    def one(s):
        if not isinstance(s, str):
            return None
        return [(href, " ".join(_TAG_RX.sub(" ", body).split()),
                 _NOFOLLOW_RX.search(attrs) is not None)
                for href, attrs, body in _A_ATTRS_RX.findall(s)]

    return h.apply(one)


def page_anchors(pages: DataFrame, with_nofollow: bool = False) -> DataFrame:
    """PAGES (url, html, ...) -> edge stream
    ``(src_url, target_url, anchor)``, one row per <a> tag, document
    order not preserved (the aggregate does not need it).

    target_url is resolved against the source page and canonicalized
    (op 05), so the same page reached by relative and absolute hrefs
    aggregates under one key. Pages with no/undecodable html emit
    nothing. ``with_nofollow=True`` appends a per-occurrence
    ``nofollow`` boolean (rel="nofollow" on the tag) so link-analysis
    callers can drop non-endorsing edges before PageRank/HITS:
    ``page_anchors(p, True).where(~F.col("nofollow"))``."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            html = b.column("html").to_pandas()
            if with_nofollow:
                vals = pa.array(list(_anchor_triples_series(html)),
                                _TRIPLE_TYPE)
            else:
                vals = pa.array(list(extract_anchors_series(html)),
                                _PAIR_TYPE)
            yield pa.RecordBatch.from_arrays(
                [b.column("url"), vals], ["url", "anchors"])

    raw = pages.select("url", "html").mapInArrow(
        fn, _RAW_SCHEMA_NF if with_nofollow else _RAW_SCHEMA)
    a = raw.select("url", F.explode("anchors").alias("a"))
    target = canonicalize_col(
        resolve_href_col(F.col("url"), F.col("a.href")))
    cols = [
        F.col("url").alias("src_url"),
        target.alias("target_url"),
        F.col("a.anchor").alias("anchor"),
    ]
    if with_nofollow:
        cols.append(F.col("a.nofollow").alias("nofollow"))
    return a.select(*cols)


def anchor_summary(anchors: DataFrame, top_k: int = 3) -> DataFrame:
    """Edge stream -> one row per target:
    ``(target_url, n_inlinks, n_distinct_anchors, top_anchors)``.

    top_anchors = the k most frequent anchor strings, ties broken
    lexicographically (a total order — deterministic under any
    partitioning). The (target, anchor) count is the map-side-
    combinable skew pre-aggregation; the top-k is then a WINDOW prune
    (rank ≤ k) before any collect_list, so the per-target array is
    bounded at k — a spam target with 10^8 distinct randomized
    anchors sorts via the window's spillable sort instead of
    materializing every string in one task's array."""
    from pyspark.sql import Window

    per = anchors.groupBy("target_url", "anchor").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("target_url").orderBy(F.desc("cnt"),
                                                 F.asc("anchor"))
    key = F.struct((-F.col("cnt")).alias("nc"),
                   F.col("anchor").alias("anchor"))
    # collect_list skips nulls: only the k ranked structs are ever
    # gathered, and the stats aggregate the same ranked frame so the
    # groupBy reuses the window's target_url partitioning — still two
    # exchanges total (plan-tested)
    ranked = per.withColumn("_r", F.row_number().over(w))
    return ranked.groupBy("target_url").agg(
        F.sum("cnt").alias("n_inlinks"),
        F.count("*").alias("n_distinct_anchors"),
        F.transform(
            F.sort_array(F.collect_list(
                F.when(F.col("_r") <= top_k, key))),
            lambda s: s["anchor"]).alias("top_anchors"))
