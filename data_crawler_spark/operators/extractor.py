"""Bulk extraction paths (SURVEY.md §2 ops 42/46).

``extract_pages_arrow`` is the mapInArrow sweep for the 10^10-scale
extraction stage: one Arrow batch in, one out, no Spark-row
materialization, html dropped on the way out. The regex work itself
runs through the SAME shared pandas functions as the scalar UDF and
the oracle (functions/extract.py), so byte-identity holds across all
three paths (tests/test_extract.py::test_mapinarrow_byte_identity).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame

from data_crawler_spark.functions.extract import (
    TEXT_RE,
    extract_links_series,
    extract_text_series,
)

_OUT_SCHEMA = "url string, text string"
_OUT_LINKS_SCHEMA = "url string, text string, links array<string>"

# RE2 named-group form of TEXT_RE for pyarrow.compute.extract_regex
_TEXT_RE_ARROW = TEXT_RE.replace("(.*?)", "(?P<t>.*?)")


def _arrow_text(html: pa.Array) -> pa.Array:
    """html binary -> text string, entirely inside Arrow compute (RE2).
    Byte-identical to extract_text_series — asserted on every generated
    corpus by tests/test_extract.py; falls back to the pandas path if
    the compute kernel is unavailable."""
    try:
        s = pc.cast(html, pa.string())  # validates strict UTF-8
        ex = pc.extract_regex(s, pattern=_TEXT_RE_ARROW)
        # fill "" only for no-match on REAL input; null html stays
        # null — the pandas fallback and the shared extract_text_series
        # both return null there, and byte-identity is the contract
        t = pc.fill_null(pc.struct_field(ex, "t"), "")
        return pc.if_else(pc.is_null(s), s, t)
    except (AttributeError, pa.lib.ArrowNotImplementedError):
        return pa.array(extract_text_series(html.to_pandas()), pa.string())


def extract_pages_arrow(pages: DataFrame) -> DataFrame:
    """(url, html, ...) -> (url, text) via zero-copy Arrow batches."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("url"), _arrow_text(b.column("html"))],
                ["url", "text"],
            )

    return pages.select("url", "html").mapInArrow(fn, _OUT_SCHEMA)


def extract_pages_with_links_arrow(pages: DataFrame) -> DataFrame:
    """(url, html, ...) -> (url, text, links) in a single html pass."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            links = extract_links_series(b.column("html").to_pandas())
            yield pa.RecordBatch.from_arrays(
                [b.column("url"),
                 _arrow_text(b.column("html")),
                 pa.array(list(links), pa.list_(pa.string()))],
                ["url", "text", "links"],
            )

    return pages.select("url", "html").mapInArrow(fn, _OUT_LINKS_SCHEMA)


def extract_enrich_arrow(pages: DataFrame) -> DataFrame:
    """Single-pass round extraction: input (html + any passthrough
    columns) -> passthrough + text + links. ONE python stage per crawl
    round instead of separate text/link sweeps — per-round fixed cost
    is what dominates small rounds, and html is read exactly once.
    Pre-existing text/links columns are REPLACED (the PAGES schema
    carries text; keeping both would leave an ambiguous duplicate)."""
    drop = ("html", "text", "links")
    keep = [c for c, _ in pages.dtypes if c not in drop]
    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in pages.dtypes if c not in drop]
        + ["text string", "links array<string>"])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            links = extract_links_series(b.column("html").to_pandas())
            arrays = [b.column(c) for c in keep]
            arrays.append(_arrow_text(b.column("html")))
            arrays.append(pa.array(list(links), pa.list_(pa.string())))
            yield pa.RecordBatch.from_arrays(arrays, keep + ["text", "links"])

    return pages.mapInArrow(fn, out_schema)
