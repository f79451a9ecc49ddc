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
from pyspark.sql import DataFrame

from data_crawler_spark.functions.extract import (
    extract_links_series,
    extract_text_series,
)

_OUT_SCHEMA = "url string, text string"
_OUT_LINKS_SCHEMA = "url string, text string, links array<string>"


def extract_pages_arrow(pages: DataFrame) -> DataFrame:
    """(url, html, ...) -> (url, text) via zero-copy Arrow batches."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            html = b.column("html").to_pandas()
            texts = extract_text_series(html)
            yield pa.RecordBatch.from_arrays(
                [b.column("url"), pa.array(texts, pa.string())],
                ["url", "text"],
            )

    return pages.select("url", "html").mapInArrow(fn, _OUT_SCHEMA)


def extract_pages_with_links_arrow(pages: DataFrame) -> DataFrame:
    """(url, html, ...) -> (url, text, links) in a single html pass."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            html = b.column("html").to_pandas()
            texts = extract_text_series(html)
            links = extract_links_series(html)
            yield pa.RecordBatch.from_arrays(
                [b.column("url"),
                 pa.array(texts, pa.string()),
                 pa.array(list(links), pa.list_(pa.string()))],
                ["url", "text", "links"],
            )

    return pages.select("url", "html").mapInArrow(fn, _OUT_LINKS_SCHEMA)
