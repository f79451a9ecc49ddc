"""ops 42/43/46: extraction byte-identity across all three consumers —
oracle (pure pandas), scalar pandas UDF, and the mapInArrow bulk path
(BASELINE.json:15 "byte-identical extracted text per url")."""

import pandas as pd
from pyspark.sql import functions as F

from data_crawler_spark.functions.extract import (
    extract_links_series,
    extract_text_series,
    extract_title_series,
)
from data_crawler_spark.functions.spark_udfs import (
    extract_links_udf,
    extract_text_udf,
)

CORNERS = [
    b"<html><head><title>T</title></head><body><p>hello world</p></body></html>",
    b"<html><body><p></p></body></html>",
    b"<html><body>no paragraph</body></html>",
    b"<html><body><p>first</p><p>second</p></body></html>",
    b"<html><body><p>multi\nline\ntext</p></body></html>",
    "<html><body><p>unicode 日本語 ü</p></body></html>".encode(),
    b'<html><body><p>t</p><a href="/x">a</a><a href="https://h/y">b</a></body></html>',
    b"",
]


def test_pure_extractor_corners():
    s = pd.Series(CORNERS, dtype=object)
    texts = extract_text_series(s)
    assert texts[0] == "hello world"
    assert texts[1] == ""
    assert texts[2] == ""
    assert texts[3] == "first"
    assert texts[4] == "multi\nline\ntext"
    assert texts[5] == "unicode 日本語 ü"
    assert texts[7] == ""
    assert extract_title_series(s)[0] == "T"
    links = extract_links_series(s)
    assert links[6] == ["/x", "https://h/y"]
    assert links[0] == []


def test_udf_byte_identity_vs_oracle(spark, web1k):
    """Spark pandas UDF over html == pure single-node extractor == the
    ground-truth text column, for every page."""
    pages = spark.read.parquet(str(web1k / "pages.parquet"))
    rows = pages.select(
        "url", "text", extract_text_udf("html").alias("etext")
    ).collect()
    assert len(rows) == 1000
    for r in rows:
        assert r.etext == r.text, r.url

    pdf = pages.select("url", "html", "text").toPandas()
    oracle_text = extract_text_series(pdf["html"])
    assert list(oracle_text) == list(pdf["text"])


def test_links_udf_matches_pure(spark, web1k):
    pages = spark.read.parquet(str(web1k / "pages.parquet")).limit(200)
    rows = pages.select("url", "html", extract_links_udf("html").alias("l")).collect()
    pure = extract_links_series(pd.Series([bytes(r.html) for r in rows], dtype=object))
    for r, pl in zip(rows, pure):
        assert list(r.l) == pl


def test_mapinarrow_byte_identity(spark, web1k):
    """op 46: bulk Arrow extraction path produces the same bytes."""
    from data_crawler_spark.operators.extractor import extract_pages_arrow
    pages = spark.read.parquet(str(web1k / "pages.parquet"))
    out = extract_pages_arrow(pages.select("url", "html"))
    got = {r.url: r.text for r in out.collect()}
    want = {r.url: r.text for r in pages.select("url", "text").collect()}
    assert got == want


def test_null_html_identical_across_extraction_paths(spark):
    """null html -> null text in EVERY path (the Arrow kernel's
    fill_null previously produced '' while the pandas fallback and the
    shared series extractor produced null)."""
    import pandas as pd
    import pyarrow as pa

    from data_crawler_spark.functions.extract import extract_text_series
    from data_crawler_spark.operators.extractor import (
        _arrow_text, extract_pages_arrow, extract_pages_with_links_arrow)

    html = pa.array([b"<html><p>hi</p></html>", None, b"no match"],
                    pa.binary())
    arrow_out = _arrow_text(html).to_pylist()
    pandas_out = list(extract_text_series(pd.Series(
        [b"<html><p>hi</p></html>", None, b"no match"])))
    assert arrow_out == pandas_out
    assert arrow_out[1] is None and arrow_out[2] == ""

    df = spark.createDataFrame(
        [("u1", b"<html><p>hi</p></html>"), ("u2", None)],
        "url string, html binary")
    for op in (extract_pages_arrow, extract_pages_with_links_arrow):
        got = {r.url: r.text for r in op(df).collect()}
        assert got["u2"] is None, op.__name__
