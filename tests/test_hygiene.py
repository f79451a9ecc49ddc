"""Charset sniffing, tolerant decode, soft-404 (operators/hygiene.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.hygiene import (
    decode_pages,
    drop_soft404,
    sniff_charset_col,
    soft404_col,
)


def _sniff(spark, payload: bytes):
    df = spark.createDataFrame([(payload,)], "html binary")
    return df.select(sniff_charset_col(F.col("html")).alias("c")).first()["c"]


def test_sniff_charset(spark):
    assert _sniff(spark, b"\xef\xbb\xbfhello") == "utf-8"
    assert _sniff(spark, b"\xff\xfeh\x00i\x00") == "utf-16le"
    assert _sniff(spark, b"\xfe\xff\x00h\x00i") == "utf-16be"
    assert _sniff(spark, b'<meta charset="Windows-1252"><p>x</p>') == \
        "windows-1252"
    assert _sniff(
        spark,
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=ISO-8859-1">') == "iso-8859-1"
    assert _sniff(spark, b"<html><p>plain</p></html>") is None
    # declaration outside the 1 KiB sniff window is not seen
    assert _sniff(spark, b" " * 1024 + b'<meta charset="utf-8">') is None


def test_decode_pages(spark):
    rows = [
        ("cp1252", "caf\xe9 page".encode("windows-1252")
         .replace(b"caf", b'<meta charset="windows-1252">caf')),
        ("utf8", "déjà".encode("utf-8")),
        ("broken", b'<meta charset="utf-8">caf\xe9'),  # lies: really 1252
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["html_utf8"], r["charset_used"])
           for r in decode_pages(df).collect()}
    assert bytes(got["cp1252"][0]).decode("utf-8") == \
        '<meta charset="windows-1252">caf\xe9 page'
    assert got["cp1252"][1] == "windows-1252"
    assert bytes(got["utf8"][0]).decode("utf-8") == "déjà"
    assert got["utf8"][1] == "utf-8"
    # declared utf-8 but invalid -> falls back to cp1252
    assert bytes(got["broken"][0]).decode("utf-8").endswith("caf\xe9")
    assert got["broken"][1] == "windows-1252"
    assert got["null"] == (None, None)
    # every output decodes as strict utf-8 (the extraction contract)
    for b, _ in got.values():
        if b is not None:
            bytes(b).decode("utf-8")


def test_soft404(spark):
    rows = [
        ("err_title", "some body", "404 Not Found"),
        ("err_body", "page not found", "Welcome"),
        ("mention", "a long article that happens to mention the "
                    "phrase page not found while discussing http "
                    "errors in depth and detail", "Essay"),
        ("fine", "regular content here", "Home"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, title string")
    flags = {r["url"]: r["f"] for r in df.select(
        "url", soft404_col(F.col("text"), F.col("title")).alias("f"))
        .collect()}
    assert flags == {"err_title": True, "err_body": True,
                     "mention": False, "fine": False}
    kept = {r["url"] for r in drop_soft404(df).collect()}
    assert kept == {"mention", "fine"}


def test_drop_soft404_without_title(spark):
    df = spark.createDataFrame(
        [("a", "page not found"), ("b", "real content")],
        "url string, text string")
    assert {r["url"] for r in drop_soft404(df, title_col=None).collect()} \
        == {"b"}


def test_bom_consumed_so_duplicates_fingerprint_equal(spark):
    """The BOM the sniff matched must not survive into html_utf8 —
    a leading ZWNBSP would split otherwise-exact dup fingerprints."""
    from data_crawler_spark.operators.hygiene import decode_pages

    body = "<html><p>same page</p></html>"
    rows = [(1, body.encode("utf-8")),
            (2, b"\xef\xbb\xbf" + body.encode("utf-8")),
            (3, b"\xff\xfe" + body.encode("utf-16-le"))]
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r.doc_id: (bytes(r.html_utf8), r.charset_used)
           for r in decode_pages(df).collect()}
    assert got[1][0] == got[2][0] == got[3][0] == body.encode()
    assert got[2][1] == "utf-8" and got[3][1] == "utf-16le"


def test_media_class_and_filter(spark):
    """Content-Type -> media class: parameters/case/whitespace
    ignored, class boundaries right, filter_media keeps the asked
    classes (+unknown by default), pure map."""
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.hygiene import (filter_media,
                                                      media_class_col)

    rows = [
        (1, "text/html; charset=utf-8", "html"),
        (2, "Application/XHTML+XML", "html"),
        (3, "text/plain", "text"),
        (4, "application/json", "text"),
        (5, "image/png", "image"),
        (6, "AUDIO/mpeg ; x=y", "audio"),
        (7, "video/mp4", "video"),
        (8, "application/pdf", "pdf"),
        (9, "application/octet-stream", "other"),
        (10, None, "unknown"),
        (11, "  ", "unknown"),
        (12, "application/rss+xml", "text"),
    ]
    df = spark.createDataFrame(
        [(i, ct) for i, ct, _ in rows], "id long, content_type string")
    got = {r.id: r.c for r in df.select(
        "id", media_class_col(F.col("content_type")).alias("c"))
        .collect()}
    assert got == {i: want for i, _, want in rows}

    kept = {r.id for r in filter_media(df).collect()}
    assert kept == {1, 2, 3, 4, 10, 11, 12}
    strict = {r.id for r in filter_media(df, keep_unknown=False)
              .collect()}
    assert strict == {1, 2, 3, 4, 12}
    media = {r.id for r in filter_media(
        df, classes=("image", "audio", "video")).collect()}
    assert media == {5, 6, 7, 10, 11}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown media classes"):
        filter_media(df, classes=("htlm",))

    plan = filter_media(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


# ---------------------------------------------------------------------------
# decompress_payloads
# ---------------------------------------------------------------------------

def test_decompress_payloads_roundtrip(spark):
    import gzip
    import zlib

    from data_crawler_spark.operators.hygiene import decompress_payloads

    plain = b"<urlset><url><loc>http://a.com/</loc></url></urlset>"
    rows = [("gz", gzip.compress(plain)),
            ("zl", zlib.compress(plain)),
            ("raw", plain),
            ("corrupt", b"\x1f\x8b" + b"\x00" * 10),
            ("null", None)]
    df = spark.createDataFrame(rows, "id string, payload binary")
    got = {r["id"]: r for r in
           decompress_payloads(df, "payload").collect()}
    assert bytes(got["gz"]["payload"]) == plain
    assert got["gz"]["payload_codec"] == "gzip"
    assert bytes(got["zl"]["payload"]) == plain
    assert got["zl"]["payload_codec"] == "zlib"
    assert bytes(got["raw"]["payload"]) == plain
    assert got["raw"]["payload_codec"] == "raw"
    assert got["corrupt"]["payload"] is None
    assert got["corrupt"]["payload_codec"] == "corrupt"
    assert got["null"]["payload"] is None
    assert got["null"]["payload_codec"] is None


def test_decompress_bomb_guard(spark):
    import gzip

    from data_crawler_spark.operators.hygiene import decompress_payloads

    # 200 MB of zeros compresses to ~200 KB; the cap must refuse it
    # without materializing the plaintext
    bomb = gzip.compress(b"\x00" * (200 << 20))
    assert len(bomb) < (1 << 20)
    df = spark.createDataFrame([("b", bomb)], "id string, payload binary")
    r = decompress_payloads(df, "payload", max_bytes=1 << 20).first()
    assert r["payload"] is None and r["payload_codec"] == "too_big"
    with pytest.raises(ValueError):
        decompress_payloads(df, "payload", max_bytes=0)


def test_decompress_gzipped_sitemap_end_to_end(spark):
    import gzip

    from data_crawler_spark.operators.hygiene import decompress_payloads
    from data_crawler_spark.operators.links import sitemap_urls

    xml = (b"<?xml version='1.0'?><urlset>"
           b"<url><loc>HTTP://A.com/x</loc></url>"
           b"<url><loc>http://a.com/y?b=2&amp;a=1</loc></url></urlset>")
    df = spark.createDataFrame(
        [("http://a.com/sitemap.xml.gz", gzip.compress(xml))],
        "url string, payload binary")
    pages = decompress_payloads(df, "payload").select(
        "url", F.decode("payload", "UTF-8").alias("body"))
    got = sorted(r["url"] for r in
                 sitemap_urls(pages, xml_col="body").collect())
    # the frontier canonicalizer lowercases scheme/host and decodes the
    # XML entity; it deliberately preserves query-param order
    assert got == ["http://a.com/x", "http://a.com/y?b=2&a=1"]


def test_decompress_multi_member_gzip(spark):
    import gzip

    from data_crawler_spark.operators.hygiene import decompress_payloads

    # concatenated gzip members (gzip -c a b; WARC files are one
    # member PER RECORD) must inflate fully, not stop after member 1
    payload = gzip.compress(b"record one ") + gzip.compress(b"record two")
    df = spark.createDataFrame([("m", payload)], "id string, payload binary")
    r = decompress_payloads(df, "payload").first()
    assert bytes(r["payload"]) == b"record one record two"
    assert r["payload_codec"] == "gzip"

    # a truncated SECOND member is corrupt, not a silent prefix
    trunc = gzip.compress(b"one") + gzip.compress(b"two")[:-4]
    df2 = spark.createDataFrame([("t", trunc)], "id string, payload binary")
    r2 = decompress_payloads(df2, "payload").first()
    assert r2["payload"] is None and r2["payload_codec"] == "corrupt"

    # the bomb cap accumulates ACROSS members
    bomb2 = gzip.compress(b"\x00" * (1 << 20)) + gzip.compress(b"\x00" * (1 << 20))
    df3 = spark.createDataFrame([("b", bomb2)], "id string, payload binary")
    r3 = decompress_payloads(df3, "payload", max_bytes=(1 << 20) + 100).first()
    assert r3["payload"] is None and r3["payload_codec"] == "too_big"
