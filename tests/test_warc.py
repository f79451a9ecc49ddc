"""WARC ingestion seam (sources/warc.py): byte-exact page roundtrip
through spec-conformant .warc / per-record-gzip .warc.gz files, record
taxonomy, HTTP framing, and the no-shuffle reader plan."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_crawler_spark.sources.warc import (
    _http_response_bytes,
    read_warc,
    split_warc_records,
    warc_pages,
    warc_record_bytes,
    write_warc_pages,
)


def _pages_pdf() -> pd.DataFrame:
    rows = [
        ("https://host0.example.com/a.html",
         pd.Timestamp("2026-08-01 12:00:00"),
         "<html><title>a</title><p>alpha éé</p></html>".encode()),
        ("https://host1.example.com/b.html",
         pd.Timestamp("2026-08-02 00:30:05"),
         b"<html><p>beta</p><a href=\"/x\"></a></html>"),
        ("https://host1.example.com/c.html",
         pd.Timestamp("2026-08-03 23:59:59"),
         b""),  # empty body is a legal zero-length payload
        ("https://host2.example.com/crlf.html",
         pd.Timestamp("2026-08-04 01:02:03"),
         b"<p>body with \r\n\r\n embedded header-end bytes</p>"),
    ]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html"])


def _roundtrip(spark, tmp_path, gzip_records: bool):
    pdf = _pages_pdf()
    write_warc_pages(pdf.iloc[:2], tmp_path / "seg-0.warc"
                     if not gzip_records else tmp_path / "seg-0.warc.gz",
                     gzip_records=gzip_records)
    write_warc_pages(pdf.iloc[2:], tmp_path / "seg-1.warc"
                     if not gzip_records else tmp_path / "seg-1.warc.gz",
                     gzip_records=gzip_records)
    recs = read_warc(spark, str(tmp_path))
    got = (warc_pages(recs).orderBy("url")
           .toPandas())
    assert list(got["url"]) == sorted(pdf["url"])
    exp = pdf.sort_values("url").reset_index(drop=True)
    # byte identity of html, exact warc_ts
    for i in range(len(exp)):
        assert bytes(got["html"][i]) == bytes(exp["html"][i])
        assert got["warc_ts"][i] == exp["warc_ts"][i]
    return recs


def test_roundtrip_plain(spark, tmp_path):
    recs = _roundtrip(spark, tmp_path, gzip_records=False)
    taxo = {r["record_type"] for r in recs.select("record_type").distinct().collect()}
    assert taxo == {"warcinfo", "response"}
    # two files, distinguishable provenance
    nfiles = recs.select("warc_file").distinct().count()
    assert nfiles == 2


def test_roundtrip_gzip_members(spark, tmp_path):
    _roundtrip(spark, tmp_path, gzip_records=True)


def test_record_offsets_and_status(spark, tmp_path):
    write_warc_pages(_pages_pdf(), tmp_path / "s.warc")
    recs = read_warc(spark, str(tmp_path)).orderBy("record_offset").collect()
    offs = [r["record_offset"] for r in recs]
    assert offs[0] == 0 and offs == sorted(offs) and len(set(offs)) == len(offs)
    resp = [r for r in recs if r["record_type"] == "response"]
    assert all(r["http_status"] == 200 for r in resp)
    assert all(r["content_type"] == "text/html" for r in resp)


def test_non_200_and_request_records(spark, tmp_path):
    """ok_only drops 404s; request records never reach warc_pages."""
    rec404 = warc_record_bytes(
        {"WARC-Type": "response",
         "WARC-Date": "2026-08-05T00:00:00Z",
         "WARC-Target-URI": "https://host9.example.com/gone.html",
         "Content-Type": "application/http; msgtype=response"},
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>nope</p>")
    req = warc_record_bytes(
        {"WARC-Type": "request",
         "WARC-Date": "2026-08-05T00:00:00Z",
         "WARC-Target-URI": "https://host9.example.com/gone.html",
         "Content-Type": "application/http; msgtype=request"},
        b"GET /gone.html HTTP/1.1\r\nHost: host9.example.com\r\n\r\n")
    ok = warc_record_bytes(
        {"WARC-Type": "response",
         "WARC-Date": "2026-08-05T00:00:01Z",
         "WARC-Target-URI": "https://host9.example.com/ok.html",
         "Content-Type": "application/http; msgtype=response"},
        _http_response_bytes(b"<p>fine</p>"))
    (tmp_path / "m.warc").write_bytes(rec404 + req + ok)

    recs = read_warc(spark, str(tmp_path))
    assert recs.count() == 3
    strict = warc_pages(recs).collect()
    assert [r["url"] for r in strict] == ["https://host9.example.com/ok.html"]
    lax = warc_pages(recs, ok_only=False).orderBy("url").collect()
    assert [r["url"] for r in lax] == [
        "https://host9.example.com/gone.html",
        "https://host9.example.com/ok.html"]
    assert bytes(lax[0]["html"]) == b"<p>nope</p>"


def test_truncated_tail_record_dropped():
    good = warc_record_bytes(
        {"WARC-Type": "response", "WARC-Date": "2026-08-05T00:00:00Z",
         "WARC-Target-URI": "https://h/x",
         "Content-Type": "application/http; msgtype=response"},
        _http_response_bytes(b"<p>x</p>"))
    truncated = warc_record_bytes(
        {"WARC-Type": "response", "WARC-Date": "2026-08-05T00:00:00Z",
         "WARC-Target-URI": "https://h/y",
         "Content-Type": "application/http; msgtype=response"},
        _http_response_bytes(b"<p>yyyyyyyy</p>"))[:-20]
    recs = list(split_warc_records(good + truncated))
    assert len(recs) == 1
    assert recs[0][1]["warc-target-uri"] == "https://h/x"


def test_concatenated_gzip_members_split():
    a = warc_record_bytes(
        {"WARC-Type": "warcinfo", "WARC-Date": "2026-01-01T00:00:00Z",
         "Content-Type": "application/warc-fields"}, b"k: v\r\n")
    b = warc_record_bytes(
        {"WARC-Type": "response", "WARC-Date": "2026-08-05T00:00:00Z",
         "WARC-Target-URI": "https://h/z",
         "Content-Type": "application/http; msgtype=response"},
        _http_response_bytes(b"<p>z</p>"))
    data = gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0)
    recs = list(split_warc_records(data))
    assert [h["warc-type"] for _, h, _ in recs] == ["warcinfo", "response"]


def test_export_warc_distributed_roundtrip(spark, tmp_path):
    """export_warc writes one file per partition, the manifest counts
    are exact, and read_warc recovers every page byte-identically."""
    pdf = _pages_pdf()
    pages = spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary").repartition(3)
    from data_crawler_spark.sources.warc import export_warc
    manifest = export_warc(pages, tmp_path / "out").collect()
    assert len(manifest) == 3
    assert sum(r["n_records"] for r in manifest) == len(pdf)
    files = sorted((tmp_path / "out").glob("part-*.warc.gz"))
    assert [str(f) for f in files] == sorted(r["warc_file"] for r in manifest)
    for r in manifest:
        assert r["n_bytes"] == (tmp_path / "out" / r["warc_file"].split("/")[-1]).stat().st_size

    got = (warc_pages(read_warc(spark, str(tmp_path / "out")))
           .orderBy("url").toPandas())
    exp = pdf.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    for i in range(len(exp)):
        assert bytes(got["html"][i]) == bytes(exp["html"][i])
        assert got["warc_ts"][i] == exp["warc_ts"][i]


def test_export_warc_size_rotation(spark, tmp_path):
    """target_bytes rotates part files at the size target (the ~1 GB
    CC convention, forced tiny here): every part lands near the
    target, each is independently readable (own warcinfo), the
    manifest carries exact per-part record and byte counts, and the
    roundtrip stays byte-identical."""
    rows = []
    for i in range(40):
        rows.append((f"https://h{i % 2}.test/p{i}.html",
                     pd.Timestamp("2026-08-01 12:00:00"),
                     (f"<html>{i:03d} ".encode() + b"x" * 3000
                      + b"</html>")))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
    pages = spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary").repartition(2)
    from data_crawler_spark.sources.warc import export_warc
    target = 8_000
    manifest = export_warc(pages, tmp_path / "out", gzip_records=False,
                           target_bytes=target).collect()
    # rotation happened: far more files than partitions
    assert len(manifest) > 4
    assert sum(r["n_records"] for r in manifest) == len(pdf)
    for r in manifest:
        p = tmp_path / "out" / r["warc_file"].split("/")[-1]
        assert r["n_bytes"] == p.stat().st_size
        assert r["n_records"] >= 1
        # a part exceeds the target by at most one record (+warcinfo)
        assert r["n_bytes"] < target + 5_000
        # each part opens with its own warcinfo — independently readable
        head = p.read_bytes()[:200]
        assert b"warcinfo" in head
    # rotated names are deterministic part-<pid>-<seq>
    names = sorted(r["warc_file"].split("/")[-1] for r in manifest)
    assert all(n.count("-") == 2 for n in names)
    got = (warc_pages(read_warc(spark, str(tmp_path / "out")))
           .orderBy("url").toPandas())
    exp = pdf.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    for i in range(len(exp)):
        assert bytes(got["html"][i]) == bytes(exp["html"][i])
    # single-record-per-file degenerate target still works (and shows
    # the bound: rotation happens AFTER at least one record per file)
    m2 = export_warc(pages, tmp_path / "out2", gzip_records=False,
                     target_bytes=1).collect()
    assert all(r["n_records"] == 1 for r in m2)
    assert sum(r["n_records"] for r in m2) == len(pdf)


def test_export_warc_plan_no_shuffle(spark, tmp_path):
    """The sink adds no exchange beyond the caller's own layout."""
    from data_crawler_spark.sources.warc import export_warc
    pages = spark.createDataFrame(
        _pages_pdf(), "url string, warc_ts timestamp, html binary")
    plan = (export_warc(pages, tmp_path / "o")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_reader_plan_no_exchange(spark, tmp_path):
    """binaryFile scan -> one Arrow stage; filter/projection fuse in."""
    write_warc_pages(_pages_pdf(), tmp_path / "s.warc")
    plan = (warc_pages(read_warc(spark, str(tmp_path)))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def _text_pdf() -> pd.DataFrame:
    rows = [
        ("https://host0.example.com/a.html",
         pd.Timestamp("2026-08-01 12:00:00"), "alpha éé text\nline two"),
        ("https://host1.example.com/b.html",
         pd.Timestamp("2026-08-02 00:30:05"), "beta"),
        ("https://host1.example.com/c.html",
         pd.Timestamp("2026-08-03 23:59:59"), None),  # empty extraction
    ]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "text"])


def test_export_wet_roundtrip(spark, tmp_path):
    """WET conversion records roundtrip (url, warc_ts, text) exactly;
    null text exports as an empty record and reads back as ""."""
    from data_crawler_spark.sources.warc import export_wet, wet_text
    pdf = _text_pdf()
    pages = spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, text string").repartition(2)
    manifest = export_wet(pages, tmp_path / "wet").collect()
    assert sum(r["n_records"] for r in manifest) == len(pdf)
    assert all(r["warc_file"].endswith(".warc.wet.gz") for r in manifest)

    recs = read_warc(spark, str(tmp_path / "wet"))
    assert {r["record_type"] for r in recs.select("record_type")
            .distinct().collect()} == {"warcinfo", "conversion"}
    got = wet_text(recs).orderBy("url").toPandas()
    exp = pdf.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    for i in range(len(exp)):
        assert got["text"][i] == (exp["text"][i] or "")
        assert got["warc_ts"][i] == exp["warc_ts"][i]


def test_export_wet_plan_no_shuffle(spark, tmp_path):
    from data_crawler_spark.sources.warc import export_wet
    pages = spark.createDataFrame(
        _text_pdf(), "url string, warc_ts timestamp, text string")
    plan = (export_wet(pages, tmp_path / "o")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_page_wat_envelope_and_plan(spark):
    """WAT JSON carries title/metas/links in document order; the
    builder is a pure map (no Exchange, no Python)."""
    import json as _json

    from datetime import datetime

    from data_crawler_spark.sources.warc import page_wat
    rows = [
        ("http://a.test/p1", datetime(2026, 1, 2, 3, 4, 5),
         "<html><head><title> Hi there </title>"
         '<meta name="description" content="d1"></head>'
         "<body><a href='/x'>x</a><a href=\"http://b.test/\">b</a>"
         "<a href=unquoted>skipped</a><a name=anchor>no href</a>"
         "</body></html>"),
        ("http://a.test/p2", datetime(2026, 1, 2, 3, 4, 6),
         "<html>no head</html>"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, "
                                     "html string")
    wat = page_wat(df)
    got = {r["url"]: _json.loads(r["wat_json"]) for r in wat.collect()}
    h1 = got["http://a.test/p1"]["Envelope"]["Payload-Metadata"][
        "HTML-Metadata"]
    assert h1["Head"]["Title"] == "Hi there"
    assert h1["Head"]["Metas"] == [
        {"key": "description", "value": "d1"}]
    # document order across mixed quote styles; unquoted/absent skipped
    assert [x["url"] for x in h1["Links"]] == ["/x", "http://b.test/"]
    h2 = got["http://a.test/p2"]["Envelope"]["Payload-Metadata"][
        "HTML-Metadata"]
    assert h2["Head"]["Title"] is None
    assert h2["Links"] == []
    assert got["http://a.test/p1"]["Envelope"]["WARC-Header-Metadata"][
        "WARC-Target-URI"] == "http://a.test/p1"

    plan = wat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "EvalPython" not in plan


def test_export_wat_roundtrip(spark, tmp_path):
    """WAT metadata records roundtrip (url, warc_ts, wat_json)
    exactly through the distributed sink and the WARC reader."""
    from data_crawler_spark.sources.warc import (export_wat, page_wat,
                                                 read_warc, wat_entries)
    pdf = _pages_pdf()
    pages = spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary").repartition(2)
    wat = page_wat(pages)
    exp = {r["url"]: (r["warc_ts"], r["wat_json"]) for r in wat.collect()}
    manifest = export_wat(wat, tmp_path / "wat").collect()
    assert len(manifest) == 2
    assert sum(r["n_records"] for r in manifest) == len(pdf)
    files = sorted((tmp_path / "wat").glob("part-*.warc.wat.gz"))
    assert len(files) == 2

    back = wat_entries(read_warc(spark, str(tmp_path / "wat"))).collect()
    assert {r["url"]: (r["warc_ts"], r["wat_json"]) for r in back} == exp


# ------------------------------------------------- revisit dedup


def _crawl_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html"]))


def test_export_deduped_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_crawler_spark.sources.warc import (export_warc_deduped,
                                                 latest_capture_index,
                                                 resolve_revisits)

    t1, t2 = pd.Timestamp("2026-08-01 00:00:00"), pd.Timestamp(
        "2026-08-08 00:00:00")
    big = b"<p>unchanged</p>" * 400       # dedup must beat the
    prior = _crawl_df(spark, [          # revisit header overhead
        ("http://a.com/1", t1, big),
        ("http://a.com/2", t1, b"<p>old two</p>"),
        ("http://a.com/3", t1, b"<p>gone</p>"),
    ])
    # recrawl: /1 identical -> revisit; /2 changed and /new unseen ->
    # full response records
    cur = _crawl_df(spark, [
        ("http://a.com/1", t2, big),
        ("http://a.com/2", t2, b"<p>new two</p>"),
        ("http://a.com/new", t2, b"<p>fresh</p>"),
    ])
    idx = latest_capture_index(prior)
    out = tmp_path / "delta"
    manifest = export_warc_deduped(cur.coalesce(1), idx, out,
                                   gzip_records=False).collect()
    assert sum(m.n_records for m in manifest) == 3

    recs = read_warc(spark, str(out))
    by_type = {r.url: r for r in recs.collect() if r.url}
    assert by_type["http://a.com/1"].record_type == "revisit"
    assert by_type["http://a.com/2"].record_type == "response"
    assert by_type["http://a.com/new"].record_type == "response"
    rev = by_type["http://a.com/1"]
    # the revisit carries digest + refers-to pointers, and NO body
    assert rev.payload_digest.startswith("xxh64:")
    assert rev.refers_to_url == "http://a.com/1"
    assert rev.refers_to_ts == t1.to_pydatetime()
    assert b"unchanged" not in bytes(rev.payload)

    # the archive is smaller than the undeduped export
    full = export_warc_deduped(
        cur.coalesce(1), idx.filter(F.lit(False)), tmp_path / "full",
        gzip_records=False).collect()
    assert sum(m.n_bytes for m in manifest) < sum(m.n_bytes for m in full)

    # resolve re-materializes the PAGES shape exactly
    got = {(r.url, r.warc_ts): bytes(r.html)
           for r in resolve_revisits(recs, prior).collect()}
    want = {(r.url, r.warc_ts): bytes(r.html)
            for r in cur.collect()}
    assert got == want


def test_latest_capture_index_tie_and_precision(spark, tmp_path):
    from data_crawler_spark.sources.warc import (export_warc_deduped,
                                                 latest_capture_index,
                                                 read_warc,
                                                 resolve_revisits)

    # microsecond prior timestamps: the second-truncated WARC-Date
    # must still resolve
    tmu = pd.Timestamp("2026-08-01 00:00:00.123456")
    t2 = pd.Timestamp("2026-08-08 00:00:00")
    prior = _crawl_df(spark, [("http://a.com/1", tmu, b"<p>same</p>")])
    cur = _crawl_df(spark, [("http://a.com/1", t2, b"<p>same</p>")])
    out = tmp_path / "mu"
    export_warc_deduped(cur.coalesce(1), latest_capture_index(prior),
                        out, gzip_records=False).collect()
    recs = read_warc(spark, str(out))
    assert recs.filter("record_type = 'revisit'").count() == 1
    got = resolve_revisits(recs, prior).collect()
    assert len(got) == 1 and bytes(got[0].html) == b"<p>same</p>"

    # same-ts duplicate captures: the index picks layout-independently
    dup = _crawl_df(spark, [
        ("http://b.com/x", t2, b"<p>one</p>"),
        ("http://b.com/x", t2, b"<p>two</p>"),
    ])
    picks = {latest_capture_index(dup.repartition(n)).collect()[0]
             .ref_digest for n in (1, 2, 5)}
    assert len(picks) == 1


def test_resolve_revisits_digest_disambiguation_and_missing(spark, tmp_path):
    from data_crawler_spark.sources.warc import (export_warc_deduped,
                                                 latest_capture_index,
                                                 resolve_revisits)

    # two prior captures of one url INSIDE THE SAME SECOND with
    # different payloads: the truncated WARC-Date alone matches both;
    # the digest must pick the referred one, and exactly once
    t_a = pd.Timestamp("2026-08-01 00:00:00.100000")
    t_b = pd.Timestamp("2026-08-01 00:00:00.900000")
    t2 = pd.Timestamp("2026-08-08 00:00:00")
    prior = _crawl_df(spark, [
        ("http://a.com/1", t_a, b"<p>early body</p>"),
        ("http://a.com/1", t_b, b"<p>late body</p>"),
    ])
    cur = _crawl_df(spark, [("http://a.com/1", t2, b"<p>late body</p>")])
    out = tmp_path / "same_second"
    export_warc_deduped(cur.coalesce(1), latest_capture_index(prior),
                        out, gzip_records=False).collect()
    from data_crawler_spark.sources.warc import read_warc
    recs = read_warc(spark, str(out))
    assert recs.filter("record_type = 'revisit'").count() == 1
    got = resolve_revisits(recs, prior).collect()
    assert len(got) == 1
    assert bytes(got[0].html) == b"<p>late body</p>"

    # a pruned prior store: error by default, deliberate drop on ask
    pruned = prior.filter(F.lit(False))
    with pytest.raises(RuntimeError, match="revisit record"):
        resolve_revisits(recs, pruned).collect()
    assert resolve_revisits(recs, pruned, on_missing="drop").count() == 0
    with pytest.raises(ValueError):
        resolve_revisits(recs, prior, on_missing="quarantine")


def test_export_null_ts_and_negative_length_guard():
    """Null timestamps reach the export codec as pandas NaT (neither
    None nor a Timestamp) — the epoch fallback must fire, not a
    strftime crash; and a negative Content-Length must terminate the
    splitter instead of looping forever on the same record."""
    import pandas as pd

    from data_crawler_spark.sources.warc import (_page_record_bytes,
                                                 _text_record_bytes,
                                                 split_warc_records)

    for fn in (_page_record_bytes, _text_record_bytes):
        rec = fn("https://x/", pd.NaT, b"<p>x</p>", "rid")
        assert b"WARC-Date: 2026-01-01T00:00:00Z" in rec
    evil = b"WARC/1.0\r\ncontent-length: -33\r\n\r\nPADDING"
    assert list(split_warc_records(evil)) == []


def test_decompress_members_chunked_exact():
    """The bounded-chunk inflater is byte-exact across member shapes:
    tens of thousands of tiny members, members crossing chunk
    boundaries, and a truncated final member keeping its prefix."""
    import gzip

    from data_crawler_spark.sources.warc import _decompress_members

    parts = [(f"r{i} ".encode() * (i % 9 + 1)) for i in range(20000)]
    blob = b"".join(gzip.compress(p) for p in parts)
    assert _decompress_members(blob) == b"".join(parts)
    big = [b"x" * (3 << 20), b"y" * (1 << 20) + b"z"]
    assert _decompress_members(
        b"".join(gzip.compress(p) for p in big)) == b"".join(big)
    trunc = gzip.compress(b"whole") + gzip.compress(b"cut-off")[:-4]
    assert _decompress_members(trunc).startswith(b"whole")
