"""WARC (ISO 28500) ingestion — the Common-Crawl file-format seam.

The engine's native page store is parquet, but the public web corpus
the north rule targets ("Common-Crawl-style web pages",
BASELINE.json:15) ships as WARC: concatenated records, each a
``WARC/1.0`` version line, CRLF header block, ``Content-Length``-framed
payload, two closing CRLFs; Common Crawl compresses each record as its
own gzip *member* so a reader can split files without decompressing
the whole archive.

Spark shape (the layout public CC-on-Spark pipelines use): one WARC
file = one ``binaryFile`` row = one task — CC segments are ~1 GB, so
file-level parallelism is the natural 100 TB partitioning, and the
splitter streams records out of a single buffer per task (memory is
bounded by one file, never by the archive). Parsing runs in ONE
``mapInArrow`` stage: no shuffle, no per-row Python objects beyond the
header dict of the record being split.

``warc_pages`` projects response records onto the engine's fixed
``PAGES`` shape (schemas.py:19) so a crawl/extraction/cleaning plan
runs unchanged on WARC input. ``write_warc_pages`` is the inverse
seam (and the roundtrip fixture builder): pages -> spec-conformant
``.warc`` / ``.warc.gz`` files with ``application/http`` response
payloads.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from pathlib import Path
from typing import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

RECORDS_SCHEMA = pa.schema([
    ("warc_file", pa.string()),
    ("record_offset", pa.int64()),
    ("record_type", pa.string()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("http_status", pa.int32()),
    ("content_type", pa.string()),
    ("payload", pa.binary()),
    # revisit-record plumbing (null on every other record type)
    ("payload_digest", pa.string()),
    ("refers_to_url", pa.string()),
    ("refers_to_ts", pa.timestamp("us")),
])

_RECORDS_DDL = (
    "warc_file string, record_offset long, record_type string, "
    "url string, warc_ts timestamp, http_status int, "
    "content_type string, payload binary, payload_digest string, "
    "refers_to_url string, refers_to_ts timestamp"
)


# ---------------------------------------------------------------------------
# record-level codec (pure functions; shared by the Spark reader, the
# test writer, and any oracle check)
# ---------------------------------------------------------------------------

def _decompress_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the CC
    per-record layout). Plain (non-gzip) input passes through.

    Bounded-chunk feeding: handing the whole remaining tail to
    ``decompress()`` copies it in (the slice) and back out
    (``unused_data``) once per member — O(members × filesize) byte
    traffic on a ~1 GB CC file with tens of thousands of per-record
    members. 16 KiB chunks keep it linear; at most one chunk's tail ever
    rides ``unused_data``."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = io.BytesIO()
    view = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        while pos < n and not d.eof:
            chunk = view[pos:pos + (1 << 14)]
            out.write(d.decompress(chunk))
            pos += len(chunk)
        out.write(d.flush())
        if not d.eof:
            break  # truncated final member: keep what inflated
        pos -= len(d.unused_data)  # return the next member's bytes
    return out.getvalue()


def _parse_headers(block: bytes) -> dict[str, str]:
    """CRLF header block -> {lower(name): value}. Last repeat wins
    (WARC named headers are single-valued; tolerate sloppy writers)."""
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" not in line:
            continue
        name, _, value = line.partition(b":")
        headers[name.strip().lower().decode("ascii", "replace")] = (
            value.strip().decode("utf-8", "replace"))
    return headers


def split_warc_records(data: bytes) -> Iterator[tuple[int, dict[str, str], bytes]]:
    """Yield ``(offset, headers, payload)`` per record from one WARC
    buffer (raw or per-record-gzip). Content-Length framing per ISO
    28500 §4; offsets index the DECOMPRESSED stream. Malformed trailing
    bytes terminate the iteration rather than raising (a truncated
    tail record is dropped, matching lenient public readers)."""
    data = _decompress_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        start = pos
        if not data.startswith(b"WARC/", pos):
            return
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length would move pos BACKWARDS and loop
            # forever re-yielding the same record (untrusted-archive
            # DoS); treat like any other malformed framing
            return
        body_start = hdr_end + len(_HDR_END)
        if body_start + length > n:
            return
        yield start, headers, data[body_start:body_start + length]
        pos = body_start + length


def _parse_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """``application/http; msgtype=response`` payload ->
    (status, content-type, body)."""
    sep = block.find(_HDR_END)
    if sep < 0:
        return None, None, block
    head, body = block[:sep], block[sep + len(_HDR_END):]
    lines = head.split(_CRLF)
    status: int | None = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].upper().startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = _parse_headers(head[len(lines[0]):]).get("content-type")
    return status, ctype, body


def _parse_warc_date(value: str | None) -> datetime | None:
    """WARC-Date is ISO 8601 UTC (``2026-08-19T00:00:00Z``); returned
    tz-naive in UTC to match the engine's UTC-session timestamps."""
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) -> records DataFrame (``_RECORDS_DDL``).

    ``path`` is anything ``binaryFile`` accepts (dir, glob, single
    file); ``.warc`` and per-record ``.warc.gz`` both work. One
    mapInArrow stage, zero Exchange: the plan is
    ``binaryFile scan -> ArrowEval`` and record rows stream out in
    bounded Arrow batches."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            paths = b.column("path").to_pylist()
            contents = b.column("content")
            for i, fpath in enumerate(paths):
                buf = contents[i].as_py()
                cols: dict[str, list] = {k: [] for k in RECORDS_SCHEMA.names}
                for off, hdrs, payload in split_warc_records(buf):
                    rtype = hdrs.get("warc-type")
                    status = ctype = None
                    body = payload
                    if rtype in ("response", "request") and (
                            hdrs.get("content-type", "").startswith("application/http")):
                        status, ctype, body = _parse_http_response(payload)
                    cols["warc_file"].append(fpath)
                    cols["record_offset"].append(off)
                    cols["record_type"].append(rtype)
                    cols["url"].append(hdrs.get("warc-target-uri"))
                    cols["warc_ts"].append(_parse_warc_date(hdrs.get("warc-date")))
                    cols["http_status"].append(status)
                    cols["content_type"].append(ctype)
                    cols["payload"].append(body)
                    cols["payload_digest"].append(
                        hdrs.get("warc-payload-digest"))
                    cols["refers_to_url"].append(
                        hdrs.get("warc-refers-to-target-uri"))
                    cols["refers_to_ts"].append(
                        _parse_warc_date(hdrs.get("warc-refers-to-date")))
                if cols["warc_file"]:
                    yield pa.RecordBatch.from_pydict(cols, schema=RECORDS_SCHEMA)

    return files.mapInArrow(fn, _RECORDS_DDL)


def warc_pages(records: DataFrame, ok_only: bool = True) -> DataFrame:
    """Response records -> the engine's ``PAGES`` ingest shape
    (url, warc_ts, html). ``ok_only`` keeps HTTP 200 (the CC-pipeline
    default); the projection/filter is a pure map over the records
    stream so Catalyst fuses it into the reader stage."""
    df = records.where(
        (F.col("record_type") == "response") & F.col("url").isNotNull())
    if ok_only:
        df = df.where(F.col("http_status") == 200)
    return df.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("payload").alias("html"),
    )


# ---------------------------------------------------------------------------
# writer (fixture builder / export sink)
# ---------------------------------------------------------------------------

def warc_record_bytes(headers: dict[str, str], payload: bytes) -> bytes:
    """One spec-conformant record: version line, named headers with
    Content-Length, framed payload, two closing CRLFs."""
    out = [b"WARC/1.0"]
    for k, v in headers.items():
        out.append(f"{k}: {v}".encode("utf-8"))
    out.append(f"Content-Length: {len(payload)}".encode("ascii"))
    head = _CRLF.join(out) + _HDR_END
    return head + payload + _CRLF + _CRLF


def _http_response_bytes(html: bytes, content_type: str = "text/html") -> bytes:
    head = (
        b"HTTP/1.1 200 OK" + _CRLF
        + f"Content-Type: {content_type}".encode("ascii") + _CRLF
        + f"Content-Length: {len(html)}".encode("ascii") + _HDR_END
    )
    return head + html


def _warc_date(ts, default: str = "2026-01-01T00:00:00Z") -> str:
    """null-safe WARC-Date: pandas renders a null timestamp as NaT,
    which is neither None nor a pd.Timestamp — strftime on it raises,
    so every null representation routes to the default."""
    if ts is None or pd.isna(ts):
        return default
    if isinstance(ts, pd.Timestamp):
        ts = ts.to_pydatetime()
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _page_record_bytes(url: str, ts, html, rec_id: str) -> bytes:
    """One response record for a pages row — the shared export codec."""
    date = _warc_date(ts)
    if not isinstance(html, (bytes, bytearray)):
        html = (html or "").encode("utf-8")
    return warc_record_bytes(
        {"WARC-Type": "response",
         "WARC-Record-ID": f"<{rec_id}>",
         "WARC-Date": date,
         "WARC-Target-URI": url,
         "Content-Type": "application/http; msgtype=response"},
        _http_response_bytes(bytes(html)))


def _text_record_bytes(url: str, ts, text, rec_id: str) -> bytes:
    """One WET ``conversion`` record for an extracted-text row."""
    date = _warc_date(ts)
    payload = (text or "").encode("utf-8") \
        if not isinstance(text, (bytes, bytearray)) else bytes(text)
    return warc_record_bytes(
        {"WARC-Type": "conversion",
         "WARC-Record-ID": f"<{rec_id}>",
         "WARC-Date": date,
         "WARC-Target-URI": url,
         "Content-Type": "text/plain"},
        payload)


_WARCINFO = warc_record_bytes(
    {"WARC-Type": "warcinfo",
     "WARC-Record-ID": "<urn:uuid:rec-info>",
     "WARC-Date": "2026-01-01T00:00:00Z",
     "Content-Type": "application/warc-fields"},
    b"software: data_crawler_spark\r\n")


def _export_sink(src: DataFrame, out_dir: str | Path, base_ext: str,
                 gzip_records: bool, make_record,
                 target_bytes: int | None = None) -> DataFrame:
    """Shared distributed record sink: each task streams its rows
    through the record codec into ``part-<partition>[-<seq>]<ext>``
    files under ``out_dir`` and emits one manifest row per file.
    ``make_record(row, rec_id) -> bytes`` is the per-row codec.

    The export is embarrassingly parallel — no shuffle is added.
    Without ``target_bytes`` each partition writes ONE file (file
    count == partition count; callers size files with ``repartition``/
    ``coalesce``, the same lever as parquet). With ``target_bytes``
    (the CC convention is ~1 GB parts) a task ROTATES to
    ``part-<pid>-<seq>`` once the current file passes the target, so
    file sizes stay near the target no matter how large a partition
    is — the knob that matters when one export partition carries many
    GB at 100 TB scale. Every file opens with its own warcinfo record
    (each CC part file is independently readable) and memory stays
    constant: rotation is a close-and-reopen on the byte counter,
    never a buffer. ``out_dir`` must be a task-writable shared
    filesystem (the standard contract for executor-written sinks).
    The returned manifest is lazy; run an action to execute the
    export."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    suffix = base_ext + (".gz" if gzip_records else "")
    mschema = "warc_file string, n_records long, n_bytes long"

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        info = (gzip.compress(_WARCINFO, compresslevel=1, mtime=0)
                if gzip_records else _WARCINFO)

        def encoded(row, rid: str) -> bytes:
            rec = make_record(row, rid)
            return (gzip.compress(rec, compresslevel=1, mtime=0)
                    if gzip_records else rec)

        def path_for(seq: int) -> Path:
            if target_bytes is None:
                return out / f"part-{pid:05d}{suffix}"
            return out / f"part-{pid:05d}-{seq:04d}{suffix}"

        # hard-killed attempt hygiene (ADVICE r5): an attempt killed
        # before the except-block runs (executor death) can leave
        # part-<pid>-NNNN files behind; a retry that rotates FEWER
        # files would never overwrite the higher-seq leftovers, and a
        # reader globbing the directory cannot tell them from output.
        # Delete this partition id's files up front so the retry's own
        # writes are the only part-<pid> files that can exist.
        for stale in out.glob(f"part-{pid:05d}*{suffix}"):
            stale.unlink(missing_ok=True)
        # stream records straight to the open file — buffering a whole
        # partition's encoded records (plus a joined second copy) peaks
        # at >2x the output file size per task, a multi-GB OOM risk at
        # the ~1 GB-per-file CC sizing this sink documents
        files: list[tuple[Path, int]] = []  # closed (path, n_records)
        seq = n_total = n_file = 0
        fpath = path_for(seq)
        fh = open(fpath, "wb")
        try:
            fh.write(info)
            for b in batches:
                pdf = b.to_pandas()
                for row in pdf.itertuples(index=False):
                    if (target_bytes is not None
                            and fh.tell() >= target_bytes and n_file):
                        fh.close()
                        files.append((fpath, n_file))
                        seq += 1
                        n_file = 0
                        fpath = path_for(seq)
                        fh = open(fpath, "wb")
                        fh.write(info)
                    fh.write(encoded(row, f"urn:uuid:rec-{pid}-{n_total}"))
                    n_total += 1
                    n_file += 1
            fh.close()
            files.append((fpath, n_file))
        except BaseException:
            # a failed task must not leave half-written part files a
            # reader could mistake for output ('wb' on retry would
            # overwrite, but only if the retry lands on this pid)
            fh.close()
            fpath.unlink(missing_ok=True)
            for p, _ in files:
                p.unlink(missing_ok=True)
            raise
        yield pa.RecordBatch.from_pydict(
            {"warc_file": [str(p) for p, _ in files],
             "n_records": [c for _, c in files],
             "n_bytes": [p.stat().st_size for p, _ in files]})

    return src.mapInArrow(fn, mschema)


def export_warc(pages: DataFrame, out_dir: str | Path,
                gzip_records: bool = True,
                target_bytes: int | None = None) -> DataFrame:
    """Distributed WARC sink over (url, warc_ts, html): one
    ``part-<partition>.warc[.gz]`` per task plus a lazy manifest row
    ``(warc_file, n_records, n_bytes)`` per part — see ``_export_sink``
    for the scale contract and the ``target_bytes`` (~1 GB CC parts)
    rotation knob. Roundtrip with ``read_warc`` is byte-identical per
    page (tested)."""
    return _export_sink(
        pages.select("url", "warc_ts", "html"), out_dir, ".warc",
        gzip_records,
        lambda row, rid: _page_record_bytes(
            row.url, row.warc_ts, row.html, rid),
        target_bytes=target_bytes)


def export_wet(pages: DataFrame, out_dir: str | Path,
               text_col: str = "text",
               gzip_records: bool = True,
               target_bytes: int | None = None) -> DataFrame:
    """Distributed WET sink: the Common-Crawl extracted-text layout —
    one ``conversion`` record per page (``Content-Type: text/plain``,
    UTF-8 payload) in ``part-<partition>.warc.wet[.gz]`` files, lazy
    manifest as in ``export_warc``. This is the publishing format for
    a text corpus the crawl extracted: downstream consumers that read
    CC WET files read these. Null text exports as an empty record
    (the CC convention for pages whose extraction yielded nothing).
    Roundtrip: ``wet_text(read_warc(...))`` recovers (url, warc_ts,
    text) exactly (tested)."""
    return _export_sink(
        pages.select("url", "warc_ts", text_col), out_dir, ".warc.wet",
        gzip_records,
        lambda row, rid: _text_record_bytes(
            row.url, row.warc_ts, getattr(row, text_col), rid),
        target_bytes=target_bytes)


def wet_text(records: DataFrame) -> DataFrame:
    """Conversion records (a read-back WET file) -> (url, warc_ts,
    text). Pure map over the reader stream — Catalyst fuses the
    filter/projection into the ``read_warc`` stage; the UTF-8 decode
    is the native ``F.decode`` expression."""
    return (records.where((F.col("record_type") == "conversion")
                          & F.col("url").isNotNull())
            .select("url", "warc_ts",
                    F.decode(F.col("payload"), "UTF-8").alias("text")))


def write_warc_pages(pages: pd.DataFrame, path: str | Path,
                     gzip_records: bool = False,
                     record_id_prefix: str = "urn:uuid:rec") -> Path:
    """Pages frame (url, warc_ts, html) -> one WARC file. Each record
    is its own gzip member when ``gzip_records`` (the CC layout).
    Driver-side by design: ``export_warc`` is the distributed form
    over the same byte codec; tests and fixture builders need the
    deterministic single-file form."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    chunks: list[bytes] = [_WARCINFO]
    for i, row in enumerate(pages.itertuples(index=False)):
        chunks.append(_page_record_bytes(
            row.url, row.warc_ts, row.html, f"{record_id_prefix}-{i}"))
    if gzip_records:
        data = b"".join(
            gzip.compress(c, compresslevel=1, mtime=0) for c in chunks)
    else:
        data = b"".join(chunks)
    path.write_bytes(data)
    return path


# ---------------------------------------------------------------------------
# WAT: per-page metadata sidecar records (the third CC artifact next to
# WARC captures and WET extracted text)
# ---------------------------------------------------------------------------

def _metadata_record_bytes(url: str, ts, wat_json, rec_id: str) -> bytes:
    """One WARC ``metadata`` record carrying a JSON payload — the WAT
    record framing."""
    date = _warc_date(ts)
    payload = (wat_json or "").encode("utf-8")
    return warc_record_bytes(
        {"WARC-Type": "metadata",
         "WARC-Record-ID": f"<{rec_id}>",
         "WARC-Date": date,
         "WARC-Target-URI": url,
         "Content-Type": "application/json"},
        payload)


def page_wat(pages: DataFrame, url_col: str = "url",
             ts_col: str = "warc_ts",
             html_col: str = "html") -> DataFrame:
    """Pages -> ``(url, warc_ts, wat_json)``: the WAT metadata envelope
    (Common Crawl's per-page JSON sidecar) with the HTML head title,
    the <meta> name/property pairs, and the page's raw quoted hrefs —
    the summary downstream consumers read INSTEAD of parsing 100 TB of
    HTML themselves (link-graph builds, title indexes, meta-tag mining
    all run off WAT at a ~10x byte discount).

    All native expressions (title/href regex + the structured-data
    meta extractor + ``to_json``): pure map over the page scan, zero
    Exchange / zero Python, the html column never leaves the scan.
    Unquoted hrefs are omitted by design — the engine's canonical link
    path is the Arrow extractor (operators/links.py); WAT mirrors the
    quoted forms, which is what its consumers key on."""
    from data_crawler_spark.operators.structured import meta_entries_col

    s = F.col(html_col).cast("string")
    title = F.regexp_extract(s, r"(?is)<title[^>]*>\s*(.*?)\s*</title>", 1)
    # document order: pull the <a> tags first, then the href per tag
    # (meta_entries_col's shape) — a single-pass alternation regex
    # can't keep one capture group across both quote styles
    tags = F.regexp_extract_all(s, F.lit(r"(?is)<a\b[^>]*>"), 0)

    def _href(t: Column) -> Column:
        # (?<![\w-]): \b treats '-' as a boundary, so data-href
        # would match and inject non-link values into WAT Links
        dq = F.regexp_extract(t, r'(?is)(?<![\w-])href\s*=\s*"([^"]*)"', 1)
        sq = F.regexp_extract(t, r"(?is)(?<![\w-])href\s*=\s*'([^']*)'", 1)
        return F.when(dq != "", dq).otherwise(sq)

    links = F.filter(F.transform(tags, _href), lambda u: u != "")
    env = F.struct(
        F.struct(
            F.col(url_col).alias("WARC-Target-URI"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    F.when(title != "", title).alias("Title"),
                    meta_entries_col(F.col(html_col)).alias("Metas"),
                ).alias("Head"),
                F.transform(
                    links, lambda u: F.struct(u.alias("url"))
                ).alias("Links"),
            ).alias("HTML-Metadata"),
        ).alias("Payload-Metadata"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.to_json(F.struct(env.alias("Envelope")),
                  {"ignoreNullFields": "false"}).alias("wat_json"))


def export_wat(wat: DataFrame, out_dir: str | Path,
               json_col: str = "wat_json",
               gzip_records: bool = True,
               target_bytes: int | None = None) -> DataFrame:
    """Distributed WAT sink: one WARC ``metadata`` record per page
    (``Content-Type: application/json``, the ``page_wat`` envelope as
    payload) in ``part-<partition>.warc.wat[.gz]`` files, lazy
    manifest as in ``export_warc`` — same embarrassingly-parallel
    sink, no added shuffle. Roundtrip: ``wat_entries(read_warc(...))``
    recovers (url, warc_ts, wat_json) exactly (tested)."""
    return _export_sink(
        wat.select("url", "warc_ts", json_col), out_dir, ".warc.wat",
        gzip_records,
        lambda row, rid: _metadata_record_bytes(
            row.url, row.warc_ts, getattr(row, json_col), rid),
        target_bytes=target_bytes)


def wat_entries(records: DataFrame) -> DataFrame:
    """Metadata records (a read-back WAT file) -> (url, warc_ts,
    wat_json). Pure map over the reader stream, like ``wet_text``."""
    return (records.where((F.col("record_type") == "metadata")
                          & F.col("url").isNotNull())
            .select("url", "warc_ts",
                    F.decode(F.col("payload"), "UTF-8").alias("wat_json")))


# ---------------------------------------------------------------------------
# revisit-record deduplication (Heritrix-style identical-payload-digest)
# ---------------------------------------------------------------------------

#: WARC 1.1 revisit profile URI for "same URI served identical bytes".
REVISIT_PROFILE = "http://netpreservation.org/warc/1.1/revisit/identical-payload-digest"


def payload_digest_col(html: Column) -> Column:
    """The engine's WARC payload digest: ``xxh64:<16-hex>`` over the
    payload bytes. Common Crawl labels sha1:BASE32; the spec only
    requires a labelled algorithm, and xxhash64 keeps BOTH sides of
    the dedup comparison native JVM expressions (no Python touches the
    corpus to decide revisit-vs-response)."""
    b = html.cast("binary")
    return F.concat(F.lit("xxh64:"),
                    F.lpad(F.lower(F.hex(F.xxhash64(b))), 16, "0"))


def latest_capture_index(pages: DataFrame) -> DataFrame:
    """(url, ref_ts, ref_digest) of each url's LATEST capture — the
    dedup index a delta crawl carries from the previous one. One
    map-side-partial max_by with the digest in the tie-break struct so
    same-ts captures pick layout-independently."""
    d = payload_digest_col(F.col("html"))
    return (pages
            .select("url", "warc_ts", d.alias("_d"))
            .groupBy("url")
            .agg(F.max_by(F.struct(F.col("warc_ts").alias("ref_ts"),
                                   F.col("_d").alias("ref_digest")),
                          F.struct(F.col("warc_ts"), F.col("_d")))
                 .alias("_p"))
            .select("url", "_p.ref_ts", "_p.ref_digest"))


def _revisit_record_bytes(url: str, ts, digest: str, ref_url: str,
                          ref_ts, rec_id: str) -> bytes:
    """One ``revisit`` record: HTTP headers only, no body — the whole
    point is not storing the identical payload twice."""
    date = _warc_date(ts)
    ref_date = _warc_date(ref_ts, default=date)
    return warc_record_bytes(
        {"WARC-Type": "revisit",
         "WARC-Record-ID": f"<{rec_id}>",
         "WARC-Date": date,
         "WARC-Target-URI": url,
         "WARC-Profile": REVISIT_PROFILE,
         "WARC-Payload-Digest": digest,
         "WARC-Refers-To-Target-URI": ref_url,
         "WARC-Refers-To-Date": ref_date,
         "Content-Type": "application/http; msgtype=response"},
        b"HTTP/1.1 200 OK" + _CRLF + b"Content-Type: text/html" + _HDR_END)


def export_warc_deduped(pages: DataFrame, prior_index: DataFrame,
                        out_dir: str | Path,
                        gzip_records: bool = True,
                        target_bytes: int | None = None) -> DataFrame:
    """``export_warc`` with Heritrix-style payload dedup against a
    previous crawl: a page whose payload digest equals its url's entry
    in ``prior_index`` (``latest_capture_index`` of the prior crawl)
    exports as a body-less ``revisit`` record pointing at the prior
    capture; everything else exports as a full ``response``. At
    recrawl cadence most of the web hasn't changed, so this is the
    difference between re-archiving the corpus and archiving the delta.

    Distributed shape: the digest is a native expression, the index
    join is per-url (slim rows — the html column never rides it when
    the optimizer pushes the digest projection down; the index itself
    is O(urls) × ~50 bytes), and the sink stays the shared
    embarrassingly-parallel ``_export_sink``. Reconstruction:
    ``resolve_revisits`` re-materializes full pages from the prior
    store."""
    d = payload_digest_col(F.col("html"))
    idx = prior_index.select(
        F.col("url").alias("_iu"), "ref_ts", "ref_digest")
    # no leading underscores: itertuples drops those as attributes
    src = (pages
           .withColumn("digest", d)
           .join(idx, F.col("url") == F.col("_iu"), "left")
           .withColumn("is_revisit",
                       F.coalesce(F.col("ref_digest") == F.col("digest"),
                                  F.lit(False)))
           .select("url", "warc_ts", "html", "digest",
                   "is_revisit", "ref_ts"))

    def make(row, rid):
        if row.is_revisit:
            return _revisit_record_bytes(
                row.url, row.warc_ts, row.digest, row.url, row.ref_ts,
                rid)
        return _page_record_bytes(row.url, row.warc_ts, row.html, rid)

    return _export_sink(src, out_dir, ".warc", gzip_records, make,
                        target_bytes=target_bytes)


def resolve_revisits(records: DataFrame, prior_pages: DataFrame,
                     on_missing: str = "error") -> DataFrame:
    """Read-back inverse of ``export_warc_deduped``: response records
    pass through; ``revisit`` records re-materialize their payload
    from the PRIOR crawl's page store by (refers-to url, refers-to
    date, payload digest), keeping the REVISIT's own capture
    timestamp. Returns the engine's PAGES shape (url, warc_ts, html).

    The digest rides the join because WARC-Date carries whole seconds:
    two prior captures of one url inside the same second would
    otherwise BOTH match and attach one wrong payload. Digests in a
    foreign label (sha1 from other archivers) can't be checked against
    the xxh64 store and fall back to the (url, second) match. Matches
    that survive as duplicates are byte-identical payloads by digest
    equality — one is kept per revisit record.

    ``on_missing``: a revisit whose referred capture is absent from
    ``prior_pages`` (pruned store, malformed refers-to) is silent
    corpus loss — ``"error"`` (default) raises with the count,
    ``"drop"`` discards those records deliberately. One equi-join on
    the referred key — revisits are the small side at recrawl cadence,
    so AQE broadcast-plans it when the delta is small."""
    if on_missing not in ("error", "drop"):
        raise ValueError(
            f"on_missing must be 'error' or 'drop', got {on_missing!r}")
    resp = warc_pages(records)
    rev = records.where((F.col("record_type") == "revisit")
                        & F.col("url").isNotNull())
    prior = prior_pages.select(
        F.col("url").alias("_pu"),
        F.col("warc_ts").alias("_pts"),
        F.col("html").alias("_ph"),
        payload_digest_col(F.col("html")).alias("_pd"))
    digest_ok = (F.col("payload_digest").isNull()
                 | ~F.col("payload_digest").startswith("xxh64:")
                 | (F.col("payload_digest") == F.col("_pd")))
    # WARC-Date carries whole seconds; the prior store may carry µs
    joined = rev.join(
        prior,
        (F.col("refers_to_url") == F.col("_pu"))
        & (F.col("refers_to_ts") == F.date_trunc("second", F.col("_pts")))
        & digest_ok,
        "left")
    if on_missing == "error":
        # ONE aggregate for count + example — count() then first()
        # would re-run the whole join (binaryFile parse + digest pass)
        # twice before the downstream action runs it again
        miss = F.when(F.col("_ph").isNull(), 1).otherwise(0)
        st = joined.select(
            F.sum(miss).alias("n"),
            F.min(F.when(F.col("_ph").isNull(),
                         F.struct("url", "refers_to_url"))).alias("ex"),
        ).first()
        if st["n"]:
            raise RuntimeError(
                f"{st['n']} revisit record(s) reference captures "
                f"absent from prior_pages (first: {st['ex']['url']} -> "
                f"{st['ex']['refers_to_url']}); pass on_missing='drop' "
                "to discard them deliberately")
    from pyspark.sql import Window

    # deterministic survivor on the foreign/null-digest fallback path:
    # two same-second prior captures with DIFFERENT bytes both pass
    # digest_ok there, and dropDuplicates would keep an arbitrary one —
    # order by (digest, capture ts) so the pick is data-determined
    w = (Window.partitionBy("url", "warc_ts", "refers_to_url",
                            "refers_to_ts")
         .orderBy(F.asc("_pd"), F.asc("_pts")))
    filled = (joined.filter(F.col("_ph").isNotNull())
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .select("url", "warc_ts", F.col("_ph").alias("html")))
    return resp.unionByName(filled)
