"""Fetch hygiene: charset sniffing, tolerant decoding, soft-404 and
error-page detection.

Real crawled bytes are not all UTF-8 and real 200-status responses
are not all content: a scale crawler sniffs the declared/BOM charset
before decoding, and screens out "soft 404s" — error pages served
with status 200 — before they pollute dedup signatures and the
training corpus. (The engine's extraction SPEC stays strict-UTF-8 —
functions/extract.py, byte-identity contract; this module is the
upstream normalization that gets arbitrary fetched bytes INTO that
contract.)

Scale shape: charset sniffing is native expressions over a bounded
binary prefix (the standard 1024-byte sniff window — the full html
never feeds a regex); the per-row-charset decode is the one genuinely
Python step (Arrow-batched mapInPandas, no per-row UDF); soft-404
detection is pure native expressions over already-extracted
text/title. Nothing here shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sniff_charset_col", "decode_pages", "soft404_col",
           "drop_soft404", "media_class_col", "filter_media"]

_SNIFF_BYTES = 1024
# charsets the tolerant decoder accepts; anything else falls back
_KNOWN = {"utf-8", "utf8", "latin-1", "latin1", "iso-8859-1",
          "windows-1252", "cp1252", "ascii", "utf-16", "utf-16le",
          "utf-16be"}


def sniff_charset_col(html: Column) -> Column:
    """html:binary -> declared charset (lowercase) or null.

    Priority, per the WHATWG encoding-sniffing order this engine
    needs: BOM (UTF-8 / UTF-16 LE/BE), then ``<meta charset=...>`` or
    ``http-equiv Content-Type`` inside the first 1 KiB, decoded
    permissively as latin-1 (every byte maps, so the regex sees all
    ASCII-compatible declarations). Null = undeclared (caller treats
    as UTF-8-with-fallback)."""
    head = F.substring(html, 1, _SNIFF_BYTES)
    # latin-1 decode of the sniff window: ASCII-transparent, total
    s = F.lower(F.decode(head, "ISO-8859-1"))
    meta = F.regexp_extract(
        s, r'charset\s*=\s*["\']?\s*([a-z0-9_\-]+)', 1)
    bom8 = F.lit(b"\xef\xbb\xbf")
    bom16le = F.lit(b"\xff\xfe")
    bom16be = F.lit(b"\xfe\xff")
    return (
        F.when(F.startswith(html, bom8), F.lit("utf-8"))
        .when(F.startswith(html, bom16le), F.lit("utf-16le"))
        .when(F.startswith(html, bom16be), F.lit("utf-16be"))
        .when(meta != "", meta)
    )


def decode_pages(pages: DataFrame, html_col: str = "html",
                 out_col: str = "html_utf8") -> DataFrame:
    """Tolerant decode: re-encode every page's bytes to clean UTF-8
    using its sniffed charset, falling back utf-8 -> windows-1252
    (never fails: cp1252's 5 unmapped bytes fall through to latin-1,
    which is total). Output column is ``binary`` — valid UTF-8 bytes
    satisfying the strict extraction spec. Adds ``charset_used``.

    Arrow-batched mapInPandas; passthrough columns preserved."""
    src = pages.withColumn("_sniffed", sniff_charset_col(F.col(html_col)))
    fields = ", ".join(f"`{c}` {t}" for c, t in src.dtypes)
    schema = f"{fields}, {out_col} binary, charset_used string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(raw, sniffed):
            if raw is None:
                return None, None
            raw = bytes(raw)
            cands = []
            if isinstance(sniffed, str) and sniffed in _KNOWN:
                cands.append(sniffed)
            cands += ["utf-8", "windows-1252", "latin-1"]
            for cs in cands:
                try:
                    # consume the BOM the sniff matched: Python's
                    # decode("utf-8"/"utf-16le"/...) keeps U+FEFF, and
                    # a leading ZWNBSP splits otherwise-exact dup
                    # fingerprints downstream
                    return one_encode(
                        raw.decode(cs).removeprefix("\ufeff")), cs
                except (UnicodeDecodeError, LookupError):
                    continue
            return one_encode(raw.decode("latin-1")), "latin-1"

        def one_encode(s: str) -> bytes:
            return s.encode("utf-8")

        for pdf in batches:
            out = [one(r, s) for r, s in
                   zip(pdf[html_col], pdf["_sniffed"])]
            pdf = pdf.copy()
            pdf[out_col] = [o[0] for o in out]
            pdf["charset_used"] = [o[1] for o in out]
            yield pdf

    return src.mapInPandas(fn, schema).drop("_sniffed")


# soft-404 phrase heuristics over extracted text/title — the standard
# signal set (Bar-Yossef et al., "Sic transit gloria telae": detect
# error pages by content, not status)
_ERR_PAT = (r"(?i)\b(page not found|404 not found|file not found|"
            r"error 404|no longer available|does not exist|"
            r"been removed|access denied|forbidden)\b")


def soft404_col(text: Column, title: Column | None = None,
                min_tokens: int = 5) -> Column:
    """true when the page looks like an error page served as content:
    an error phrase in the title (strongest), or an error phrase in a
    very short body (error pages are terse; a long article MENTIONING
    404 is not an error page)."""
    short = F.size(F.split(F.trim(text), r"\s+")) <= min_tokens
    body_hit = text.rlike(_ERR_PAT) & short
    if title is not None:
        return title.rlike(_ERR_PAT) | body_hit
    return body_hit


def drop_soft404(df: DataFrame, text_col: str = "text",
                 title_col: str | None = "title",
                 min_tokens: int = 5) -> DataFrame:
    title = (F.col(title_col)
             if title_col and title_col in df.columns else None)
    return df.where(~F.coalesce(
        soft404_col(F.col(text_col), title, min_tokens), F.lit(False)))


def media_class_col(content_type: Column) -> Column:
    """Fetched ``Content-Type`` header -> coarse media class the
    pipeline routes on: ``html`` (text/html, application/xhtml+xml),
    ``text`` (other text/*, JSON, XML, feeds), ``image`` / ``audio``
    / ``video`` (by top-level type), ``pdf``, ``other`` (any other
    declared type), ``unknown`` (null/empty header). Parameters after
    ';' (charset etc.) and surrounding whitespace are ignored; case-
    insensitive per RFC 9110. Pure map — the post-fetch complement to
    links.asset_url_filter's pre-fetch extension gate: html/text
    continues to extraction, image/audio/video feeds the multimodal
    table, pdf/other is a routing decision the caller owns."""
    mt = F.lower(F.trim(F.split_part(content_type, F.lit(";"), F.lit(1))))
    top = F.split_part(mt, F.lit("/"), F.lit(1))
    return (
        F.when(content_type.isNull() | (F.trim(content_type) == ""),
               "unknown")
        .when(mt.isin("text/html", "application/xhtml+xml"), "html")
        .when((top == "text")
              | mt.isin("application/json", "application/xml",
                        "application/rss+xml", "application/atom+xml",
                        "application/ld+json"), "text")
        .when(top == "image", "image")
        .when(top == "audio", "audio")
        .when(top == "video", "video")
        .when(mt == "application/pdf", "pdf")
        .otherwise("other"))


def filter_media(pages: DataFrame,
                 classes: tuple[str, ...] = ("html", "text"),
                 content_type_col: str = "content_type",
                 keep_unknown: bool = True) -> DataFrame:
    """Keep only pages whose fetched Content-Type falls in
    ``classes`` — the post-fetch gate that stops image bytes from
    riding into text extraction (an extension gate can't catch a
    ``/download?id=7`` endpoint serving a zip). ``keep_unknown``
    retains pages with no Content-Type header (common on old servers;
    the charset sniff + extraction still handle them) — set False for
    a strict pipeline. Pure map over the page scan."""
    valid = {"html", "text", "image", "audio", "video", "pdf", "other",
             "unknown"}
    bad = set(classes) - valid
    if bad:
        raise ValueError(f"unknown media classes: {sorted(bad)}")
    want = set(classes) | ({"unknown"} if keep_unknown else set())
    cls = media_class_col(F.col(content_type_col))
    return pages.filter(cls.isin(*sorted(want)))


# gzip magic (RFC 1952) and zlib CMF byte with valid FLG checksums
# (RFC 1950: CMF=0x78 covers every common window size; (CMF<<8|FLG)
# % 31 == 0 is the real validity test, applied per-row below)
_GZIP_MAGIC = b"\x1f\x8b"


def decompress_payloads(pages: DataFrame, bin_col: str = "payload",
                        out_col: str | None = None,
                        max_bytes: int = 64 << 20) -> DataFrame:
    """Transparently decompress gzip/zlib binary payloads (``.xml.gz``
    sitemaps, compressed WARC payload blocks, Content-Encoding bodies
    a fetcher stored raw), with a decompression-bomb guard: output
    larger than ``max_bytes`` is REFUSED, not materialized — at crawl
    scale a 10 KB bomb expanding to 10 GB inside an executor is a
    denial-of-service on the pipeline, so the inflate runs
    incrementally and stops the moment the cap is crossed.

    Detection is by content (gzip magic ``1f 8b``; zlib CMF/FLG
    checksum), not filename: uncompressed payloads pass through
    unchanged. Output columns: ``out_col`` (binary; the decompressed
    bytes, the passthrough bytes, or null on error/bomb — default
    replaces ``bin_col``) and ``{out_col}_codec`` (``gzip`` /
    ``zlib`` / ``raw`` / error strings ``corrupt`` / ``too_big``).

    This is the documented Python seam of this module (like
    decode_pages): one Arrow-batched mapInPandas stage, no per-row
    UDF, no shuffle. Compose with links.sitemap_urls /
    sitemap_entries for gzipped sitemaps: decompress -> decode ->
    parse."""
    if max_bytes <= 0:
        raise ValueError(f"max_bytes must be > 0, got {max_bytes}")
    out = out_col or bin_col
    keep = [c for c in pages.columns if c != out]
    fields = ", ".join(f"`{c}` {t}" for c, t in pages.dtypes
                       if c in keep)
    schema = f"{fields}, `{out}` binary, `{out}_codec` string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        def one(raw):
            if raw is None:
                return None, None
            raw = bytes(raw)
            is_gzip = raw[:2] == _GZIP_MAGIC
            is_zlib = (len(raw) >= 2 and (raw[0] & 0x0F) == 8
                       and (raw[0] >> 4) <= 7
                       and (raw[0] << 8 | raw[1]) % 31 == 0)
            if not (is_gzip or is_zlib):
                return raw, "raw"
            codec = "gzip" if is_gzip else "zlib"
            # wbits=47 auto-detects zlib vs gzip wrappers; inflate in
            # bounded steps so a bomb stops at the cap instead of
            # allocating the full plaintext
            d = zlib.decompressobj(47)
            chunks, total = [], 0
            try:
                buf = raw
                while True:
                    chunk = d.decompress(buf, 1 << 20)
                    chunks.append(chunk)
                    total += len(chunk)
                    if total > max_bytes:
                        return None, "too_big"
                    if d.eof:
                        tail = d.flush()
                        chunks.append(tail)
                        total += len(tail)
                        if total > max_bytes:
                            return None, "too_big"
                        # concatenated members (gzip -c a b; WARC
                        # files are one member PER RECORD) — keep
                        # inflating instead of silently truncating
                        # to the first member
                        rest = d.unused_data
                        if is_gzip and rest[:2] == _GZIP_MAGIC:
                            d = zlib.decompressobj(47)
                            buf = rest
                            continue
                        return b"".join(chunks), codec
                    if not d.unconsumed_tail:
                        return None, "corrupt"  # truncated stream
                    buf = d.unconsumed_tail
            except zlib.error:
                return None, "corrupt"
        for pdf in batches:
            res = [one(r) for r in pdf[bin_col]]
            pdf = pdf[[c for c in pdf.columns if c in keep]].copy()
            pdf[out] = [r[0] for r in res]
            pdf[f"{out}_codec"] = [r[1] for r in res]
            yield pdf

    return pages.mapInPandas(fn, schema)
