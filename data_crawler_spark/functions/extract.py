"""Page extraction — the executable spec the reference's "per-page
requests+LLM structuring" is replaced with (BASELINE.json:6: vectorized
pandas/Arrow UDFs; byte-identical extracted text per url).

One implementation, three consumers:
  - the single-node oracle extractor (oracle/crawler.py)
  - the Spark scalar pandas UDF (operators/extractor.py)
  - the Spark mapInArrow bulk path (operators/extractor.py)
Byte-identity across all three is asserted in tests/test_extract.py.

Extraction spec over the Common-Crawl-style ``html:binary`` column:
  - html bytes are decoded as strict UTF-8 (SURVEY.md §4.3 — no
    locale/encoding dependence)
  - text   := contents of the FIRST <p>...</p> element (dotall), ""
              if absent
  - title  := contents of the first <title>...</title>, "" if absent
  - links  := every double-quoted href value of an <a> tag, in
              document order, unresolved (resolution is a separate op)
"""

from __future__ import annotations

import re

import pandas as pd

TEXT_RE = r"(?s)<p>(.*?)</p>"
TITLE_RE = r"(?s)<title>(.*?)</title>"
HREF_RE = r'<a href="([^"]*)"'
ANCHOR_RE = r'(?s)<a href="([^"]*)"[^>]*>(.*?)</a>'


def decode_html_series(html: pd.Series) -> pd.Series:
    """binary -> str, strict UTF-8. Nulls stay null; str input passes through."""
    non_null = html.dropna()
    if len(non_null) and isinstance(non_null.iloc[0], (bytes, bytearray)):
        return html.str.decode("utf-8")
    return html.astype(object)


def extract_text_series(html: pd.Series) -> pd.Series:
    """html:binary -> text:string (the byte-identity invariant column)."""
    h = decode_html_series(html)
    na = h.isna()
    t = h.astype("string").str.extract(TEXT_RE)[0].fillna("")
    return t.astype(object).where(~na, None)


def extract_title_series(html: pd.Series) -> pd.Series:
    h = decode_html_series(html)
    na = h.isna()
    t = h.astype("string").str.extract(TITLE_RE)[0].fillna("")
    return t.astype(object).where(~na, None)


def extract_links_series(html: pd.Series) -> pd.Series:
    """html:binary -> list[str] of raw hrefs, document order."""
    h = decode_html_series(html)
    na = h.isna()
    links = h.astype("string").str.findall(HREF_RE)
    links = links.apply(lambda v: list(v) if isinstance(v, list) else [])
    return links.astype(object).where(~na, None)


_ANCHOR_RX = re.compile(ANCHOR_RE)
_TAG_RX = re.compile(r"<[^>]*>")


def extract_anchors_series(html: pd.Series) -> pd.Series:
    """html:binary -> list[(href, anchor_text)] in document order.

    Anchor text is the <a>...</a> inner content with nested tags
    stripped and whitespace collapsed to single spaces — the form
    anchor-text corpora aggregate on. hrefs are raw (unresolved),
    same contract as extract_links_series."""
    h = decode_html_series(html)

    def one(s):
        if not isinstance(s, str):
            return None
        return [(href, " ".join(_TAG_RX.sub(" ", body).split()))
                for href, body in _ANCHOR_RX.findall(s)]

    return h.apply(one)
