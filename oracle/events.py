"""Executable spec for race-event structured extraction — the pure
Python mirror of operators/structured.py's race_events /
results_table_rows / race_event_records (the reference crawler's
hand-scraped marathon/trail-race payload, /root/reference/README.md:2).

Same contracts as the Spark side, implemented independently with
``re`` + ``json`` so tests/test_events.py can assert value-level
equality on arbitrary synthesized pages (attribute order, quote
styles, wrappers, broken JSON)."""

from __future__ import annotations

import json
import re

_JSONLD_RE = re.compile(
    r'<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)'
    r"</script>", re.I | re.S)
_RESULTS_TABLE_RE = re.compile(
    r'<table\b[^>]*class\s*=\s*["\'][^"\']*\bresults\b[^"\']*["\']'
    r"[^>]*>(.*?)</table>", re.I | re.S)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.I | re.S)
_CELL_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]*>", re.I | re.S)
_DIST_RE = re.compile(
    r"([0-9]+(?:\.[0-9]+)?)\s*(km|miles?|mi|k|m)?\b", re.I)
_TIME_RE = re.compile(r"^\d{1,2}:\d{2}(:\d{2})?$")

RACE_EVENT_TYPES = ("SportsEvent", "ExerciseEvent", "Event")


def _to_str(html) -> str:
    return html.decode("utf-8") if isinstance(html, (bytes, bytearray)) \
        else html


def distance_km(d) -> float | None:
    if not d:
        return None
    m = _DIST_RE.search(d)
    if not m:
        return None
    v = float(m.group(1))
    unit = (m.group(2) or "").lower()
    if unit in ("mi", "mile", "miles"):
        v *= 1.609344
    elif unit == "m":
        v *= 0.001
    return round(v, 3)


def time_seconds(t) -> int | None:
    if not t or not _TIME_RE.match(t):
        return None
    parts = [int(x) for x in t.split(":")]
    if len(parts) == 3:
        return parts[0] * 3600 + parts[1] * 60 + parts[2]
    return parts[0] * 60 + parts[1]


def _records(block: str) -> list[dict]:
    """A JSON-LD block's record list: @graph envelope, bare array, or
    single object; non-JSON -> []. Mirrors jsonld_typed_records."""
    try:
        obj = json.loads(block)
    except (json.JSONDecodeError, ValueError):
        return []
    if isinstance(obj, dict) and isinstance(obj.get("@graph"), list):
        return [r for r in obj["@graph"] if isinstance(r, dict)]
    if isinstance(obj, list):
        return [r for r in obj if isinstance(r, dict)]
    if isinstance(obj, dict):
        return [obj]
    return []


def race_events(url: str, html) -> list[dict]:
    """(url, block_idx, rec_idx, event_type, event_name, start_date,
    location_name, distance_km) dicts, document order."""
    out = []
    for bi, m in enumerate(_JSONLD_RE.finditer(_to_str(html))):
        for ri, rec in enumerate(_records(m.group(1).strip())):
            if rec.get("@type") not in RACE_EVENT_TYPES:
                continue
            loc = rec.get("location")
            loc_name = loc.get("name") if isinstance(loc, dict) else None
            out.append({
                "url": url, "block_idx": bi, "rec_idx": ri,
                "event_type": rec.get("@type"),
                "event_name": rec.get("name"),
                "start_date": rec.get("startDate"),
                "location_name": loc_name,
                "distance_km": distance_km(rec.get("distance")),
            })
    return out


def results_rows(url: str, html) -> list[dict]:
    """(url, place, bib, runner, time_s) dicts from the page's first
    results table; header-matched columns; rows without a place drop."""
    m = _RESULTS_TABLE_RE.search(_to_str(html))
    if not m:
        return []
    rows = [[_TAG_RE.sub("", c).strip()
             for c in _CELL_RE.findall(tr)]
            for tr in _TR_RE.findall(m.group(1))]
    if not rows:
        return []
    hdr = [c.lower() for c in rows[0]]

    def cell(r, name):
        try:
            return r[hdr.index(name)]
        except (ValueError, IndexError):
            return None

    out = []
    for r in rows[1:]:
        place = cell(r, "place")
        try:
            place = int(place)
        except (TypeError, ValueError):
            continue
        out.append({"url": url, "place": place, "bib": cell(r, "bib"),
                    "runner": cell(r, "name"),
                    "time_s": time_seconds(cell(r, "time"))})
    return out


def race_event_records(url: str, html) -> dict | None:
    """One merged record per event page (first event-typed JSON-LD
    record + results-table aggregate) or None — race_event_records'
    per-page mirror."""
    evs = race_events(url, html)
    if not evs:
        return None
    e = evs[0]  # document order == min (block_idx, rec_idx)
    res = results_rows(url, html)
    rec = {"url": url, "event_name": e["event_name"],
           "start_date": e["start_date"],
           "location_name": e["location_name"],
           "distance_km": e["distance_km"],
           "n_finishers": None, "winner": None, "winner_time_s": None}
    if res:
        win = min(res, key=lambda r: (r["place"], r["runner"] or ""))
        rec.update(n_finishers=len(res), winner=win["runner"],
                   winner_time_s=win["time_s"])
    return rec
