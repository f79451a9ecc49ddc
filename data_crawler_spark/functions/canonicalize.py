"""URL canonicalization + href resolution — the executable spec.

``canonicalize_series`` is the single implementation used by BOTH the
single-node oracle crawler and the Spark pandas UDF, so the engine's
URL-seen set matches the oracle's by construction (BASELINE.json:2,14
"crawl-order + URL-seen exact match"; SURVEY.md §2 op 05).

Spec (idempotent — property-tested in tests/test_canonicalize.py):
  1. strip surrounding whitespace
  2. drop the fragment (first '#' to end), then strip again
  3. lowercase scheme and host:port
  4. strip default ports (http:80, https:443)
  5. resolve dot segments and collapse '//' runs in the path
  6. empty path -> '/'; strip trailing '/' except for the root path
  7. query kept verbatim (empty '?' dropped)
Non-URL strings (no "scheme://") pass through steps 1-2 only; the
scheme predicate filter (op 07) removes them downstream.

Everything here is vectorized pandas (Arrow-batched when run as a UDF)
— no per-row Python in the engine path (BASELINE.json:15).
"""

from __future__ import annotations

import re

import pandas as pd

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}
# \Z (absolute end) rather than $ everywhere: Python's $ also matches
# before a FINAL \n, which made behavior on interior-newline garbage
# inputs depend on where the \n sat (and let fragments containing \n
# survive the fragment drop, contradicting the spec's own step 2).
# \Z semantics are newline-clean and are what the native JVM mirror
# (operators/links.py canonicalize_col) implements with Java \z.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?]*)(?:\?(.*))?\Z"
_MAX_DOT_PASSES = 64


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalizer. Nulls stay null."""
    orig_na = s.isna()
    u = s.astype("string").str.strip()
    # drop fragment, then re-strip (the fragment may have shielded
    # trailing whitespace — idempotence requires stripping again)
    u = u.str.replace(r"(?s)#.*", "", regex=True).str.strip()

    m = u.str.extract(_URL_RE)
    scheme = m[0].str.lower()
    hostport = m[1].str.lower()
    path = m[2]
    query = m[3]
    ok = scheme.notna()

    for sch, port in _DEFAULT_PORTS.items():
        # strip the whole trailing default-port RUN, not one copy:
        # garbage hosts like "h.io:80:80" must canonicalize in one
        # pass (idempotence) — ":8080" is untouched (no ':' before
        # the trailing "80")
        mask = ok & (scheme == sch) & hostport.str.endswith(port)
        if mask.any():
            hostport = hostport.mask(mask, hostport.str.replace(
                rf"(?:{port})+\Z", "", regex=True))

    path = path.fillna("")
    path = path.mask(ok & (path == ""), "/")
    has_q = query.notna() & (query != "")
    # queryless rows shed the path's trailing whitespace+slash junk
    # INSIDE the fixed-point loop: the query/fragment is gone, so that
    # run is terminal junk — and it must reduce together with the dot
    # rules, because each can expose the other ("/. " hides a dot
    # segment behind a space; "/a/ /." exposes a whitespace segment
    # when the dot drops). Rows with a query keep their path bytes
    # (the query shields them; single trailing-slash strip below).
    # Path-level on purpose: a URL-level strip would eat trailing
    # HOSTPORT bytes ("http://h.io:80 ?" has the space inside the host
    # group), changing what the default-port strip sees on a re-parse.
    noq = ok & ~has_q
    for _ in range(_MAX_DOT_PASSES):
        before = path
        junked = path.str.replace(r"(?s)[\s\x1c-\x1f/]+\Z", "", regex=True)
        junked = junked.mask(junked == "", "/")
        path = path.mask(noq, junked)
        path = path.str.replace(r"//+", "/", regex=True)
        # '/./' runs to ITS OWN fixed point: non-overlapping sub leaves
        # every second '/./' of a '/././..' run in place, and the later
        # '/X/../' pass would then cancel a '.' instead of a real
        # segment — the fixed point restores RFC 3986
        # remove-dot-segments semantics (mirrored by the native
        # stack-fold in operators/links.py; fuzz-tested equal).
        for _ in range(_MAX_DOT_PASSES):
            b2 = path.str.replace(r"/\./", "/", regex=True)
            if b2.equals(path):
                break
            path = b2
        path = path.str.replace(r"/\.\Z", "/", regex=True)
        path = path.str.replace(r"/(?!\.\.(?:/|\Z))[^/]+/\.\./", "/", regex=True)
        path = path.str.replace(r"/(?!\.\.(?:/|\Z))[^/]+/\.\.\Z", "/", regex=True)
        path = path.str.replace(r"^/\.\.(?=/|\Z)", "", regex=True)
        path = path.mask(ok & (path == ""), "/")
        if before.equals(path):
            break
    # single trailing-slash strip (all rows; for queryless rows the
    # loop already reached this fixed point, so it is a no-op there)
    path = path.str.replace(r"(?s)(.+?)/+\Z", r"\1", regex=True)

    res = scheme + "://" + hostport + path
    res = res.mask(has_q, res + "?" + query)
    out = u.where(~ok, res).str.strip()
    return out.astype(object).where(~orig_na, None)


def canonicalize_one(url: str) -> str:
    """Scalar convenience wrapper — same code path as the series form."""
    return canonicalize_series(pd.Series([url]))[0]


# ---------------------------------------------------------------------------
# href resolution (SURVEY.md §2 op 43 + 05). The Spark engine resolves
# hrefs with NATIVE column expressions (see operators/links.py) for
# JVM-side speed; this pure function is the oracle-side mirror and the
# equivalence test asserts both agree on every generated link.
# ---------------------------------------------------------------------------

_ROOT_RE = re.compile(r"^(https?://[^/?#]+)")
_BASEDIR_RE = re.compile(r"^(https?://.*/)[^/]*$")


def resolve_href(base: str, href: str) -> str:
    """Resolve ``href`` found on page ``base`` to an absolute URL.
    Protocol-relative hrefs inherit the base scheme; hrefs carrying
    any OTHER scheme (mailto:, javascript:) return untouched so the
    http filter drops them (the spec mirror of resolve_href_col —
    both sides MUST change together)."""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    m = _ROOT_RE.match(base)
    if not m:
        return href
    root = m.group(1)
    if href.startswith("//"):
        return base.split(":", 1)[0] + ":" + href
    if re.match(r"[A-Za-z][A-Za-z0-9+.\-]*:", href):
        return href
    if href.startswith("/"):
        return root + href
    md = _BASEDIR_RE.match(base)
    prefix = md.group(1) if md else root + "/"
    return prefix + href


def host_of_series(urls: pd.Series) -> pd.Series:
    """host[:port] of an (already canonical) URL; vectorized."""
    return urls.astype("string").str.extract(r"^[a-z][a-z0-9+.\-]*://([^/?#]*)")[0].astype(object)


def path_of_series(urls: pd.Series) -> pd.Series:
    """path ('/' if empty) of an (already canonical) URL; vectorized."""
    p = urls.astype("string").str.extract(r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)")[0]
    p = p.mask(p.notna() & (p == ""), "/")
    return p.astype(object)
