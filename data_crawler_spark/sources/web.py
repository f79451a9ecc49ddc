"""Deterministic synthetic Common-Crawl-style web (FIXTURES.md §B).

Generates the fetch universe the engine crawls (there is no live HTTP
in this sandbox — nor does the task allow external data): a
``pages(url, warc_ts, html, text, lang)`` table with the exact schema
fixed by BASELINE.json:15, plus per-host politeness/robots tables and
a seed list.

Determinism: every field is a pure function of (seed, row index) via
splitmix64 counter hashing — no RNG state, so the table is identical
regardless of chunking or process (SURVEY.md §4.3). Host distribution
is Zipf(s≈1.1) so a few "event-listing domains" dominate — required to
exercise salted skew-breaking (BASELINE.json:6,14).

Tiers: web1k (unit/oracle), web100k (integration), web10m (bench).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from data_crawler_spark.functions.hashing import splitmix64_np, xxhash64_str

ZIPF_S = 1.1
SECTIONS = 8
MAX_LINKS = 20
LANGS = np.array(["en", "es", "zh", "de", "fr"])
CRAWL_DELAYS = np.array([0, 1, 2, 5], dtype=np.int64)
# politeness budget (URLs/host/round) as a function of crawl_delay —
# the executable politeness spec shared with oracle/crawler.py
BUDGET_BY_DELAY = {0: 8, 1: 4, 2: 2, 5: 1}

WORDS = (
    "race trail marathon ultra summit ridge valley river forest alpine "
    "runner pace split finish start aid station elevation gain loss course "
    "record entry bib wave corral km mile loop out back climb descent "
    "checkpoint cutoff timing chip result official provisional age group "
    "overall podium series points season spring autumn winter summer "
    "registration open closed waitlist volunteer crew pacer drop bag "
    "weather sunny rain mud rock road gravel single track switchback "
    "north south east west upper lower old new long short big small "
    "event festival championship qualifier lottery permit park reserve"
).split()
WORDS_ARR = np.array(WORDS)

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in µs
TS_STEP_US = 1_000_003

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _h(seed: int, tag: str, idx: np.ndarray, slot: int = 0) -> np.ndarray:
    """Counter hash: uint64 stream keyed by (seed, tag, row index, slot)."""
    base = np.uint64((xxhash64_str(f"{tag}:{seed}:{slot}") & ((1 << 64) - 1)))
    with np.errstate(over="ignore"):
        x = idx.astype(np.uint64) * _GOLD + base
    return splitmix64_np(x)


def _zipf_cdf(n_hosts: int) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_hosts + 1, dtype=np.float64), ZIPF_S)
    return np.cumsum(w) / w.sum()


def host_name(rank: int) -> str:
    return f"host{rank}.example.com"


def page_url(host_rank: int, section: int, page_id: int) -> str:
    return f"https://{host_name(host_rank)}/sec{section}/p{page_id}.html"


def gen_web(out_dir: str | os.PathLike, n_pages: int, n_seeds: int,
            seed: int = 42, chunk: int = 10_000, force: bool = False) -> Path:
    """Generate (or reuse a cached) synthetic web under ``out_dir``."""
    out = Path(out_dir)
    meta_path = out / "meta.json"
    # v6: pages.parquet codec snappy -> zstd-1 (content identical — the
    # generator is seed-deterministic; only the encoding changed)
    meta = {"n_pages": n_pages, "n_seeds": n_seeds, "seed": seed, "v": 6}
    # chunk == parquet row-group size: scan task granularity is
    # bounded by row groups (~17MB at 10k rows) - byte splits smaller
    # than a row group produce empty tasks
    if meta_path.exists() and not force:
        if json.loads(meta_path.read_text()) == meta:
            return out
    out.mkdir(parents=True, exist_ok=True)

    n_hosts = max(10, n_pages // 200)
    assert n_seeds <= n_hosts
    cdf = _zipf_cdf(n_hosts)

    idx_all = np.arange(n_pages, dtype=np.uint64)
    u = _h(seed, "host", idx_all).astype(np.float64) / 2.0**64
    host = np.searchsorted(cdf, u).astype(np.int64)
    host[:n_seeds] = np.arange(n_seeds)  # seeds pinned to distinct hosts
    section = (_h(seed, "sec", idx_all) % np.uint64(SECTIONS)).astype(np.int64)

    # group page indices by host for same-host link targets
    order = np.argsort(host, kind="stable")
    counts = np.bincount(host, minlength=n_hosts).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    urls = np.array([page_url(host[i], section[i], i) for i in range(n_pages)], dtype=object)

    writer = None
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    try:
        for lo in range(0, n_pages, chunk):
            hi = min(lo + chunk, n_pages)
            idx = np.arange(lo, hi, dtype=np.uint64)
            m = hi - lo

            nw = (20 + _h(seed, "nw", idx) % np.uint64(60)).astype(np.int64)
            word_idx = np.empty((m, 80), dtype=np.int64)
            for t in range(80):
                word_idx[:, t] = (_h(seed, "w", idx, t) % np.uint64(len(WORDS_ARR))).astype(np.int64)
            words = WORDS_ARR[word_idx]

            nlinks = (_h(seed, "nl", idx) % np.uint64(MAX_LINKS + 1)).astype(np.int64)
            same = np.empty((m, MAX_LINKS), dtype=bool)
            tgt = np.empty((m, MAX_LINKS), dtype=np.int64)
            form = np.empty((m, MAX_LINKS), dtype=np.int64)
            for t in range(MAX_LINKS):
                hv = _h(seed, "lk", idx, t)
                same[:, t] = (hv % np.uint64(10)) < np.uint64(8)
                hv2 = _h(seed, "tg", idx, t)
                cross = (hv2 % np.uint64(n_pages)).astype(np.int64)
                hrow = host[lo:hi]
                pos = starts[hrow] + (hv2 % counts[hrow].astype(np.uint64)).astype(np.int64)
                same_t = order[pos]
                tgt[:, t] = np.where(same[:, t], same_t, cross)
                fv = _h(seed, "fm", idx, t)
                # 0..3: absolute; 4: root-relative; 5: dir-relative;
                # 250 exactly: weird-but-canonicalizable variant (~0.4%)
                form[:, t] = np.where((fv % np.uint64(250)) == np.uint64(0), 6,
                                      (fv % np.uint64(6)).astype(np.int64))

            lang = LANGS[(_h(seed, "lg", idx) % np.uint64(len(LANGS))).astype(np.int64)]

            texts, htmls = [], []
            for r in range(m):
                i = lo + r
                txt = " ".join(words[r, :nw[r]])
                parts = [f"<html><head><title>Page {i}</title></head><body><p>{txt}</p>"]
                for t in range(nlinks[r]):
                    j = tgt[r, t]
                    target = urls[j]
                    f = form[r, t]
                    if not same[r, t] or f <= 3:
                        href = target
                    elif f == 4:  # root-relative
                        href = f"/sec{section[j]}/p{j}.html"
                    elif f == 5:  # dir-relative via dot segments
                        href = f"../sec{section[j]}/p{j}.html"
                    else:  # weird variants that canonicalize to `target`
                        w = int(_h(seed, "wv", np.array([i], dtype=np.uint64), t)[0] % np.uint64(4))
                        if w == 0:
                            href = target.replace(
                                host_name(host[j]), host_name(host[j]).upper(), 1)
                        elif w == 1:
                            href = target.replace(".example.com/", ".example.com:443/", 1)
                        elif w == 2:
                            href = target + "#frag"
                        else:
                            href = target.replace("/sec", "/./sec", 1)
                    parts.append(f'<a href="{href}">link{t}</a>')
                parts.append("</body></html>")
                texts.append(txt)
                htmls.append("".join(parts).encode("utf-8"))

            batch = pa.record_batch([
                pa.array(urls[lo:hi], pa.string()),
                pa.array((BASE_TS_US + idx.astype(np.int64) * TS_STEP_US), pa.timestamp("us")),
                pa.array(htmls, pa.binary()),
                pa.array(texts, pa.string()),
                pa.array(lang, pa.string()),
            ], schema=schema)
            if writer is None:
                # zstd-1 over snappy: 27% smaller AND faster to decode
                # (measured 210MB->154MB, read 2.2s->1.4s per 500k rows)
                # — this store is re-scanned every crawl round and the
                # sandbox VM keeps no page cache, so bytes-on-disk is
                # the fetch join's floor
                writer = pq.ParquetWriter(out / "pages.parquet", schema,
                                          compression="zstd",
                                          compression_level=1)
            writer.write_batch(batch)
    finally:
        if writer is not None:
            writer.close()

    # hosts: politeness state (crawl_delay -> budget per round)
    hidx = np.arange(n_hosts, dtype=np.uint64)
    delay = CRAWL_DELAYS[(_h(seed, "cd", hidx) % np.uint64(4)).astype(np.int64)]
    budget = np.array([BUDGET_BY_DELAY[int(d)] for d in delay], dtype=np.int64)
    host_names = [host_name(r) for r in range(n_hosts)]
    pq.write_table(pa.table({
        "host": pa.array(host_names, pa.string()),
        "crawl_delay": pa.array(delay, pa.int64()),
        "budget_per_round": pa.array(budget, pa.int64()),
    }), out / "hosts.parquet")

    # robots rules: ~10% of hosts disallow /sec0/, with an allow
    # override for /sec0/p1 (longest-prefix-match, allow wins ties)
    rh, rt, rp = [], [], []
    blocked = (_h(seed, "rb", hidx) % np.uint64(10)) == np.uint64(0)
    for r in range(n_hosts):
        if blocked[r]:
            rh.append(host_names[r]); rt.append("disallow"); rp.append("/sec0/")
            rh.append(host_names[r]); rt.append("allow"); rp.append("/sec0/p1")
    pq.write_table(pa.table({
        "host": pa.array(rh, pa.string()),
        "rule_type": pa.array(rt, pa.string()),
        "path_prefix": pa.array(rp, pa.string()),
    }), out / "robots_rules.parquet")

    (out / "seeds.txt").write_text("\n".join(urls[:n_seeds]) + "\n")
    meta_path.write_text(json.dumps(meta))
    return out


TIERS = {
    "web1k": (1_000, 10),
    "web10k": (10_000, 20),
    "web100k": (100_000, 100),
    "web1m": (1_000_000, 100),
    "web10m": (10_000_000, 100),
}


def gen_tier(base_dir: str | os.PathLike, tier: str, seed: int = 42) -> Path:
    n, s = TIERS[tier]
    return gen_web(Path(base_dir) / tier, n, s, seed=seed)
