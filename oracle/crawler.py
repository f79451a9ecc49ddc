"""Single-node oracle crawler — the executable specification.

The reference snapshot (/root/reference — README.md:1-2, no code; see
SURVEY.md §0) leaves "match the reference's crawl order / URL-seen set
/ extracted bytes" (BASELINE.json:2,14,15) without an executable
counterpart. This module IS that counterpart: a deterministic, pure
single-process BFS-with-priority crawler over the synthetic web, built
from the very same canonicalize/extract functions the Spark engine
uses as UDFs. tests/test_crawl_equivalence.py asserts the distributed
engine reproduces this crawler's visit order, seen set, and extracted
text exactly.

Semantics (the spec — mirrored op-by-op in data_crawler_spark.plans.crawl):
  round 0 frontier = canonicalized seed list (depth 0, priority 1.0).
  Each round k:
    1. candidates  = frontier (all entries are unseen by construction)
    2. robots gate = drop URLs whose path's LONGEST matching rule
       prefix for their host is a disallow (allow wins equal-length
       ties; hosts without rules allow everything)
    3. politeness  = per host, order by (priority DESC, depth ASC,
       discovered_round ASC, url ASC) and keep the top
       budget_per_round (a pure function of crawl_delay)
    4. visit order = scheduled set sorted by (priority DESC, depth
       ASC, host ASC, url ASC) — a total order (url is unique)
    5. seen += scheduled; frontier -= scheduled
    6. fetch+extract scheduled pages; discover out-links: resolve ->
       canonicalize -> keep http(s) -> drop already seen / already in
       frontier; same-url collisions keep min (discovered_round,
       depth, parent_url)
  Stop when nothing schedulable or max_rounds reached.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

from data_crawler_spark.functions.canonicalize import (
    canonicalize_series,
    host_of_series,
    path_of_series,
    resolve_href,
)
from data_crawler_spark.functions.extract import (
    extract_links_series,
    extract_text_series,
)

DEFAULT_BUDGET = 8


@dataclass
class FrontierEntry:
    depth: int
    priority: float
    discovered_round: int
    parent_url: str | None


@dataclass
class OracleResult:
    visit_order: list[tuple[int, str]] = field(default_factory=list)  # (round, url)
    seen: set[str] = field(default_factory=set)
    extracted: dict[str, str] = field(default_factory=dict)  # url -> text
    scheduled_per_round: list[int] = field(default_factory=list)
    frontier: dict[str, FrontierEntry] = field(default_factory=dict)


def priority_for_depth(depth: int) -> float:
    return 1.0 / (1.0 + depth)


def _load_rules(robots: pd.DataFrame) -> dict[str, list[tuple[str, bool]]]:
    rules: dict[str, list[tuple[str, bool]]] = {}
    for host, rtype, prefix in robots[["host", "rule_type", "path_prefix"]].itertuples(index=False):
        rules.setdefault(host, []).append((prefix, rtype == "allow"))
    return rules


def _rule_match(p: str, path: str) -> bool:
    """RFC 9309 path-rule match, mirroring the engine's
    operators/robots.host_rules_df semantics exactly: ``*`` matches any
    characters, a TRAILING ``$`` anchors the end (a mid-rule ``$`` is a
    literal byte), and wildcard-free rules are plain byte prefix
    matches. The engine compiles the same three cases to an anchored
    Java regex; this is the pure-Python spec of that compilation."""
    anchored = p.endswith("$")
    body = p[:-1] if anchored else p
    if "*" in p or anchored:
        rx = ("^" + ".*".join(re.escape(seg) for seg in body.split("*"))
              + ("$" if anchored else ""))
        return re.match(rx, path) is not None
    return path.startswith(p)


def robots_allows(rules: dict[str, list[tuple[str, bool]]], host: str, path: str) -> bool:
    # specificity = length of the ORIGINAL rule text (incl. * and $),
    # the engine's published tie metric (robots.py robots_gate)
    matching = [(len(p), allow) for p, allow in rules.get(host, [])
                if _rule_match(p, path)]
    if not matching:
        return True
    best_len = max(m[0] for m in matching)
    # allow wins ties at equal length
    return any(allow for ln, allow in matching if ln == best_len)


class OracleCrawler:
    """Pure single-node crawl over a generated web dir (sources/web.py)."""

    def __init__(self, web_dir: str | Path):
        web = Path(web_dir)
        pages = pq.read_table(web / "pages.parquet").to_pandas()
        self.pages = pages.set_index("url", drop=False)
        hosts = pq.read_table(web / "hosts.parquet").to_pandas()
        self.budget = dict(zip(hosts["host"], hosts["budget_per_round"].astype(int)))
        self.rules = _load_rules(pq.read_table(web / "robots_rules.parquet").to_pandas())
        self.seeds = [s for s in (web / "seeds.txt").read_text().splitlines() if s.strip()]
        # pre-extract text + resolved canonical out-links for every page
        html = pages["html"]
        self.text = dict(zip(pages["url"], extract_text_series(html)))
        raw_links = extract_links_series(html)
        out_links: dict[str, list[str]] = {}
        for url, links in zip(pages["url"], raw_links):
            resolved = pd.Series([resolve_href(url, h) for h in links], dtype=object)
            canon = canonicalize_series(resolved) if len(resolved) else resolved
            out_links[url] = [c for c in canon if isinstance(c, str) and c.startswith(("http://", "https://"))]
        self.out_links = out_links

    def run(self, max_rounds: int = 100) -> OracleResult:
        res = OracleResult()
        frontier: dict[str, FrontierEntry] = {}
        seed_canon = canonicalize_series(pd.Series(self.seeds, dtype=object))
        for u in seed_canon:
            if u.startswith(("http://", "https://")) and u not in frontier:
                frontier[u] = FrontierEntry(0, priority_for_depth(0), 0, None)

        hosts_of = lambda urls: host_of_series(pd.Series(urls, dtype=object))
        paths_of = lambda urls: path_of_series(pd.Series(urls, dtype=object))

        for rnd in range(max_rounds):
            if not frontier:
                break
            cand = list(frontier.keys())
            hs = list(hosts_of(cand))
            ps = list(paths_of(cand))
            per_host: dict[str, list[tuple]] = {}
            for url, h, p in zip(cand, hs, ps):
                if not robots_allows(self.rules, h, p):
                    continue
                e = frontier[url]
                per_host.setdefault(h, []).append(
                    (-e.priority, e.depth, e.discovered_round, url))
            scheduled: list[tuple[float, int, str, str]] = []
            for h, items in per_host.items():
                items.sort()
                b = self.budget.get(h, DEFAULT_BUDGET)
                for negp, depth, _dr, url in items[:b]:
                    scheduled.append((negp, depth, h, url))
            if not scheduled:
                break
            scheduled.sort()  # (priority DESC, depth ASC, host ASC, url ASC)
            res.scheduled_per_round.append(len(scheduled))

            discoveries: dict[str, list[tuple[int, int, str]]] = {}
            for _negp, depth, _h, url in scheduled:
                res.visit_order.append((rnd, url))
                res.seen.add(url)
                entry = frontier.pop(url)
                if url in self.text:
                    res.extracted[url] = self.text[url]
                    for link in self.out_links.get(url, []):
                        discoveries.setdefault(link, []).append(
                            (rnd + 1, entry.depth + 1, url))
            for link, opts in discoveries.items():
                if link in res.seen:
                    continue
                dr, depth, parent = min(opts)
                if link in frontier:
                    old = frontier[link]
                    if (old.discovered_round, old.depth, old.parent_url or "") <= (dr, depth, parent):
                        continue
                frontier[link] = FrontierEntry(depth, priority_for_depth(depth), dr, parent)
        res.frontier = frontier
        return res
