"""Regenerate golden files (SURVEY.md §5.6) from the oracle crawler.

Golden = first-100 visit order, per-round scheduled counts, and an
xxhash64 digest of the sorted seen set, per tier. Committed under
tests/golden/; regenerated ONLY by running this script explicitly.

Usage: python tools/make_golden.py [tier ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from data_crawler_spark.functions.hashing import xxhash64_str  # noqa: E402
from data_crawler_spark.sources.web import gen_tier  # noqa: E402
from oracle.crawler import OracleCrawler  # noqa: E402

MAX_ROUNDS = {"web1k": 8, "web10k": 6}


def seen_digest(seen: set[str]) -> int:
    acc = 0
    for u in sorted(seen):
        acc ^= xxhash64_str(u)
    return acc


def main() -> int:
    tiers = sys.argv[1:] or ["web1k"]
    out_dir = REPO / "tests" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)
    for tier in tiers:
        web = gen_tier(REPO / ".fixtures_cache", tier)
        res = OracleCrawler(web).run(max_rounds=MAX_ROUNDS.get(tier, 6))
        payload = {
            "tier": tier,
            "max_rounds": MAX_ROUNDS.get(tier, 6),
            "first_100_visits": [list(v) for v in res.visit_order[:100]],
            "scheduled_per_round": res.scheduled_per_round,
            "seen_count": len(res.seen),
            "seen_xxhash64_xor_digest": seen_digest(res.seen),
        }
        p = out_dir / f"{tier}.json"
        p.write_text(json.dumps(payload, indent=1))
        print(f"wrote {p}: {len(res.seen)} seen, "
              f"{len(res.scheduled_per_round)} rounds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
