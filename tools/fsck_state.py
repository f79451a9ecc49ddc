#!/usr/bin/env python
"""fsck a crawl state dir:

    python tools/fsck_state.py STATE_DIR [--repair [--dry-run]]
                                         [--min-age-s N]

Prints one JSON report (plans/fsck.py) and exits 1 on errors, 0 on a
clean or merely post-crash (warnings-only) state. ``--repair``
reclaims unreferenced staged dirs and stale temp files (and ONLY
those; it refuses damaged states) — dirs younger than ``--min-age-s``
(default 3600) are skipped in case a live writer staged them.
``--repair --dry-run`` previews: lists the exact paths + bytes a real
repair would reclaim, deleting nothing.
Driver-side file metadata only — no Spark session, no data reads."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_crawler_spark.plans.fsck import (fsck_state,  # noqa: E402
                                           repair_state)


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("state_dir")
    ap.add_argument("--repair", action="store_true")
    ap.add_argument("--dry-run", action="store_true",
                    help="with --repair: list what would be reclaimed "
                         "(paths + bytes) without deleting anything")
    ap.add_argument("--min-age-s", type=float, default=3600.0)
    ap.add_argument("--index", metavar="NAME",
                    help="check a build-once/query-many index pair "
                         "(SearchIndex/AnnIndex) instead of a crawl state")
    args = ap.parse_args(argv[1:])
    if args.index and args.repair:
        ap.error("--repair applies to crawl states, not --index checks")
    if args.dry_run and not args.repair:
        ap.error("--dry-run only modifies --repair (plain fsck never "
                 "writes anyway)")
    if args.index:
        from data_crawler_spark.plans.fsck import fsck_index
        rep = fsck_index(args.state_dir, args.index)
        print(json.dumps(rep, indent=2, sort_keys=True))
        return 0 if rep["ok"] else 1
    if args.repair:
        try:
            res = repair_state(args.state_dir, min_age_s=args.min_age_s,
                               dry_run=args.dry_run)
        except ValueError:
            # damaged state: repair refuses — emit the fsck report the
            # docstring promises instead of a traceback
            rep = fsck_state(args.state_dir)
            print(json.dumps(rep, indent=2, sort_keys=True))
            return 1
        print(json.dumps(res, indent=2, sort_keys=True))
        return 0 if res["report"]["ok"] else 1
    rep = fsck_state(args.state_dir)
    print(json.dumps(rep, indent=2, sort_keys=True))
    return 0 if rep["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
