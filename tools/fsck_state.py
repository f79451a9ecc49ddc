#!/usr/bin/env python
"""fsck a crawl state dir: ``python tools/fsck_state.py STATE_DIR``.

Prints one JSON report (plans/fsck.py) and exits 1 on errors, 0 on a
clean or merely post-crash (warnings-only) state. Driver-side file
metadata only — no Spark session, no data reads."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_crawler_spark.plans.fsck import fsck_state  # noqa: E402


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    rep = fsck_state(argv[1])
    print(json.dumps(rep, indent=2, sort_keys=True))
    return 0 if rep["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
