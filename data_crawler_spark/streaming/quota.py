"""Custom stateful streaming operator (SURVEY.md §2.9; the session
brief's "applyInPandasWithState for custom stateful operators"):
a per-host fetch-quota gate over an unbounded request stream.

Semantics: at most ``budget`` fetches per host per ``interval_s``
fixed event-time window; excess requests are emitted with
``allowed = false`` (a streaming mirror of the batch politeness
budget in operators/scheduler.py). State per host is two ints —
(current window id, fetches used in it) — so state size is O(hosts),
not O(requests), and survives across micro-batches.

Vectorized inside each group (numpy window ids + cumulative counts);
the per-row work stays in C, honoring the no-per-row-Python rule to
the extent the stateful API allows (the API itself is the sanctioned
pandas-batch surface).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "host string, ts timestamp, allowed boolean"
STATE_SCHEMA = "win long, used long"


def _gate_batch(pdf: pd.DataFrame, budget: int, interval_s: int,
                win: int | None, used: int) -> tuple[pd.DataFrame, int | None, int]:
    """Vectorized quota pass over one (sorted) pandas batch; returns the
    gated frame and the new (win, used) state. Pure function — shared
    by the streaming operator and the test's reference computation.

    ``win is None`` = no state yet (there is no watermark here, so -1
    would collide with legitimate pre-epoch window ids). Late rows —
    rows in a window OLDER than the state's — are DENIED and never
    touch state: committing their window would regress (win, used) and
    hand the current window a fresh budget on the next batch."""
    pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    ts = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    w = ts // (interval_s * 1_000_000)
    # position of each row within its window (0-based), vectorized:
    # windows arrive sorted, so cumcount = index - first-index-of-window
    first_idx = np.zeros(len(w), dtype=np.int64)
    if len(w):
        new_win = np.flatnonzero(np.diff(w)) + 1
        starts = np.concatenate(([0], new_win))
        first_idx = starts[np.searchsorted(starts, np.arange(len(w)), "right") - 1]
    pos = np.arange(len(w)) - first_idx
    # rows continuing the state's current window start offset by `used`
    if len(w) and win is not None:
        pos = pos + np.where(w == win, used, 0)
    allowed = pos < budget
    if len(w) and win is not None:
        allowed &= w >= win  # late-window rows: deny, don't regress state
    if len(w):
        last_w = int(w[-1])
        if win is None or last_w > win:
            used = int(allowed[w == last_w].sum())
            win = last_w
        elif last_w == win:
            used = int(used) + int(allowed[w == last_w].sum())
        # last_w < win: whole batch was late — state untouched
    out = pd.DataFrame({"host": pdf["host"], "ts": pdf["ts"],
                        "allowed": allowed})
    return out, win, used


def streaming_host_quota(requests: DataFrame, budget: int,
                         interval_s: int = 60) -> DataFrame:
    """Gate a streaming (host, ts) request frame through the per-host
    window quota. ``requests`` must be a streaming DataFrame."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def gate(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        win, used = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        out, win, used = _gate_batch(batch, budget, interval_s, win, used)
        if win is not None:
            state.update((int(win), int(used)))
        out["host"] = key[0]
        yield out

    return (requests.groupBy("host")
            .applyInPandasWithState(gate, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
