"""LSM-style frontier store: O(delta) per-round commits at any frontier
size (SURVEY.md §2 ops 02/04/41; the 10^10-URL design point of
BASELINE.json:6,14).

The naive formulation rewrites the whole pending set every round — at
web10m that write was 100s of a 167s five-round crawl, and at a
10^10-row frontier it is simply impossible (O(frontier) parquet encode
per round). This store splits the frontier across three snapshot
tables (plans/snapshots.py — same versioned-manifest commit semantics):

  base     the last compacted pending set (internally deduped)
  delta    one append per round: the round's NEW pending urls. Each
           append was anti-joined against the full pending view by the
           caller before commit, so no url ever appears twice across
           base/delta segments — reads need NO dedup.
  removed  one append per round: the urls scheduled (tombstoned) that
           round. Bounded by rounds-since-compaction x Σ host budgets.

  read() = (base ∪ delta) ⟕̸anti removed

The tombstone table stays small between compactions, so Catalyst picks
a broadcast anti-join from its file-size stats — the read adds ZERO
exchange at sandbox scale and one bounded small-side shuffle beyond
broadcast size. Every ``compact_every`` rounds the merged view is
rewritten as the new base and delta/removed truncate (pure manifest
ops) — amortized O(frontier / compact_every) write per round instead
of O(frontier).

Crash safety: the crawl checkpoint records all three table versions
after commit_round; resume rolls all three back together, so a crash
anywhere (including mid-compaction) replays the round idempotently —
kill/crash-tested in tests/test_resume.py, equality-vs-naive tested in
tests/test_frontier.py.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from data_crawler_spark.plans.snapshots import SnapshotTable

REMOVED_SCHEMA = StructType([StructField("url", StringType(), False)])


class FrontierStore:
    def __init__(self, spark: SparkSession, root: str | os.PathLike,
                 schema: StructType, compact_every: int = 4):
        self.base = SnapshotTable(spark, root, "frontier", schema)
        self.delta = SnapshotTable(spark, Path(root), "frontier_delta", schema)
        self.removed = SnapshotTable(spark, Path(root), "frontier_removed",
                                     REMOVED_SCHEMA)
        self.schema = schema
        self.compact_every = compact_every

    # -- reads ---------------------------------------------------------

    def read(self) -> DataFrame:
        """The current pending set (what the naive table would hold)."""
        pending = self.read_with_tombstoned()
        if self.removed.n_segments():
            pending = pending.join(self.removed.read(), "url", "left_anti")
        return pending

    def read_with_tombstoned(self) -> DataFrame:
        """base ∪ delta WITHOUT the tombstone anti-join — i.e. every url
        ever added to the frontier since the last compaction folded the
        logs. For consumers that union this with `seen` (the crawl's
        discovered-membership check), the tombstone filter is pure
        wasted work: tombstoned urls are scheduled urls, all of which
        are in `seen` anyway."""
        pending = self.base.read()
        if self.delta.n_segments():
            pending = pending.unionByName(self.delta.read())
        return pending

    # -- writes --------------------------------------------------------

    def bootstrap(self, df: DataFrame) -> None:
        """Round-0 pending set (seed list)."""
        self.base.write(df)

    def commit_round(self, new_rows: DataFrame,
                     removed_urls: DataFrame,
                     compact: bool = True) -> DataFrame:
        """O(delta) round commit: append the round's new pending rows
        (caller guarantees they are url-disjoint from the current view)
        and the round's scheduled urls as tombstones; compact when the
        delta log reaches ``compact_every`` segments (callers that need
        a pre-compaction hook — e.g. folding the delta log into the
        bloom sidecar — pass ``compact=False`` and drive
        ``needs_compaction()``/``compact()`` themselves). Returns a
        DataFrame over exactly the rows just appended (read back from
        the new segment) without re-deriving the link pipeline."""
        from concurrent.futures import ThreadPoolExecutor

        # delta and tombstone appends touch different tables — submit
        # both jobs concurrently (the caller's round checkpoint is the
        # atomic commit point; a crash between them replays the round)
        with ThreadPoolExecutor(2) as ex:
            f_delta = ex.submit(self.delta.write, new_rows, "append")
            f_removed = ex.submit(
                self.removed.write, removed_urls.select("url"), "append")
            v = f_delta.result()
            f_removed.result()
        seg = self.delta.segment_df(v)
        if compact and self.needs_compaction():
            self.compact()
        return seg

    def needs_compaction(self) -> bool:
        return self.delta.n_segments() >= self.compact_every

    def compact(self) -> None:
        """Fold delta+tombstones into a fresh base version. Reads the
        OLD versions while staging the new data dir (snapshot writes
        never mutate committed dirs), then truncates the logs — all
        three commits are independent manifest renames; a crash between
        them is undone by the caller's checkpoint rollback."""
        self.base.write(self.read())
        self.delta.truncate()
        self.removed.truncate()

    # -- versioning (crawl checkpoint integration) ----------------------

    def versions(self) -> dict:
        return {"base": self.base.current_version(),
                "delta": self.delta.current_version(),
                "removed": self.removed.current_version()}

    def rollback(self, v: dict | int) -> None:
        if isinstance(v, int):  # pre-store checkpoints: base-only table
            v = {"base": v, "delta": 0, "removed": 0}
        self.base.rollback(v["base"])
        self.delta.rollback(v["delta"])
        self.removed.rollback(v["removed"])

    def prune(self, keep_last: int = 2) -> None:
        for t in (self.base, self.delta, self.removed):
            t.prune(keep_last=keep_last)
