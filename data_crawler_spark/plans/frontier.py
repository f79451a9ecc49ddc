"""LSM-style frontier store over a BUCKETED discovered log: O(delta)
per-round commits at any frontier size, and O(touched-buckets)
membership scans (SURVEY.md §2 ops 02/04/10/41; the 10^10-URL design
point of BASELINE.json:6,14 — "partitioned ... URL-seen filter keyed
on canonicalized-URL xxhash64").

The naive formulation rewrites the whole pending set every round — at
web10m that write was 100s of a 167s five-round crawl, and at a
10^10-row frontier it is simply impossible. This store keeps three
snapshot tables (plans/snapshots.py — same versioned-manifest commit
semantics):

  base     the compacted DISCOVERED log: every url ever added to the
           frontier, with a ``pending`` flag (false = already
           scheduled). Laid out partitioned by
           ``bucket = pmod(url_hash, n_buckets)`` and by ``pending``,
           so (a) the pending view statically prunes to pending=true
           directories and (b) membership probes prune to the buckets
           their candidates actually hash into — the scan is
           O(touched buckets), never O(corpus).
  delta    one append per round: the round's NEW pending urls. Each
           append was anti-joined against the full discovered view by
           the caller before commit, so no url ever appears twice
           across base/delta segments — reads need NO dedup.
  removed  one append per round: the urls scheduled (tombstoned) that
           round. Bounded by rounds-since-compaction x Σ host budgets.

  pending view   = (base[pending=true] ∪ delta) ⟕̸anti removed
  discovered set = base ∪ delta       (url-seen membership — the
                   crawled rows keep their base row with
                   pending=false, so no separate seen table is needed)

The tombstone table stays small between compactions, so Catalyst picks
a broadcast anti-join from its file-size stats — the read adds ZERO
exchange at sandbox scale and one bounded small-side shuffle beyond
broadcast size. Every ``compact_every`` rounds the flag-fold rewrites
the base (amortized O(discovered / compact_every) per round) and
delta/removed truncate (pure manifest ops). On a real cluster the
refinement is bucket-level compaction — rewrite only the bucket
partitions whose delta/tombstone fraction crosses a threshold — which
the partitioned layout here is exactly shaped for.

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
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, IntegerType, StringType,
                               StructField, StructType)

from data_crawler_spark.plans.snapshots import SnapshotTable

REMOVED_SCHEMA = StructType([StructField("url", StringType(), False)])


def _base_schema(schema: StructType) -> StructType:
    """Discovered-log schema: caller's frontier schema + the pending
    flag and bucket partition column (fresh StructType — never mutate
    the shared one)."""
    return StructType(list(schema.fields) + [
        StructField("pending", BooleanType(), True),
        StructField("bucket", IntegerType(), True),
    ])


class FrontierStore:
    def __init__(self, spark: SparkSession, root: str | os.PathLike,
                 schema: StructType, compact_every: int = 4,
                 n_buckets: int = 64):
        self.base = SnapshotTable(spark, root, "frontier",
                                  _base_schema(schema))
        self.delta = SnapshotTable(spark, Path(root), "frontier_delta", schema)
        self.removed = SnapshotTable(spark, Path(root), "frontier_removed",
                                     REMOVED_SCHEMA)
        self.schema = schema
        self.compact_every = compact_every
        # the bucket count is part of the on-disk layout: persist it at
        # bootstrap and reuse on re-open — a drifted runtime value would
        # make pruning filters silently miss buckets
        # version-keyed DataFrame memos: several consumers per round
        # read base/delta (gate view, membership, bloom fold); reusing
        # ONE DataFrame object per table version reuses its FileIndex,
        # so the partition-dir listing and scan relation are built once
        # per version instead of once per consumer — driver-side
        # latency is the crawl's non-scaling component.
        self._base_memo: tuple[int, DataFrame] | None = None
        self._delta_memo: tuple[int, DataFrame] | None = None
        self._marker = Path(root) / "frontier" / "_BUCKETS"
        if self._marker.exists():
            self.n_buckets = int(self._marker.read_text())
        else:
            if self.base.current_version() > 0:
                raise RuntimeError(
                    "frontier state dir uses a pre-bucketed layout; "
                    "start a fresh state dir")
            self.n_buckets = n_buckets

    # -- layout helpers ------------------------------------------------

    def _bucketed(self, df: DataFrame, pending) -> DataFrame:
        return (df.withColumn("pending", pending)
                .withColumn("bucket",
                            F.pmod(F.col("url_hash"),
                                   F.lit(self.n_buckets)).cast("int")))

    def _write_base(self, df: DataFrame) -> None:
        # ≤ 2 files per bucket: one shuffle keyed on the partition col
        self.base.write(df.repartition(F.col("bucket")),
                        partition_by=["bucket", "pending"])
        if not self._marker.exists():
            self._marker.write_text(str(self.n_buckets))

    # -- reads ---------------------------------------------------------

    def _base_df(self) -> DataFrame:
        v = self.base.current_version()
        if self._base_memo is None or self._base_memo[0] != v:
            self._base_memo = (v, self.base.read())
        return self._base_memo[1]

    def _delta_df(self) -> DataFrame:
        v = self.delta.current_version()
        if self._delta_memo is None or self._delta_memo[0] != v:
            self._delta_memo = (v, self.delta.read())
        return self._delta_memo[1]

    def read(self) -> DataFrame:
        """The current pending set (what the naive table would hold).
        The base side statically prunes to pending=true directories."""
        pending = self._base_df().filter(F.col("pending")) \
                      .drop("pending", "bucket")
        if self.delta.n_segments():
            pending = pending.unionByName(self._delta_df())
        if self.removed.n_segments():
            pending = pending.join(
                F.broadcast(self.removed.read()), "url", "left_anti")
        return pending

    def discovered(self, buckets: list[int] | None = None) -> DataFrame:
        """(url, url_hash) of every url ever added to the frontier —
        the URL-seen membership set (scheduled rows keep their base row
        with pending=false, so this COVERS the seen set; no tombstone
        anti-join, tombstoned urls are discovered by definition).

        ``buckets`` prunes the base scan to the given bucket partitions
        (statically, at file-listing time) — pass the distinct buckets
        of the candidate set being checked; the delta log (bounded by
        compact_every rounds) is always scanned in full."""
        b = self._base_df()
        if buckets is not None:
            b = b.filter(F.col("bucket").isin([int(x) for x in buckets]))
        out = b.select("url", "url_hash")
        if self.delta.n_segments():
            out = out.unionByName(self._delta_df().select("url", "url_hash"))
        return out

    def read_with_tombstoned(self) -> DataFrame:
        """Backward-compat alias for the discovered view (full columns
        minus layout cols), tombstone filter skipped by design."""
        pending = self._base_df().drop("pending", "bucket")
        if self.delta.n_segments():
            pending = pending.unionByName(self._delta_df())
        return pending

    # -- writes --------------------------------------------------------

    def bootstrap(self, df: DataFrame) -> None:
        """Round-0 discovered log (seed list, all pending)."""
        self._write_base(self._bucketed(df, F.lit(True)))

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

    def base_bytes(self) -> int:
        """On-disk size of the current base version (driver-side stat
        walk — no Spark job); used to decide when bucket-pruned
        membership pays for its bookkeeping."""
        m = self.base._manifest()
        total = 0
        for d in m["versions"].get(str(m["current"]), []):
            root = self.base.dir / d
            if root.exists():
                total += sum(f.stat().st_size
                             for f in root.rglob("*.parquet"))
        return total

    def compact(self) -> None:
        """Fold delta + tombstones into a fresh bucketed base version:
        delta rows join the log as pending, and rows whose url is in
        the removed log flip pending -> false (they stay in the log —
        they are discovered). Reads the OLD versions while staging the
        new data dir (snapshot writes never mutate committed dirs),
        then truncates the logs — all three commits are independent
        manifest renames; a crash between them is undone by the
        caller's checkpoint rollback."""
        rows = self._base_df().drop("bucket")
        if self.delta.n_segments():
            rows = rows.unionByName(
                self._delta_df().withColumn("pending", F.lit(True)))
        if self.removed.n_segments():
            rm = self.removed.read().distinct().withColumn("_rm", F.lit(True))
            rows = (rows.join(F.broadcast(rm), "url", "left")
                    .withColumn("pending",
                                F.col("pending") & F.col("_rm").isNull())
                    .drop("_rm"))
        self._write_base(rows.withColumn(
            "bucket", F.pmod(F.col("url_hash"),
                             F.lit(self.n_buckets)).cast("int")))
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
