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
broadcast size. Every ``compact_every`` rounds the flag-fold runs at
BUCKET granularity: only the bucket partitions the delta/tombstone
logs touch are rewritten; clean buckets carry over by manifest
reference (SnapshotTable.write_replacing_parts — the Iceberg
dynamic-partition-overwrite shape), so the per-compaction write is
O(dirty-bucket bytes), never O(corpus). Delta/removed then truncate
(pure manifest ops). A full single-dir rewrite still runs when most
buckets are dirty or after ``max_base_entries`` incremental rounds
(bounds read fan-in and dead bytes in partially-replaced dirs).

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

from pyspark.sql.types import LongType

# the tombstone log carries url_hash alongside url so bucket-level
# compaction can locate each tombstone's base partition WITHOUT
# assuming the caller's hash convention (url_hash is a caller-provided
# column; the crawl uses xxhash64)
REMOVED_SCHEMA = StructType([StructField("url", StringType(), False),
                             StructField("url_hash", LongType(), True)])


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
                 n_buckets: int = 64, max_base_entries: int = 8):
        self.base = SnapshotTable(spark, root, "frontier",
                                  _base_schema(schema))
        self.delta = SnapshotTable(spark, Path(root), "frontier_delta", schema)
        self.removed = SnapshotTable(spark, Path(root), "frontier_removed",
                                     REMOVED_SCHEMA)
        self.schema = schema
        self.compact_every = compact_every
        # incremental (bucket-level) compactions add one manifest entry
        # each; past this many the next compaction folds everything
        # back into ONE dir (bounds read fan-in and dead bytes from
        # partially-replaced dirs)
        self.max_base_entries = max_base_entries
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
        # the marker lands BEFORE the base commit: a crash in between
        # leaves marker + base v0, which __init__ opens fine; the other
        # order left a committed bucketed base that __init__ permanently
        # refused as "pre-bucketed layout"
        if not self._marker.exists():
            self._marker.write_text(str(self.n_buckets))
        # ≤ 2 files per bucket: one shuffle keyed on the partition col
        self.base.write(df.repartition(F.col("bucket")),
                        partition_by=["bucket", "pending"])

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
                self.removed.write, removed_urls.select("url", "url_hash"),
                "append")
            v = f_delta.result()
            f_removed.result()
        seg = self.delta.segment_df(v)
        if compact and self.needs_compaction():
            self.compact()
        return seg

    def needs_compaction(self) -> bool:
        return self.delta.n_segments() >= self.compact_every

    def _stat_bytes(self, want: set[str] | None) -> int:
        """Driver-side stat walk over the current base version's data
        dirs (no Spark job). ``want=None`` counts everything; a set of
        partition subdir names (``bucket=N``) restricts the walk —
        partial (bucket-restricted) manifest entries count only their
        referenced subtrees either way."""
        m = self.base._manifest()
        total = 0
        for e in m["versions"].get(str(m["current"]), []):
            if isinstance(e, dict):
                parts = (e["parts"] if want is None
                         else [p for p in e["parts"] if p in want])
                roots = [self.base.dir / e["dir"] / p for p in parts]
            elif want is None:
                roots = [self.base.dir / e]
            else:
                roots = [self.base.dir / e / p for p in want]
            for root in roots:
                if root.exists():
                    total += sum(f.stat().st_size
                                 for f in root.rglob("*.parquet"))
        return total

    def base_bytes(self) -> int:
        """On-disk size of the current base version; used to decide
        when bucket-pruned membership pays for its bookkeeping."""
        return self._stat_bytes(None)

    def bucket_bytes(self, buckets: list[int]) -> int:
        """On-disk bytes of ONLY the given bucket partitions in the
        current base version — what a bucket-pruned membership scan
        actually reads from the base."""
        return self._stat_bytes({f"bucket={int(b)}" for b in buckets})

    def _fold_removed(self, rows: DataFrame) -> DataFrame:
        """Flip pending -> false for rows whose url is tombstoned (they
        stay in the log — they are discovered)."""
        if not self.removed.n_segments():
            return rows
        rm = (self.removed.read().select("url").distinct()
              .withColumn("_rm", F.lit(True)))
        return (rows.join(F.broadcast(rm), "url", "left")
                .withColumn("pending",
                            F.col("pending") & F.col("_rm").isNull())
                .drop("_rm"))

    def _dirty_buckets(self) -> list[int]:
        """Buckets touched by the delta + tombstone logs — the only
        base partitions a compaction has to rewrite. One O(delta-log)
        job collecting ≤ n_buckets ints."""
        touched = None
        if self.delta.n_segments():
            touched = self._delta_df().select("url_hash")
        if self.removed.n_segments():
            rm = self.removed.read().select("url_hash")
            touched = rm if touched is None else touched.unionByName(rm)
        if touched is None:
            return []
        rows = (touched.select(
            F.pmod(F.col("url_hash"), F.lit(self.n_buckets)).cast("int")
            .alias("b")).distinct().collect())
        buckets = {r["b"] for r in rows}
        if None in buckets:
            # a log segment written before url_hash joined the schema
            # reads back null — the touched bucket is unknowable, so
            # mark every bucket dirty (compact() then takes the full
            # rewrite, which folds on url and needs no hash)
            return list(range(self.n_buckets))
        return sorted(int(b) for b in buckets)

    def compact(self) -> None:
        """Fold delta + tombstones into the base — at BUCKET granularity:
        only the bucket partitions the logs actually touch are rewritten
        (delta rows join as pending; tombstoned urls flip
        pending -> false); clean buckets carry over by manifest
        reference (SnapshotTable.write_replacing_parts — the Iceberg
        dynamic-partition-overwrite shape). Per-compaction write cost is
        O(dirty-bucket bytes), not O(corpus) — the last O(corpus) write
        on the crawl path at the 10^10 design point. Every
        ``max_base_entries`` incremental compactions the fold rewrites
        the whole base into one dir (bounds read fan-in / dead bytes).

        Reads the OLD versions while staging the new data dir (snapshot
        writes never mutate committed dirs), then truncates the logs —
        all three commits are independent manifest renames; a crash
        between them is undone by the caller's checkpoint rollback."""
        dirty = self._dirty_buckets()
        n_entries = len(self.base._manifest()["versions"]
                        .get(str(self.base.current_version()), []))
        incremental = (
            0 < len(dirty) <= self.n_buckets // 2
            and n_entries > 0  # bootstrap not committed yet -> full
            and n_entries < self.max_base_entries
        )
        if incremental:
            # dirty buckets only: base rows keep their pending flag
            rows = (self._base_df()
                    .filter(F.col("bucket").isin(dirty)).drop("bucket"))
            if self.delta.n_segments():
                rows = rows.unionByName(
                    self._delta_df().withColumn("pending", F.lit(True)))
            rows = self._fold_removed(rows)
            folded = self._bucketed_cols(rows)
            self.base.write_replacing_parts(
                folded.repartition(F.col("bucket")),
                parts=[f"bucket={b}" for b in dirty],
                partition_by=["bucket", "pending"])
        else:
            rows = self._base_df().drop("bucket")
            if self.delta.n_segments():
                rows = rows.unionByName(
                    self._delta_df().withColumn("pending", F.lit(True)))
            rows = self._fold_removed(rows)
            self._write_base(self._bucketed_cols(rows))
        self.delta.truncate()
        self.removed.truncate()

    def _bucketed_cols(self, rows: DataFrame) -> DataFrame:
        return rows.withColumn(
            "bucket", F.pmod(F.col("url_hash"),
                             F.lit(self.n_buckets)).cast("int"))

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


def frontier_report(store: FrontierStore, top_hosts: int = 10) -> dict:
    """Operational dashboard for a crawl state dir, as plain
    driver-side numbers — the answer to "where is this crawl?" without
    poking parquet by hand:

    ``pending`` / ``discovered`` / ``seen`` counts, the pending DEPTH
    histogram (is the crawl going broad or deep?), the top-``top_hosts``
    pending hosts with their best priority (who dominates the queue —
    the politeness scheduler's pressure points), priority min/mean/max,
    on-disk base bytes and log segment counts, and the snapshot
    versions (what a checkpoint rollback would target).

    Every aggregate is map-side-partial with O(depths + hosts-topk)
    output; the host top-k is a count-then-limit, not a window. This
    is a handful of small jobs over the pending view — a report, not a
    round-path operation."""
    pending = store.read()
    n_pending = pending.count()
    n_discovered = store.discovered().count()
    depth_hist = {r["depth"]: r["n"] for r in
                  pending.groupBy("depth")
                  .agg(F.count("*").alias("n")).collect()}
    hosts = [
        {"host": r["host"], "pending": r["n"],
         "best_priority": r["p"]}
        for r in (pending.groupBy("host")
                  .agg(F.count("*").alias("n"),
                       F.max("priority").alias("p"))
                  .orderBy(F.desc("n"), F.asc("host"))
                  .limit(top_hosts).collect())]
    pr = (pending.agg(F.min("priority").alias("lo"),
                      F.avg("priority").alias("mean"),
                      F.max("priority").alias("hi")).collect()[0]
          if n_pending else None)
    return {
        "pending": n_pending,
        "discovered": n_discovered,
        "seen": n_discovered - n_pending,
        "depth_histogram": dict(sorted(depth_hist.items())),
        "top_hosts": hosts,
        "priority": ({"min": pr["lo"], "mean": pr["mean"],
                      "max": pr["hi"]} if pr is not None else None),
        "base_bytes": store.base_bytes(),
        "delta_segments": store.delta.n_segments(),
        "tombstone_segments": store.removed.n_segments(),
        "versions": store.versions(),
    }
