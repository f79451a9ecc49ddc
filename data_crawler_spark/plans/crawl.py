"""The crawl loop: each round = one batch job committing one snapshot
set (SURVEY.md §2 op 41, §3.1). Distributed mirror of the executable
spec in oracle/crawler.py — tests assert exact visit-order / seen-set /
extracted-bytes equality (BASELINE.json:2,14,15).

Scale notes (designed for a 10^10-URL frontier on 1000 executors,
tested on local[32]):
- the frontier/seen tables are hash-distributed on url; the only
  global (single-task) step is the per-round visit-sequence window,
  which runs over the SCHEDULED set — bounded by Σ host budgets, i.e.
  O(#hosts), orders of magnitude smaller than the frontier.
- robots rules + host budgets are broadcast; the frontier is never
  shuffled for gating.
- per-host ranking is salted two-phase (operators/scheduler.py) so the
  Zipf-head domains never serialize into one task.
- `html` is projected away everywhere except the extraction stage
  (column pruning keeps it out of every shuffle — SURVEY.md §4.1).
- the link pipeline (href resolve, canonicalize, xxhash64, bloom
  probe) is pure JVM whole-stage codegen (operators/links.py,
  operators/bloom.py probe_native) — Python workers only touch the
  one Arrow extraction pass per round.
- URL-seen/discovered membership is O(round) work against an
  O(touched-buckets) scan: the discovered bloom (∪ the un-folded delta
  hashes) splits candidates, and the exact check scans the frontier's
  bucketed discovered log — pruned to the maybe-set's bucket
  partitions once the base is large — against a broadcast of the
  round's maybe-set. The frontier is never shuffled and never
  driver-hashed (membership_join="shuffle" is the beyond-broadcast
  fallback; a real cluster co-locates it with bucketed Iceberg
  storage-partitioned joins).
- there is no separate seen table: the discovered log keeps scheduled
  rows (pending=false), and the seen VIEW projects the scheduled
  table — one state commit per round fewer on both counts.
- every state write is a new snapshot version + atomic manifest
  commit; the round checkpoint commits LAST, so a crash anywhere
  replays the round idempotently.
- the frontier is an LSM store (plans/frontier.py): per-round commits
  append only the NEW pending urls + a small tombstone set, compacting
  every few rounds — O(delta) write per round, never O(frontier).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_crawler_spark import schemas
from data_crawler_spark.operators.extractor import extract_enrich_arrow
from data_crawler_spark.operators.links import (
    canonicalize_col,
    host_col,
    is_http_col,
    path_col,
    resolve_href_col,
)
from data_crawler_spark.operators import bloom as bloom_ops
from data_crawler_spark.operators.robots import robots_gate
from data_crawler_spark.operators.scheduler import (
    schedule_per_host_salted,
    with_crawl_seq,
)
from data_crawler_spark.plans.frontier import FrontierStore
from data_crawler_spark.plans.pagestore import fetch_bucket_pruned, open_bucketed_pages
from data_crawler_spark.plans.snapshots import Checkpoint, SnapshotTable


# columns the fetch stage must deliver to the extraction pass
FETCH_COLS = ["url", "depth", "warc_ts", "lang", "html"]


class Transport:
    """The fetch seam: one round's scheduled slice in, pages out.

    ``fetch(sched)`` receives the round's scheduled URLs as a skinny
    ``(url, depth)`` DataFrame — already robots-gated, per-host
    budget-capped, and priority-ordered by the scheduler, so ONE call
    per politeness round IS the politeness contract: a transport never
    sees more URLs for a host in a round than that host's budget
    (tested in tests/test_transport.py) — and must return a
    ``FETCH_COLS``-shaped DataFrame (url, depth, warc_ts, lang, html)
    with at most one row per input url (unfetchable urls are simply
    absent, exactly like a page store miss).

    The default ``PageStoreTransport`` joins against the offline page
    store (the sandbox's fetch universe — no network here by design).
    Deploying the crawl against a live frontier means implementing
    this one method with an HTTP client (e.g. an async-HTTP pool
    inside mapInPandas batches) — no round/commit/dedup logic changes;
    tests run the whole equivalence suite under a fake HTTP transport
    to prove the seam carries everything the loop needs."""

    def fetch(self, sched: DataFrame) -> DataFrame:
        raise NotImplementedError


class PageStoreTransport(Transport):
    """Offline fetch from the page store: broadcast the scheduled
    slice into the store scan (html must NEVER shuffle), or
    bucket-pruned when a bucketed store exists (plans/pagestore.py —
    the 10^10-page path: file-listing-level pruning to the buckets the
    round actually touches)."""

    def __init__(self, pages: DataFrame,
                 pages_bucketed: DataFrame | None = None,
                 pages_n_buckets: int = 0):
        self.pages = pages
        self.pages_bucketed = pages_bucketed
        self.pages_n_buckets = pages_n_buckets

    def fetch(self, sched: DataFrame) -> DataFrame:
        if self.pages_bucketed is not None:
            return fetch_bucket_pruned(
                sched, self.pages_bucketed, self.pages_n_buckets,
                FETCH_COLS)
        return (F.broadcast(sched)
                .join(self.pages, "url", "inner")
                .select(*FETCH_COLS))


class SeenView:
    """The URL-seen set DERIVED from the scheduled table: a url is
    scheduled at most once ever (frontier dedup + tombstones), so
    seen == scheduled projected to (url_hash, url, round→first_round).
    Round 2 persisted seen as its own table — one extra commit per
    round writing bytes the scheduled commit already carried. The view
    kills that job; parquet column pruning makes reads equally cheap,
    and crash-rollback rides the scheduled table's versions."""

    def __init__(self, scheduled: SnapshotTable):
        self._t = scheduled
        self.schema = schemas.SEEN

    def read(self, version: int | None = None) -> DataFrame:
        return self._t.read(version).select(
            "url_hash", "url", F.col("round").alias("first_round"))

    def current_version(self) -> int:
        return self._t.current_version()

    def _manifest(self) -> dict:
        return self._t._manifest()


@dataclass
class CrawlContext:
    spark: SparkSession
    web_dir: Path
    state_dir: Path
    pages: DataFrame
    hosts: DataFrame
    rules: DataFrame
    frontier: FrontierStore
    seen: SeenView
    scheduled: SnapshotTable
    extracted: SnapshotTable
    lineage: SnapshotTable
    bloom: SnapshotTable
    checkpoint: Checkpoint
    n_salts: int = 16
    # bloom URL-DISCOVERED sidecar (op 31): covers every url ever added
    # to the frontier (pending ∪ seen), so definitely-undiscovered
    # candidates skip BOTH membership joins; fixed per-bucket layout so
    # bitmaps OR-merge across rounds. An accelerator only — exactness
    # comes from the exact membership check; use_bloom=False must
    # produce identical results (tested).
    use_bloom: bool = True
    bloom_buckets: int = 64
    bloom_m_bits: int = 1 << 20
    bloom_k: int = 7
    # exact membership check for maybe-discovered candidates:
    # "auto" (default) picks per round from the measured maybe-set
    # count — "broadcast" (scan the discovered log's url column against
    # a broadcast of the maybe set: no shuffle, no O(frontier) driver
    # hash) while the maybe set is driver-hashable, else "shuffle"
    # (both sides shuffled on url: scales with cores; on a real cluster
    # bucketed Iceberg storage-partitioned joins co-locate it). Either
    # name forces that strategy (results identical — tested).
    membership_join: str = "auto"
    membership_broadcast_max_rows: int = 300_000
    # bucket-pruned membership engages once the discovered base exceeds
    # this size (below it the pruning bookkeeping costs more than the
    # full url-column scan it saves)
    membership_prune_min_bytes: int = 64 << 20
    # snapshot GC: keep the last N versions of each state table (None =
    # keep everything / full time travel). >=3 keeps the checkpointed
    # version safe for mid-round crash rollback.
    gc_keep: int | None = None
    # round-level gauge metrics (frontier/seen sizes) cost ~3 extra tiny
    # jobs per round - valuable diagnostics, skippable in tight loops
    lineage_gauges: bool = True
    # bucketed page store (plans/pagestore.py): when <web>/pages_bucketed
    # exists, the fetch join prunes bucket partitions instead of
    # scanning the whole store - the 10^10-page fetch path
    pages_bucketed: DataFrame | None = None
    pages_n_buckets: int = 0
    # the fetch seam (class Transport above): defaults to the page
    # store; swap in an HTTP transport to deploy against a live web
    transport: Transport | None = None
    # typed race-event mining (the reference's payload): when enabled,
    # each round also commits an `events` snapshot of
    # race_event_records over the round's fetched pages. Opt-in: the
    # event pass re-reads the fetched slice (html never survives the
    # text-extraction Arrow pass), which for the page-store transport
    # is one extra pruned store read per round.
    events: SnapshotTable | None = None
    extract_events: bool = False
    # two-phase visit-sequencing kicks in above this many scheduled rows
    # per round (below it, a single-window seq is one cheap exchange)
    seq_rows_per_task: int = 500_000
    # round-size estimate for picking seq partitioning WITHOUT a
    # dedicated count job: Σ host budgets (collected once at open) and
    # the previous round's actual size. Partitioning-only — correctness
    # never depends on the estimate.
    sched_budget_bound: int = 0
    last_n_sched: int = 0
    # benchmark-only multiplier on every host's budget_per_round: makes
    # rounds big enough to measure throughput scaling without waiting
    # for the frontier to ramp. 1 = spec politeness (all correctness
    # tests run at 1; the oracle knows nothing of this knob).
    budget_scale: int = 1
    # round pipelining: round k's commit barrier overlaps round k+1's
    # gate+schedule+seq pass. The prefetch waits for round k's frontier
    # COMMIT, then plans from the committed read() — byte-identical to
    # what round k+1 would build inline (no derived in-memory frames,
    # no lineage growth across rounds), just built on a pool thread
    # while the extracted/lineage commits and checkpoint drain. Purely
    # a latency overlap: results are invariant (equivalence-suite
    # exact), and a crash discards the in-memory prefetch (resume
    # replans from the checkpoint). Default False so callers driving
    # run_round directly (streaming wrapper, ad-hoc loops) never leave
    # a staged prefetch behind at loop exit; run_crawl — the
    # CLI/bench/spark-submit surface — turns it on and releases any
    # staged plan when its loop ends.
    pipeline_rounds: bool = False
    # (round, base, sched, seq_parts, sched_hist) staged by the
    # previous round's prefetch; consumed (and cleared) by run_round
    _planned_next: tuple | None = None


def open_crawl(spark: SparkSession, web_dir: str | Path,
               state_dir: str | Path, n_salts: int = 16,
               use_bloom: bool = True,
               gc_keep: int | None = None,
               lineage_gauges: bool = True,
               budget_scale: int = 1,
               membership_join: str = "auto",
               transport: Transport | None = None,
               extract_events: bool = False) -> CrawlContext:
    web = Path(web_dir)
    state = Path(state_dir)
    state.mkdir(parents=True, exist_ok=True)
    # The ground-truth `text` column must never leak into the engine:
    # extraction works from `html` alone (byte-identity is then a real
    # check, not a tautology).
    pages = spark.read.schema(schemas.PAGES).parquet(str(web / "pages.parquet")).drop("text")
    pages_bucketed, pages_n_buckets = None, 0
    bucket_dir = web / "pages_bucketed"
    if (bucket_dir / "_BUCKETS").exists():
        pages_bucketed, pages_n_buckets = open_bucketed_pages(spark, bucket_dir)
        pages_bucketed = pages_bucketed.drop("text")
    hosts = spark.read.parquet(str(web / "hosts.parquet"))
    if budget_scale != 1:
        hosts = hosts.withColumn(
            "budget_per_round", F.col("budget_per_round") * budget_scale)
    rules = spark.read.parquet(str(web / "robots_rules.parquet"))
    # discovered-bloom sizing: the layout is fixed for the whole crawl
    # (bitmaps OR-merge across rounds), so size it from the page store's
    # byte size (~160B/page zstd; discovered URLs = O(pages); target
    # >=10 bits/item over 64 buckets, clamped to [2^14, 2^20] bits per
    # bucket). An oversized sidecar is pure per-round build/merge/
    # broadcast overhead on small webs; undersized only raises FPR
    # (never wrong answers).
    store_bytes = sum(
        f.stat().st_size
        for f in [web / "pages.parquet"]
        if f.exists()) or (1 << 20)
    want_bits_per_bucket = (store_bytes // 160) * 10 // 64
    bloom_m_bits = 1 << min(20, max(14, int(want_bits_per_bucket).bit_length()))
    bloom_k = 7
    # resume safety: the persisted sidecar's layout is authoritative —
    # re-deriving m_bits from file size could drift across resumes
    # (store re-encoded, clamp boundary shift) and a mismatched layout
    # means silent bloom mis-reads (update_bloom now also hard-asserts).
    bloom_table = SnapshotTable(spark, state, "bloom", schemas.BLOOM)
    if bloom_table.current_version() > 0:
        row = bloom_table.read().select("m_bits", "k").limit(1).collect()
        if row:
            bloom_m_bits, bloom_k = int(row[0]["m_bits"]), int(row[0]["k"])
    # Σ listed host budgets: upper bound on a round's scheduled size
    # from hosts WITH a budget row (unlisted hosts fall back to
    # DEFAULT_BUDGET and ride the last-round term of the estimate).
    # Driver-side pyarrow sum: the hosts dimension is metadata-sized
    # and this runs at every crawl open — a Spark agg job here is pure
    # fixed latency (scaled by budget_scale to match the hosts frame
    # Spark sees above).
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq
    bound_row = (_pc.sum(_pq.read_table(
        web / "hosts.parquet",
        columns=["budget_per_round"]).column(0)).as_py() or 0) \
        * budget_scale
    scheduled_table = SnapshotTable(spark, state, "scheduled", schemas.SCHEDULED)
    return CrawlContext(
        spark=spark, web_dir=web, state_dir=state,
        pages=pages, hosts=hosts, rules=rules,
        frontier=FrontierStore(spark, state, schemas.FRONTIER),
        seen=SeenView(scheduled_table),
        scheduled=scheduled_table,
        sched_budget_bound=int(bound_row or 0),
        extracted=SnapshotTable(spark, state, "extracted", schemas.EXTRACTED),
        lineage=SnapshotTable(spark, state, "lineage", schemas.LINEAGE),
        bloom=bloom_table,
        checkpoint=Checkpoint(state),
        n_salts=n_salts,
        pages_bucketed=pages_bucketed,
        pages_n_buckets=pages_n_buckets,
        transport=(transport if transport is not None else
                   PageStoreTransport(pages, pages_bucketed,
                                      pages_n_buckets)),
        events=SnapshotTable(spark, state, "events", schemas.EVENTS),
        extract_events=extract_events,
        use_bloom=use_bloom,
        bloom_m_bits=bloom_m_bits,
        bloom_k=bloom_k,
        gc_keep=gc_keep,
        lineage_gauges=lineage_gauges,
        budget_scale=budget_scale,
        membership_join=membership_join,
    )


# DCS_PROFILE=1: accumulate wall time per run_round action (diagnostic
# only — which per-round job dominates; see bench/scaling notes).
# CURRENT_STAGES tracks the stages active right now (diagnostics can
# attribute driver-idle time to a phase).
STAGE_TIMES: dict[str, float] = {}
CURRENT_STAGES: set = set()
# DCS_PROFILE=1: per-round membership scan-bytes records (pruned vs
# full base) — consumed by bench/membership.py
MEMBERSHIP_METRICS: list[dict] = []


def _persist(df: DataFrame, level: str | None = None) -> DataFrame:
    """Round-scoped cache, DISK_ONLY by default (override with
    DCS_CACHE_LEVEL). On a single fat JVM, on-heap columnar cache
    batches of the html-bearing frames fill the old generation and
    full-GC wall was ~11s of a 22s stage at local[32] (event-log task
    metrics, web10m round 3); DISK_ONLY keeps the heap flat and cut the
    5-round web10m crawl from ~161s to ~134s at local[32]. On a real
    cluster executors are 4-8-core JVMs where MEMORY_AND_DISK is fine —
    this knob is about the single-JVM local mode. Callers cache SKINNY
    frames (no html: cand/maybe/sched) with level="MEMORY_AND_DISK" —
    their bytes are tiny, and a disk round-trip through the ONE shared
    virtio disk is pure flat latency that no core count can hide."""
    from pyspark import StorageLevel

    name = level or os.environ.get("DCS_CACHE_LEVEL", "DISK_ONLY")
    return df.persist(getattr(StorageLevel, name))


def _checkpoint(df: DataFrame, level: str | None = None) -> DataFrame:
    """Round-scoped materialization that also TRUNCATES the logical
    plan (localCheckpoint), unlike _persist. Round 6, event-log
    measured: every ACTION that references the round's link pipeline
    re-runs Catalyst analysis over the huge native canonicalize/URL
    expression trees — ~0.6-0.9s of driver-only time per action at
    measurement scale (the no-job gaps in the round timeline; execution
    itself is milliseconds there). Checkpointed frames plan as a
    Scan ExistingRDD, so the tree is analyzed once per round instead of
    once per consumer. Lineage is gone, so a lost block fails loudly
    instead of recomputing (local mode: only process death loses
    blocks — same blast radius as the checkpoint already pinning the
    two-phase seq). ``level`` follows _persist's storage-level rule:
    text-bearing frames (enriched) take the DISK_ONLY default to keep
    the single fat JVM's old gen flat (see _persist's measured GC
    history); skinny frames pass "MEMORY_AND_DISK"."""
    from pyspark import StorageLevel

    name = level or os.environ.get("DCS_CACHE_LEVEL", "DISK_ONLY")
    return df.localCheckpoint(eager=True,
                              storageLevel=getattr(StorageLevel, name))


def _release(df: DataFrame) -> None:
    """Free a round-scoped frame produced by _persist OR _checkpoint:
    cache unpersist for the former, underlying-RDD unpersist for the
    latter (checkpointed frames are not CacheManager entries). Best
    effort — a miss merely waits for the ContextCleaner."""
    try:
        df.unpersist()
    except Exception:
        pass
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


class _stage:
    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        CURRENT_STAGES.add(self.name)

    def __exit__(self, *exc):
        CURRENT_STAGES.discard(self.name)
        if os.environ.get("DCS_PROFILE") == "1":
            STAGE_TIMES[self.name] = (STAGE_TIMES.get(self.name, 0.0)
                                      + time.time() - self.t0)
        return False


def _frontier_cols(df: DataFrame) -> DataFrame:
    return df.select(
        "url",
        F.xxhash64("url").alias("url_hash"),
        host_col(F.col("url")).alias("host"),
        F.col("depth").cast("int").alias("depth"),
        (F.lit(1.0) / (F.lit(1.0) + F.col("depth"))).alias("priority"),
        F.col("discovered_round").cast("int").alias("discovered_round"),
        "parent_url",
    )


def bootstrap(ctx: CrawlContext) -> None:
    """Round-0 frontier from the seed list (SURVEY.md §2 op 03).

    Safe on a previously-used state dir (run_crawl(resume=False), or a
    lost checkpoint): every table is version-reset to 0 first —
    otherwise the old crawl's un-compacted frontier delta/tombstone
    segments would union into round 0's pending view, and the round-0
    scheduled/extracted appends would land ON TOP of the old tables,
    silently mixing two crawls."""
    for t in (ctx.scheduled, ctx.extracted, ctx.lineage, ctx.bloom,
              ctx.events):
        if t.current_version() > 0:
            t.rollback(0)
    fv = ctx.frontier.versions()
    if fv["delta"] > 0 or fv["removed"] > 0:
        ctx.frontier.rollback({"base": fv["base"], "delta": 0,
                               "removed": 0})
    seeds = (
        ctx.spark.read.text(str(ctx.web_dir / "seeds.txt"))
        .select(canonicalize_col(F.trim("value")).alias("url"))
        .filter(F.col("url").isNotNull() & (F.col("url") != ""))
        .filter(is_http_col(F.col("url")))
        .distinct()
        .withColumn("depth", F.lit(0))
        .withColumn("discovered_round", F.lit(0))
        .withColumn("parent_url", F.lit(None).cast("string"))
    )
    rows = _frontier_cols(seeds)
    if ctx.use_bloom:
        # the discovered bloom must cover the seeds from round 0 — a
        # later link back to a seed url has to probe as maybe-discovered.
        # Build it from the seed frame (the same rows the frontier base
        # commits, by construction) CONCURRENTLY with the base write:
        # the two jobs touch disjoint tables and the checkpoint below
        # is the atomic commit point, so a crash between them replays
        # bootstrap whole — ~1s of fixed job latency off every fresh
        # crawl start.
        with ThreadPoolExecutor(2) as ex:
            f_base = ex.submit(ctx.frontier.bootstrap, rows)
            f_bloom = ex.submit(
                lambda: ctx.bloom.write(bloom_ops.build_bloom(
                    rows.select("url_hash"),
                    n_buckets=ctx.bloom_buckets, m_bits=ctx.bloom_m_bits,
                    k=ctx.bloom_k)))
            f_base.result()
            f_bloom.result()
    else:
        ctx.frontier.bootstrap(rows)
    ctx.checkpoint.commit({
        "round": 0,
        "frontier_v": ctx.frontier.versions(),
        "scheduled_v": 0, "extracted_v": 0, "lineage_v": 0,
        "bloom_v": ctx.bloom.current_version(),
        "events_v": 0,
    })


def _dedup_frontier(df: DataFrame) -> DataFrame:
    """Same-url collisions keep min (discovered_round, depth, parent_url)
    — the order-independent rule shared with the oracle."""
    w = Window.partitionBy("url").orderBy(
        F.asc("discovered_round"), F.asc("depth"), F.asc_nulls_first("parent_url")
    )
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") == 1).drop("_rk"))


def _plan_round(ctx: CrawlContext, frontier: DataFrame):
    """Build one round's gate+schedule+seq frames from a pending view:
    returns (base, sched, seq_parts, seq_rel) with the caches
    REGISTERED but not yet filled (the caller's histogram pass fills
    them). ``seq_rel`` holds the two-phase sequencer's boundary-pinning
    cached frames — the caller must unpersist them right after the
    histogram pass fills sched's cache (their only consumer), or they
    linger until GC."""
    # gate + schedule (ops 09/14/22/15/26)
    cand = frontier.withColumn("path", path_col(F.col("url")))
    allowed = robots_gate(cand, ctx.rules).drop("path")
    base = schedule_per_host_salted(allowed, ctx.hosts, ctx.n_salts)

    # visit-sequence: single-window when small, two-phase range-
    # partitioned when the round is large (no single task ever holds
    # the whole round — operators/scheduler.py). The partition choice
    # is estimate-driven (correctness is partition-count-invariant,
    # property-tested); two-phase mode reads `base` twice, so only then
    # is it persisted.
    # sched_budget_bound is summed from the ALREADY budget_scale-scaled
    # hosts frame in open_crawl — scaling again here overshot est by
    # budget_scale× and saturated seq_parts on bench runs (wasted
    # two-phase machinery on small rounds; correctness unaffected)
    est = max(ctx.sched_budget_bound, ctx.last_n_sched)
    seq_parts = max(1, min(200, est // ctx.seq_rows_per_task))
    if seq_parts > 1:
        base = _persist(base)
    seq_rel: list = []
    # _checkpoint (not _persist): the gate+schedule+seq tree is
    # re-analyzed by every consumer action otherwise (scheduled write,
    # fetch join, tombstones) — see _checkpoint's rationale
    sched = _checkpoint(with_crawl_seq(base, num_partitions=seq_parts,
                                       release_into=seq_rel),
                        "MEMORY_AND_DISK")
    return base, sched, seq_parts, seq_rel


def _drop_planned(ctx: CrawlContext) -> None:
    """Release a staged (unconsumed) prefetch's caches — called when the
    crawl loop exits with a prefetch in flight, or a stale prefetch's
    round number doesn't match (e.g. a caller drove run_round out of
    order)."""
    if ctx._planned_next is None:
        return
    _, base, sched, seq_parts, _ = ctx._planned_next
    ctx._planned_next = None
    _release(sched)
    if seq_parts > 1:
        base.unpersist()


def _sched_hist(sched: DataFrame) -> list:
    """ONE wide pass fills the sched cache and yields BOTH the round
    size and the per-partition lineage counts (the lineage commit then
    writes driver-held rows instead of re-scanning sched — one fewer
    full pass per round); concurrent consumers drain the cache instead
    of racing to fill it (unfilled-cache races serialize on block locks
    while occupying task slots)."""
    return (sched.groupBy(F.spark_partition_id().alias("partition_id"))
            .count().collect())


def run_round(ctx: CrawlContext, rnd: int) -> int:
    """One crawl round; returns the number of URLs scheduled.

    Round 3 job-count diet (the round-2 driver bench showed ~9 commit
    actions of fixed latency dominating measurement-sized rounds):
    gate+schedule+seq is ONE wide pass (the round-size count now comes
    from the cached seq output; seq partitioning uses the Σ-budget /
    last-round estimate instead of its own count job); the seen table
    is gone (SeenView above); the scheduled commit overlaps the
    extraction pass; and the bloom fold is amortized to the frontier
    compaction cadence instead of a read-merge-write every round.
    Round 4 adds round pipelining: when the previous round prefetched
    this round's gate/schedule/seq under its commit barrier
    (ctx.pipeline_rounds), the staged frames + histogram are consumed
    here and the round starts at the fetch stage."""
    if ctx._planned_next is not None and ctx._planned_next[0] == rnd:
        _, base, sched, seq_parts, sched_hist = ctx._planned_next
        ctx._planned_next = None
    else:
        _drop_planned(ctx)  # stale prefetch for another round, if any
        with _stage("plan_round_build"):
            base, sched, seq_parts, seq_rel = _plan_round(
                ctx, ctx.frontier.read())
        try:
            with _stage("gate_schedule_seq"):
                sched_hist = _sched_hist(sched)
        except BaseException:
            # a failed histogram pass must not pin the planning caches
            # (sched/base persists + the seq boundary pin, which
            # _plan_round's subtotal collect already filled)
            _release(sched)
            if seq_parts > 1:
                base.unpersist()
            for c in seq_rel:
                c.unpersist()
            raise
        for c in seq_rel:  # sched's cache is filled; pin releasable
            c.unpersist()
    n_sched = sum(int(r["count"]) for r in sched_hist)
    ctx.last_n_sched = n_sched
    if n_sched == 0:
        _release(sched)
        if seq_parts > 1:
            base.unpersist()
        return 0

    # small rounds write few files: state tables are append-only, so
    # per-round file count directly becomes next round's read fan-in
    ncoal = max(1, min(32, n_sched // 100_000 + 1))

    commit_pool = ThreadPoolExecutor(6)
    try:
        return _run_round_commits(ctx, rnd, commit_pool, sched, base,
                                  seq_parts, n_sched, sched_hist, ncoal)
    finally:
        # one finally spans pool creation through the commit barrier: an
        # exception anywhere in between (e.g. during the extraction
        # count) previously leaked the executor thread and swallowed a
        # _commit_scheduled failure
        commit_pool.shutdown(wait=True)


def _run_round_commits(ctx: CrawlContext, rnd: int,
                       commit_pool: ThreadPoolExecutor, sched: DataFrame,
                       base: DataFrame, seq_parts: int, n_sched: int,
                       sched_hist: list, ncoal: int) -> int:
    def _commit_scheduled() -> None:
        with _stage("write_scheduled"):
            ctx.scheduled.write(
                sched.select(F.lit(rnd).alias("round"),
                             F.col("seq").cast("long").alias("seq"), "url",
                             "url_hash", "host", "depth", "priority",
                             "rn").coalesce(ncoal),
                "append")

    # the scheduled commit only needs the (cached) sched rows — submit
    # it now so its job latency hides under the extraction pass below
    f_sched = commit_pool.submit(_commit_scheduled)

    # fetch + extract + link discovery (ops 11/42/43/46): the transport
    # seam turns the scheduled slice into pages (default: page-store
    # join, broadcast or bucket-pruned — html must NEVER shuffle; an
    # HTTP transport swaps in here for live deployment), then ONE
    # mapInArrow pass produces text and raw links together — html
    # enters exactly one python stage per round and is dropped on the
    # way out. The one call per politeness round IS the politeness
    # contract: sched is already budget-capped per host.
    fetched = ctx.transport.fetch(sched.select(F.col("url"),
                                               F.col("depth")))
    # _checkpoint (round 6, was _persist + a fill-under-the-histogram
    # dance): eager materialization runs at full parallelism BEFORE the
    # extracted write's coalesce exactly like the old cache-fill did,
    # AND truncates the plan, so the extracted write / links pipeline /
    # lineage gauge stop re-running Catalyst analysis over the fetch
    # join + Arrow extraction tree per action (see _checkpoint).
    with _stage("fetch_extract"):
        enriched = _checkpoint(extract_enrich_arrow(fetched))
    bloom_path = ctx.use_bloom and ctx.bloom.current_version() > 0
    extracted = enriched.select(
        "url", "warc_ts", "text", "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.lit(rnd).alias("round"))

    # resolve -> canonicalize -> gate: ALL native JVM expressions (the
    # pandas-UDF canonicalizer was ~40% of round compute at web10m)
    links = (
        enriched.select(
            F.col("url").alias("parent_url"), F.col("depth").alias("pdepth"),
            F.explode("links").alias("href"),
        )
        .withColumn("link", canonicalize_col(resolve_href_col(F.col("parent_url"), F.col("href"))))
        .filter(is_http_col(F.col("link")))
    )
    new_cand = links.select(
        F.col("link").alias("url"),
        (F.col("pdepth") + 1).alias("depth"),
        F.lit(rnd + 1).alias("discovered_round"),
        "parent_url",
    )
    # membership (ops 10/31): new frontier rows = candidates that were
    # never discovered (∉ the frontier's discovered log — which covers
    # seen: scheduled rows keep their base row with pending=false), on
    # the full url string — url_hash alone would admit hash collisions
    # at 10^10 rows.
    # Collision rule (min discovered_round, depth, parent) within the
    # round is the window below; against earlier rounds every pending
    # row predates every candidate (discovered_round <= rnd < rnd+1),
    # so dropping rediscovered urls IS the min rule, in O(round).
    #
    # With the discovered bloom, definitely-new candidates take no join
    # at all; maybe-discovered ones get the exact check. The candidate
    # set and the maybe-set are round-scoped caches: the expensive
    # explode + canonicalize + hash pipeline runs ONCE into the cand
    # cache (round 2 re-derived it under every consumer — the
    # "shared Exchange" only covered the dedup-window branch, so the
    # maybe broadcast build and the bucket collect each re-ran ~1M
    # canonicalizations per round at web10m), and the cached maybe-set
    # yields its COUNT, which picks the join strategy per round:
    # broadcast while the maybe-set is driver-hashable, scalable
    # shuffle join beyond that (the driver-side broadcast build is
    # single-threaded — at web10m it was the crawl's main non-scaling
    # component).
    round_caches = []
    if bloom_path:
        cand = _checkpoint(
            new_cand.withColumn("url_hash", F.xxhash64("url")),
            "MEMORY_AND_DISK")
        round_caches.append(cand)
        # probe pass: candidate urls that MIGHT be discovered.
        # Duplicate urls are harmless in the semi-join build, and bloom
        # false positives only inflate this probe set, never the result.
        maybe_urls = (bloom_ops.mark_candidates(
            cand, ctx.bloom.read(), ctx.bloom_buckets,
            m_bits=ctx.bloom_m_bits, k=ctx.bloom_k)
            .filter(F.col("_maybe")).select("url"))
        # the bloom folds at frontier-compaction cadence (see the
        # frontier commit below), so rounds since the last fold are NOT
        # in the bitmaps yet: their adds still sit in the delta log.
        # Candidates hitting those recent hashes must also enter the
        # exact check — no-false-negative invariance is bloom ∪ delta.
        # The delta log is bounded by compact_every × round size, and
        # the semi-join broadcasts only int64 hashes (a url_hash
        # collision merely inflates the maybe set).
        if ctx.frontier.delta.n_segments():
            recent = ctx.frontier._delta_df().select("url_hash")
            maybe_urls = maybe_urls.unionByName(
                cand.join(F.broadcast(recent), "url_hash", "left_semi")
                .select("url"))
        maybe_urls = _persist(maybe_urls, "MEMORY_AND_DISK")
        round_caches.append(maybe_urls)
        with _stage("maybe_set"):
            # ONE job fills both caches (cand under the probe) and
            # yields the per-bucket maybe histogram: its sum is the
            # count that picks the join strategy, its keys are the
            # bucket list for pruned scans (driver latency is the
            # crawl's non-scaling component — every folded action
            # counts)
            hist = maybe_urls.groupBy(
                F.pmod(F.xxhash64("url"),
                       F.lit(ctx.frontier.n_buckets)).cast("int")
                .alias("b")).count().collect()
        n_maybe = sum(int(r["count"]) for r in hist)
        # bucket pruning: once the base outgrows
        # membership_prune_min_bytes, statically prune the
        # discovered-log scan to the maybe-set's buckets — O(touched
        # buckets), not O(corpus). A maybe-set touching most buckets
        # degenerates to the full scan.
        buckets = None
        base_bytes = ctx.frontier.base_bytes()
        if base_bytes >= ctx.membership_prune_min_bytes:
            got = [int(r["b"]) for r in hist]
            if len(got) <= 0.5 * ctx.frontier.n_buckets:
                buckets = got
        if os.environ.get("DCS_PROFILE") == "1":
            # scan-bytes accounting for the exact-membership base scan
            # (driver stat walk, profiling only): what a pruned scan
            # reads vs the full base
            MEMBERSHIP_METRICS.append({
                "round": rnd,
                "base_bytes": base_bytes,
                "scanned_bytes": (ctx.frontier.bucket_bytes(buckets)
                                  if buckets is not None else base_bytes),
                "buckets_touched": (len(buckets) if buckets is not None
                                    else ctx.frontier.n_buckets),
                "pruned": buckets is not None,
            })
        ever = ctx.frontier.discovered(buckets).select("url")
        use_broadcast = ctx.membership_join == "broadcast" or (
            ctx.membership_join == "auto"
            and n_maybe <= ctx.membership_broadcast_max_rows)
        if use_broadcast:
            # scan-side check: the discovered log is only SCANNED (url
            # column, bucket-pruned parquet) — never shuffled, never
            # built into an O(frontier) driver-side broadcast hash
            # (that build was 2-5s/round and the JVM's main full-GC
            # source).
            hits = ever.join(F.broadcast(maybe_urls), "url", "left_semi")
            # no-false-negative property: every discovered candidate url
            # is in maybe_urls, so `hits` = ever ∩ candidate urls and
            # dedup(cand) ∖ hits is EXACTLY the undiscovered candidates
            new_rows = _dedup_frontier(cand).join(
                F.broadcast(hits), "url", "left_anti")
        else:
            # beyond-broadcast rounds: shuffle both sides on url — the
            # join scales with cores instead of serializing into the
            # driver's broadcast build (a real cluster co-locates this
            # with bucketed storage-partitioned joins)
            hits = ever.join(maybe_urls, "url", "left_semi")
            new_rows = _dedup_frontier(cand).join(hits, "url", "left_anti")
        new_rows = new_rows.drop("url_hash")
    else:
        fresh = new_cand.join(
            ctx.frontier.discovered().select("url"), "url", "left_anti")
        new_rows = _dedup_frontier(fresh)

    # the commit is O(delta): new rows append to the delta log, the
    # scheduled urls append as tombstones; the store compacts every few
    # rounds (plans/frontier.py) instead of rewriting O(frontier)/round.
    new_rows = _frontier_cols(new_rows)

    def _commit_extracted() -> None:
        with _stage("write_extracted"):
            ctx.extracted.write(
                extracted.select(
                    [f.name for f in schemas.EXTRACTED]).coalesce(ncoal),
                mode="append")

    def _commit_frontier_bloom() -> None:
        with _stage("write_frontier"):
            ctx.frontier.commit_round(
                new_rows.select([f.name for f in schemas.FRONTIER]),
                sched.select("url", "url_hash"), compact=False)
        # discovered-bloom fold (op 31), amortized: instead of a
        # read-merge-write of the full bitmap table every round, the
        # fold runs at the frontier's compaction cadence and hashes the
        # WHOLE delta log (exactly the adds since the last fold) in one
        # O(delta-log) pass. Between folds the membership probe unions
        # the delta hashes (see above), so exactness never lags.
        if ctx.frontier.needs_compaction():
            # fold whenever a sidecar EXISTS (v>0), independent of this
            # run's use_bloom: a use_bloom=False stretch that compacted
            # (truncating the delta log) without folding would leave a
            # PERSISTED bloom missing those URLs — a later use_bloom
            # resume then gets false negatives and re-discovers seen
            # URLs (silent visit-order divergence). Existence-only (not
            # `or ctx.use_bloom`): a sidecar may only be BORN at
            # bootstrap, where it covers the whole frontier — folding a
            # v==0 state here would create a delta-only bloom that the
            # v>0-gated probe would then trust
            if ctx.bloom.current_version() > 0:
                with _stage("write_bloom"):
                    ctx.bloom.write(bloom_ops.update_bloom(
                        ctx.bloom.read(),
                        ctx.frontier._delta_df().select("url_hash"),
                        n_buckets=ctx.bloom_buckets,
                        m_bits=ctx.bloom_m_bits, k=ctx.bloom_k))
            with _stage("compact_frontier"):
                ctx.frontier.compact()

    def _commit_lineage(after) -> None:
        # lineage / metrics (ops 04b/18): per-partition scheduled counts
        # (already collected by the round-size pass — no sched re-scan)
        # plus round-level fetch/dedup/frontier gauges (partition_id=-1)
        rows = [(rnd, int(r["partition_id"]), "scheduled", int(r["count"]))
                for r in sched_hist]
        if ctx.lineage_gauges:
            # the frontier-size gauge reads the post-commit pending set;
            # two of these are full-table counts over monotonically
            # growing tables — diagnostics only, honoring the flag
            # keeps tight loops O(round) instead of O(total-seen).
            for f in after:
                f.result()
            gauges = [
                # cache-drain count (the wide pass already ran) —
                # skipped entirely when gauges are off
                ("fetched", enriched.count()),
                ("frontier_size", ctx.frontier.read().count()),
                ("seen_size", ctx.seen.read().count()),
            ]
            rows += [(rnd, -1, m, int(v)) for m, v in gauges]
        # driver-side pyarrow commit: the rows ARE driver-held (that is
        # the point of folding lineage into the sched histogram), so a
        # Spark job here would only add the python-RDD write's ~4s
        # fixed latency — measured as the largest single component of
        # measurement-sized rounds (round-4 'What's wrong' #2)
        with _stage("write_lineage"):
            ctx.lineage.write_rows(rows, mode="append")

    # the commit groups touch disjoint tables and read only
    # round-cached data — submit them concurrently to overlap their
    # fixed job latency (the crawl checkpoint below is what makes the
    # round atomic, so commit ORDER between tables is irrelevant:
    # a crash before the checkpoint rolls every table back together).
    # f_sched (submitted before the extraction pass) joins the barrier.
    # The pool itself is shut down by run_round's finally, which spans
    # from pool creation through here.
    def _commit_events() -> None:
        # typed race-event mining (opt-in): one native regex/from_json
        # pass over the round's fetched slice — no Python, and the
        # event rows that leave the scan are skinny typed records.
        # Reuses the round's ONE transport.fetch plan (ADVICE r5: a
        # second fetch() call per round broke the one-call-per-
        # politeness-round contract and could double a live
        # transport's per-host budget). NOTE each Spark ACTION still
        # re-evaluates the plan: the PageStore join is idempotent; a
        # live HTTP transport must memoize the round's responses
        # behind its fetch() seam for extract_events to be coherent.
        from data_crawler_spark.operators.structured import \
            race_event_records
        with _stage("write_events"):
            ev = race_event_records(fetched.select("url", "html"))
            ctx.events.write(
                ev.select("url", F.lit(rnd).alias("round"), "event_name",
                          "start_date", "location_name", "distance_km",
                          "n_finishers", "winner", "winner_time_s")
                .coalesce(ncoal),
                mode="append")

    f_ext = commit_pool.submit(_commit_extracted)
    f_ev = (commit_pool.submit(_commit_events)
            if ctx.extract_events else None)
    f_fb = commit_pool.submit(_commit_frontier_bloom)
    f_lin = commit_pool.submit(_commit_lineage, (f_fb, f_sched))

    def _prefetch_next():
        # round pipelining: as soon as THIS round's frontier commit
        # lands, next round's pending view is readable — build its
        # gate/schedule/seq plan and run the histogram pass while the
        # extracted/lineage commits and the checkpoint drain. Planning
        # from the committed read() (not derived in-memory frames)
        # keeps the plan byte-identical to the inline path and the
        # lineage anchored to files, so nothing accumulates across
        # rounds. An exception here is re-raised at the barrier: the
        # same failure would hit round rnd+1's inline planning anyway.
        f_fb.result()
        nbase, nsched, nparts, nrel = _plan_round(ctx, ctx.frontier.read())
        try:
            with _stage("prefetch_next_gate"):
                hist = _sched_hist(nsched)
        except BaseException:
            _release(nsched)
            if nparts > 1:
                nbase.unpersist()
            for c in nrel:
                c.unpersist()
            raise
        for c in nrel:  # nsched's cache is filled; pin releasable
            c.unpersist()
        return rnd + 1, nbase, nsched, nparts, hist

    f_pre = (commit_pool.submit(_prefetch_next)
             if ctx.pipeline_rounds else None)
    try:
        with _stage("commit_barrier"):
            for f in (f_sched, f_ext, f_fb, f_lin,
                      *((f_ev,) if f_ev is not None else ())):
                f.result()
    except BaseException:
        # best-effort release of the prefetch's caches while the commit
        # failure propagates (the round will be replayed from the
        # checkpoint; the staged frames are only reachable via f_pre)
        if f_pre is not None:
            try:
                ctx._planned_next = f_pre.result()
                _drop_planned(ctx)
            except Exception:
                pass
        raise

    # the commit point: everything above is replayable until this lands
    ctx.checkpoint.commit({
        "round": rnd + 1,
        "frontier_v": ctx.frontier.versions(),
        "scheduled_v": ctx.scheduled.current_version(),
        "extracted_v": ctx.extracted.current_version(),
        "lineage_v": ctx.lineage.current_version(),
        "bloom_v": ctx.bloom.current_version(),
        "events_v": ctx.events.current_version(),
    })
    if f_pre is not None:
        # stage the prefetched next-round plan (reads only committed
        # files, so the cache releases below can't invalidate it). A
        # prefetch failure must NOT fail a round that already committed
        # — discard the plan (next round plans inline, surfacing any
        # persistent error there) and fall through to the cache
        # releases below, which otherwise leak for the session.
        try:
            ctx._planned_next = f_pre.result()
        except Exception:
            ctx._planned_next = None
    _release(enriched)
    _release(sched)
    for c in round_caches:
        _release(c)
    if seq_parts > 1:
        base.unpersist()
    if ctx.gc_keep:
        for t in (ctx.frontier, ctx.scheduled, ctx.extracted,
                  ctx.lineage, ctx.bloom):
            t.prune(keep_last=ctx.gc_keep)
    return n_sched


def run_crawl(spark: SparkSession, web_dir: str | Path, state_dir: str | Path,
              max_rounds: int = 100, resume: bool = True,
              n_salts: int = 16, use_bloom: bool = True,
              gc_keep: int | None = None,
              lineage_gauges: bool = True,
              budget_scale: int = 1,
              membership_join: str = "auto",
              pipeline_rounds: bool = True,
              verify_state: bool = True,
              transport: Transport | None = None,
              extract_events: bool = False) -> dict:
    """Drive rounds to quiescence (or max_rounds). Resumable: picks up
    from the last committed checkpoint when ``resume`` and one exists.

    ``verify_state``: before resuming onto an existing checkpoint, the
    state dir passes the metadata fsck (plans/fsck.py) — a DAMAGED
    state (manifest referencing missing files, table behind the
    checkpoint: shapes no crash can produce) fails fast with the
    error list instead of misbehaving mid-round. Legal post-crash
    shapes (tables ahead of the checkpoint, staged orphan dirs) are
    warnings and resume normally. Driver-side file metadata only —
    one manifest read + dir listing per table, no Spark job; pass
    False to skip (e.g. a state on a store where listings are slow)."""
    if resume and verify_state \
            and (Path(state_dir) / "checkpoint.json").exists():
        from data_crawler_spark.plans.fsck import fsck_state
        rep = fsck_state(state_dir)
        if not rep["ok"]:
            raise RuntimeError(
                "state dir failed the integrity check before resume: "
                + "; ".join(rep["errors"])
                + " — inspect with tools/fsck_state.py")
    ctx = open_crawl(spark, web_dir, state_dir, n_salts=n_salts,
                     use_bloom=use_bloom, gc_keep=gc_keep,
                     lineage_gauges=lineage_gauges,
                     budget_scale=budget_scale,
                     membership_join=membership_join,
                     transport=transport,
                     extract_events=extract_events)
    ctx.pipeline_rounds = pipeline_rounds
    cp = ctx.checkpoint.load() if resume else None
    if cp is None:
        with _stage("bootstrap"):
            bootstrap(ctx)
        start = 0
    else:
        # discard any table commits from a round whose crawl-level
        # checkpoint never landed (crash mid-round) -> exactly-once
        # (seen is a view over scheduled — its rollback IS this one)
        ctx.frontier.rollback(cp["frontier_v"])
        ctx.scheduled.rollback(cp.get("scheduled_v", 0))
        ctx.extracted.rollback(cp.get("extracted_v", 0))
        ctx.lineage.rollback(cp.get("lineage_v", 0))
        ctx.bloom.rollback(cp.get("bloom_v", 0))
        ctx.events.rollback(cp.get("events_v", 0))
        start = cp["round"]
    total = 0
    for rnd in range(start, max_rounds):
        n = run_round(ctx, rnd)
        if n == 0:
            break
        total += n
    # a max_rounds exit can leave the last round's prefetch staged —
    # release its caches (quiescence exits never prefetch: a 0-sched
    # round returns before the commit stage)
    _drop_planned(ctx)
    # seen set size == scheduled rows ever (each url schedules at most
    # once) == the sum of the per-round lineage histograms — a
    # driver-side pyarrow read of the metadata table instead of a full
    # scheduled-table count job (which at the 10^10 design point scans
    # the whole table at every run_crawl exit). Exactness is
    # golden/equivalence-tested; the lineage table rolls back with the
    # checkpoint, so resumed states stay consistent.
    lin = ctx.lineage.read_rows()
    import pyarrow.compute as pc
    sched_rows = lin.filter(
        pc.and_(pc.equal(lin.column("metric"), "scheduled"),
                pc.greater_equal(lin.column("partition_id"), 0)))
    seen_count = int(pc.sum(sched_rows.column("value")).as_py() or 0)
    return {
        "rounds_run": ctx.checkpoint.load()["round"],
        "scheduled_total": total,
        "seen_count": seen_count,
        "ctx": ctx,
    }


def visit_order_df(ctx: CrawlContext) -> DataFrame:
    """The global visit order (round, seq, url) — total-ordered."""
    return ctx.scheduled.read().orderBy("round", "seq").select("round", "seq", "url")
