"""The scheduler core: per-host politeness priority queue (SURVEY.md §2
ops 22/26/27) with explicit host-hash SALTED skew breaking (op 15 —
demanded by BASELINE.json:6,14; AQE skew handling does not cover
window partitionBy, which is exactly where Zipf-head event-listing
domains land).

Ordering spec (shared with oracle/crawler.py — total orders only):
  within host : (priority DESC, depth ASC, discovered_round ASC, url ASC)
  crawl order : (priority DESC, depth ASC, host ASC, url ASC)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 8

def _host_order() -> list:
    return [F.desc("priority"), F.asc("depth"),
            F.asc("discovered_round"), F.asc("url")]


def _with_budget(candidates: DataFrame, hosts: DataFrame) -> DataFrame:
    b = F.broadcast(hosts.select("host", "budget_per_round"))
    return candidates.join(b, "host", "left").withColumn(
        "budget", F.coalesce("budget_per_round", F.lit(DEFAULT_BUDGET))
    ).drop("budget_per_round")


def schedule_per_host(candidates: DataFrame, hosts: DataFrame) -> DataFrame:
    """Unsalted op 22: rank per host, keep rank <= budget_per_round."""
    w = Window.partitionBy("host").orderBy(*_host_order())
    return (
        _with_budget(candidates, hosts)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("budget"))
        .drop("budget")
    )


def schedule_per_host_salted(candidates: DataFrame, hosts: DataFrame,
                             n_salts: int = 16) -> DataFrame:
    """Salted two-phase op 22 — semantics-preserving (op 15).

    Phase 1: rank within (host, salt) where salt = pmod(xxhash64(url),
    S); keep top ``budget`` per salt group. Because the per-host winners
    are necessarily among the per-(host,salt) top-budget rows, phase 2
    re-ranks only S*budget rows per host — the Zipf-head host's millions
    of candidates never pass through a single task.
    Result is provably identical to schedule_per_host for every S
    (property-tested in tests/test_scheduler.py).
    """
    salted = _with_budget(candidates, hosts).withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
    )
    w1 = Window.partitionBy("host", "salt").orderBy(*_host_order())
    survivors = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= F.col("budget"))
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("host").orderBy(*_host_order())
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= F.col("budget"))
        .drop("budget")
    )


def _crawl_order() -> list:
    """THE total visit order (url unique) — one definition, shared by
    crawl_order and with_crawl_seq so seq can never drift from the
    emitted sequence."""
    return [F.desc("priority"), F.asc("depth"),
            F.asc("host"), F.asc("url")]


def crawl_order(scheduled: DataFrame) -> DataFrame:
    """op 26: the emitted visit order — a TOTAL order (url unique), so
    the output sequence is deterministic regardless of partitioning."""
    return scheduled.orderBy(*_crawl_order())


def with_crawl_seq(scheduled: DataFrame, num_partitions: int = 1,
                   release_into: list | None = None) -> DataFrame:
    """Attach the within-round visit sequence number (1-based) without
    collecting rows to the driver.

    num_partitions == 1: a single window over the total order — one
    Exchange to one task, the cheapest plan when the scheduled set is
    small (it is bounded by Σ host budgets).

    num_partitions > 1 (the 100×-scale path): two-phase sequencing via
    operators/prefix.exclusive_prefix_sum (range-partition + sort,
    P-long subtotal collect, streaming per-partition assignment over a
    boundary-pinning cache — see that module for why the pin is
    load-bearing). seq = exclusive row count + 1. No single task ever
    sees more than ~1/P of the rows. Output seq is identical for every
    P because the order is total (url unique) — property-tested in
    tests/test_scheduler.py.

    NOTE: callers should persist `scheduled` — the range exchange scans
    it twice (boundary sketch + shuffle write) before the pinned frame
    serves the downstream jobs. Pass ``release_into`` to reclaim the
    pinned blocks once the output is materialized.
    """
    order = _crawl_order()
    if num_partitions <= 1:
        w = Window.orderBy(*order)
        return scheduled.withColumn("seq", F.row_number().over(w))

    from .prefix import exclusive_prefix_sum

    out = exclusive_prefix_sum(scheduled, order, F.lit(1), "seq",
                               num_partitions, release_into=release_into)
    return out.withColumn("seq", F.col("seq") + 1)


def adaptive_host_budgets(host_yield: DataFrame, total_budget: int,
                          floor: int = 1, cap: int | None = None,
                          host_col: str = "host",
                          yield_col: str = "yield") -> DataFrame:
    """Next-round per-host politeness budgets from observed yield —
    the feedback loop between crawl results and the scheduler: hosts
    whose last rounds produced more of what the crawl wants (kept
    pages, novel URLs, quality mass — the caller picks the metric)
    earn a larger share of the next round's total fetch budget, while
    every host keeps at least ``floor`` so low-yield hosts are probed,
    not starved (the explore/exploit floor).

    Allocation: with Y = Σ max(yield, 0) over hosts,
    budget_h = floor + int((total_budget − floor·n_hosts) · y_h / Y),
    then ``least(·, cap)`` when ``cap`` is set. Flooring the shares
    UNDER-allocates by at most n_hosts−1 fetches rather than ever
    overshooting ``total_budget``; Y == 0 (no yield anywhere) splits
    the extra evenly. Deterministic in the data, partitioning-
    invariant.

    Scale shape: ONE 1-row aggregate (Y, n_hosts) then a pure map over
    the host table — no join, no window, no sort; the output is the
    ``(host, budget_per_round)`` dimension ``schedule_per_host``
    broadcasts. Raises when ``total_budget`` cannot fund the floor."""
    if floor < 0 or total_budget <= 0:
        raise ValueError(f"need total_budget > 0 and floor >= 0, got "
                         f"{total_budget}, {floor}")
    y = F.greatest(F.col(yield_col).cast("double"), F.lit(0.0))
    tot = host_yield.agg(F.sum(y).alias("y"),
                         F.count("*").alias("n")).collect()[0]
    n_hosts, total_y = int(tot["n"]), float(tot["y"] or 0.0)
    if n_hosts == 0:
        return host_yield.select(F.col(host_col).alias("host"),
                                 F.lit(0).cast("int")
                                 .alias("budget_per_round"))
    extra = total_budget - floor * n_hosts
    if extra < 0:
        raise ValueError(
            f"total_budget {total_budget} cannot fund floor {floor} "
            f"for {n_hosts} hosts")
    if total_y > 0:
        share = F.floor(F.lit(float(extra)) * y / F.lit(total_y))
    else:
        share = F.lit(extra // n_hosts)
    # long, not int: a dominant host's share of a multi-billion fetch
    # budget overflows int32 (non-ANSI cast would wrap silently)
    b = (F.lit(floor) + share).cast("long")
    if cap is not None:
        b = F.least(b, F.lit(int(cap)).cast("long"))
    return host_yield.select(F.col(host_col).alias("host"),
                             b.alias("budget_per_round"))
