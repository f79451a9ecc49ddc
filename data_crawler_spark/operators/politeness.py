"""Politeness audit (SURVEY.md §2 ops 25/39): verify, from the crawl's
own output tables, that the scheduler honored per-host budgets — the
dataflow analogue of wall-clock crawl-delay auditing (each round is one
politeness epoch; budget_per_round = f(crawl_delay), the executable
spec in sources/web.py::BUDGET_BY_DELAY and oracle/crawler.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_host_round_counts(scheduled: DataFrame) -> DataFrame:
    """(host, round) -> URLs scheduled; the audit's base aggregate."""
    return scheduled.groupBy("host", "round").agg(F.count("*").alias("n_scheduled"))


def budget_violations(scheduled: DataFrame, hosts: DataFrame) -> DataFrame:
    """Rows where a (host, round) exceeded its politeness budget —
    MUST be empty for a correct crawl (asserted in tests). The
    missing-host fallback is THE scheduler's default (imported, not a
    re-typed literal — an audit that hardcodes its own copy certifies
    the wrong bound the day the default moves)."""
    from data_crawler_spark.operators.scheduler import DEFAULT_BUDGET

    counts = per_host_round_counts(scheduled)
    b = F.broadcast(hosts.select("host", "budget_per_round"))
    return (counts.join(b, "host", "left")
            .filter(F.col("n_scheduled")
                    > F.coalesce("budget_per_round",
                                 F.lit(DEFAULT_BUDGET))))


def inter_round_gaps(scheduled: DataFrame) -> DataFrame:
    """op 25: lag() per host over rounds — how many rounds a host sat
    idle between fetch bursts (politeness pacing profile)."""
    w = Window.partitionBy("host").orderBy("round")
    counts = per_host_round_counts(scheduled)
    return counts.select(
        "host", "round", "n_scheduled",
        (F.col("round") - F.lag("round").over(w)).alias("rounds_since_prev"),
        F.sum("n_scheduled").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cumulative_scheduled"),
    )


def host_session_blocks(scheduled: DataFrame, gap_rounds: int = 2) -> DataFrame:
    """op 39 (batch form): contiguous per-host activity sessions — a new
    session starts when a host was idle for >= gap_rounds rounds.
    Idle rounds between active rounds r and prev is ``r - prev - 1``
    (adjacent rounds = zero idle), so the split fires at
    ``r - prev - 1 >= gap_rounds`` — the bare ``r - prev`` form split
    one round early."""
    w = Window.partitionBy("host").orderBy("round")
    marked = (
        per_host_round_counts(scheduled)
        .withColumn("prev", F.lag("round").over(w))
        .withColumn("new_session",
                    F.when(F.col("prev").isNull()
                           | (F.col("round") - F.col("prev") - 1
                              >= gap_rounds), 1)
                    .otherwise(0))
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (sess.groupBy("host", "session_id")
            .agg(F.min("round").alias("session_start"),
                 F.max("round").alias("session_end"),
                 F.sum("n_scheduled").alias("n_in_session")))


# ---------------------------------------------------------------------------
# Fetch-status feedback: error-aware host backoff (RFC 9110 Retry-After)
# ---------------------------------------------------------------------------

def fetch_status_class_col(status: Column) -> Column:
    """HTTP status code -> the coarse class the crawl loop routes on:
    ``ok`` (2xx), ``redirect`` (3xx), ``gone`` (404/410 — drop the
    URL, don't retry), ``throttled`` (429 Too Many Requests / 503
    Service Unavailable — the server is TELLING us to slow down),
    ``client_error`` (other 4xx), ``server_error`` (other 5xx),
    ``unknown`` (null / out-of-range — connection-level failures a
    fetcher logs without a status). Pure map. try_cast, not cast:
    a fetch log that stores status as string maps malformed/empty
    values (connection-level failures) to ``unknown`` instead of
    aborting the job under ANSI mode."""
    s = status.try_cast("int")
    return (
        F.when(s.isNull(), "unknown")
        .when(s.isin(429, 503), "throttled")
        .when((s >= 200) & (s < 300), "ok")
        .when((s >= 300) & (s < 400), "redirect")
        .when(s.isin(404, 410), "gone")
        .when((s >= 400) & (s < 500), "client_error")
        .when((s >= 500) & (s < 600), "server_error")
        .otherwise("unknown"))


def retry_after_until_col(retry_after: Column, fetched_at: Column) -> Column:
    """RFC 9110 §10.2.3 ``Retry-After`` -> the absolute timestamp the
    server asked us to wait until: the header is EITHER delta-seconds
    or an IMF-fixdate — delta is anchored at ``fetched_at``. Null when
    absent or unparsable (try_cast / try_to_timestamp; the day-of-week
    prefix is stripped and the zone parsed with 'zzz', both per
    freshness.cache_directives_col's parsing rules)."""
    ra = F.trim(retry_after.cast("string"))
    delta = F.nullif(ra, F.lit("")).try_cast("long")
    http_date = F.try_to_timestamp(
        F.regexp_replace(ra, r"^[A-Za-z]+,\s*", ""),
        F.lit("dd MMM yyyy HH:mm:ss zzz"))
    return F.when(
        delta.isNotNull(),
        F.timestamp_add("SECOND", delta, fetched_at.cast("timestamp"))
    ).otherwise(http_date)


def host_backoff(fetches: DataFrame, now, *, host_col: str = "host",
                 status_col: str = "status",
                 retry_after_col: str | None = None,
                 fetched_at_col: str | None = None,
                 base_backoff_s: int = 60,
                 max_backoff_s: int = 3600,
                 error_threshold: float = 0.5) -> DataFrame:
    """Per-host backoff table from a round's fetch log — the
    error-side politeness feedback loop (adaptive_host_budgets is the
    yield side): a host that throttled us (429/503) or mostly failed
    (server-error fraction >= ``error_threshold``) gets a
    ``backoff_until`` timestamp the scheduler must respect.

    The penalty is exponential in the host's error count —
    ``least(base_backoff_s * 2^min(n_err - 1, 20), max_backoff_s)``
    seconds from ``now`` (the Heritrix-style retry ramp, capped so one
    bad round never parks a host for a week) — and an explicit
    ``Retry-After`` always wins when it asks for MORE than the ramp:
    ``backoff_until = greatest(now + penalty, max Retry-After)``.
    Hosts with no throttle signal and an error fraction below the
    threshold emit no row (the output is a sparse dimension, like the
    hosts table itself).

    Scale shape: one map-side-partial groupBy on host — the fetch log
    is scanned once, output is O(hosts-in-trouble). Deterministic in
    the data; ``now`` is a datetime or ISO string (the
    recrawl_priority convention)."""
    if not 0.0 < error_threshold <= 1.0:
        raise ValueError(
            f"error_threshold must be in (0,1], got {error_threshold}")
    if base_backoff_s <= 0 or max_backoff_s < base_backoff_s:
        raise ValueError(
            f"need 0 < base_backoff_s <= max_backoff_s, got "
            f"{base_backoff_s}, {max_backoff_s}")
    cls = fetch_status_class_col(F.col(status_col))
    explicit = (
        retry_after_until_col(
            F.col(retry_after_col),
            F.col(fetched_at_col) if fetched_at_col else F.lit(now))
        if retry_after_col else F.lit(None).cast("timestamp"))
    # only a throttle response's Retry-After is a backoff instruction
    # (on a 3xx it means "poll the redirect target later", not "slow
    # down" — RFC 9110 lists both uses)
    per = fetches.select(
        F.col(host_col).alias("host"), cls.alias("cls"),
        F.when(cls == "throttled", explicit).alias("ra"))
    agg = per.groupBy("host").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("cls") == "throttled").alias("n_throttled"),
        F.count_if(F.col("cls").isin("throttled", "server_error"))
        .alias("n_err"),
        F.max("ra").alias("explicit_until"))
    troubled = agg.filter(
        (F.col("n_throttled") > 0)
        | (F.col("n_err") >= F.lit(float(error_threshold)) * F.col("n")))
    penalty_s = F.least(
        F.lit(base_backoff_s)
        * F.pow(F.lit(2.0), F.least(F.col("n_err") - 1, F.lit(20))
                .cast("double")),
        F.lit(float(max_backoff_s))).cast("long")
    ramp_until = F.timestamp_add(
        "SECOND", penalty_s, F.lit(now).cast("timestamp"))
    return troubled.select(
        "host", "n_err", "n_throttled",
        F.greatest(ramp_until, F.col("explicit_until"))
        .alias("backoff_until"))


def apply_backoff(hosts: DataFrame, backoffs: DataFrame, now) -> DataFrame:
    """Fold a ``host_backoff`` table into the scheduler's hosts
    dimension: a host whose ``backoff_until`` is still in the future
    at ``now`` gets ``budget_per_round = 0`` this round (scheduled
    nothing, stays in the frontier — the budget comes back the round
    the backoff expires). Broadcast join against the sparse backoff
    dimension + pure map, the apply_crawl_delay shape."""
    b = F.broadcast(backoffs.select("host", "backoff_until"))
    active = (F.col("backoff_until").isNotNull()
              & (F.col("backoff_until") > F.lit(now).cast("timestamp")))
    return (hosts.join(b, "host", "left")
            .withColumn("budget_per_round",
                        F.when(active, F.lit(0))
                        .otherwise(F.col("budget_per_round")))
            .drop("backoff_until"))


def apply_ip_politeness(hosts: DataFrame, resolved: DataFrame,
                        budget_col: str = "budget_per_round") -> DataFrame:
    """Fold shared-IP politeness into the hosts dimension: virtual
    hosting means N polite per-HOST budgets can still stack into one
    impolite per-SERVER load (Heritrix's queue-assignment-by-IP
    politeness mode exists for exactly this). Given ``resolved``
    (host, ip) — DNS resolution is the fetcher's external seam — hosts
    sharing an IP share ONE budget: the MINIMUM any member claimed
    (members' budgets already fold robots Crawl-delay/backoff, and a
    shared server is entitled to the strictest of those promises),
    split evenly with the remainder going to lexicographically
    smallest hosts, so the group total never exceeds the group
    budget and the split is deterministic. Hosts with no resolved IP
    (or a null ip) keep their own budget unchanged.

    Shape: the hosts dimension is O(hosts) slim rows; one equi-join
    with the resolution map, one per-ip window over group sizes that
    are almost always 1 — nothing corpus-scale moves."""
    # multi-homed hosts (several A-records) pin to their MINIMUM ip —
    # dropDuplicates alone keeps an arbitrary row, which would move
    # the host between ip groups run-to-run and change every member's
    # share; min() keeps the documented determinism
    r = (resolved.where(F.col("ip").isNotNull())
                 .groupBy(F.col("host").alias("_h"))
                 .agg(F.min("ip").alias("ip")))
    joined = hosts.join(r, hosts["host"] == F.col("_h"), "left").drop("_h")
    # unresolved hosts get SINGLETON window groups (keyed on their own
    # host) — partitioning the window on raw ip would funnel every
    # null-ip host through one task at scale
    gkey = F.coalesce(F.col("ip"), F.concat(F.lit("\x00host:"), F.col("host")))
    grp = Window.partitionBy(gkey)
    w = Window.partitionBy(gkey).orderBy(F.asc("host"))
    cap = F.min(budget_col).over(grp)
    n = F.count("*").over(grp)
    rank = F.row_number().over(w)
    share = (F.floor(cap / n)
             + F.when(rank <= cap % n, F.lit(1)).otherwise(F.lit(0)))
    return (joined.withColumn(
        budget_col,
        F.when(F.col("ip").isNull(), F.col(budget_col))
         .otherwise(share.cast("long")))
        .drop("ip"))
