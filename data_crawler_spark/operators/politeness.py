"""Politeness audit (SURVEY.md §2 ops 25/39): verify, from the crawl's
own output tables, that the scheduler honored per-host budgets — the
dataflow analogue of wall-clock crawl-delay auditing (each round is one
politeness epoch; budget_per_round = f(crawl_delay), the executable
spec in sources/web.py::BUDGET_BY_DELAY and oracle/crawler.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
