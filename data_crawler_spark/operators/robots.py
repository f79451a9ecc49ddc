"""robots.txt gating (SURVEY.md §2 op 09): longest-prefix-match,
allow-overrides-disallow. Executable spec: oracle.crawler.robots_allows.

Plan shape (zero frontier shuffle): the rules table is pre-aggregated
into ONE row per host carrying an array<struct<prefix,allow>> (tiny:
O(hosts) rows), broadcast, and joined on `host` alone — each candidate
matches at most one rules row, so the join neither fans out nor
shuffles. The longest-match verdict is then pure array expressions
(filter + transform + array_max over an orderable struct), evaluated
row-local inside whole-stage codegen. No Exchange anywhere
(tests/test_plans.py asserts zero), unlike the previous formulation
whose per-url groupBy hash-shuffled the entire frontier each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_rules_df(rules: DataFrame) -> DataFrame:
    """rules(host, rule_type, path_prefix) -> one row per host with
    array<struct<prefix,allow>> — the broadcastable per-host dictionary."""
    return rules.groupBy(F.col("host").alias("r_host")).agg(
        F.collect_list(
            F.struct(
                F.col("path_prefix").alias("prefix"),
                (F.col("rule_type") == "allow").alias("allow"),
            )
        ).alias("r_rules")
    )


def robots_gate(candidates: DataFrame, rules: DataFrame) -> DataFrame:
    """Filter ``candidates`` (must carry url, host, path) to robots-allowed.

    Verdict per url: among rules whose prefix matches the path, take the
    longest; allow wins length ties (max over struct(len, allow) — Spark
    orders structs lexicographically and true > false). No matching rule
    (or no rules row for the host) => allowed.
    """
    hr = F.broadcast(host_rules_df(rules))
    joined = candidates.join(hr, candidates["host"] == hr["r_host"], "left")
    matching = F.filter("r_rules", lambda r: F.col("path").startswith(r["prefix"]))
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("ln"), r["allow"].alias("allow")
            ),
        )
    )
    return (
        joined.withColumn("_best", best)
        .filter(F.col("_best").isNull() | F.col("_best.allow"))
        .select(*[candidates[c] for c in candidates.columns])
    )
