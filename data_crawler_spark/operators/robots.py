"""robots.txt gating (SURVEY.md §2 op 09): longest-prefix-match,
allow-overrides-disallow. Executable spec: oracle.crawler.robots_allows.

Plan shape: broadcast the (tiny: O(hosts)) rules table against the big
candidate frontier — no shuffle of the frontier at all. The per-URL
longest-match pick is a max_by aggregate keyed by the candidate row,
grouped on the frontier's own key (url), so Catalyst plans it as a
partial+final hash aggregate over the broadcast-join output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_gate(candidates: DataFrame, rules: DataFrame) -> DataFrame:
    """Filter ``candidates`` (must carry url, host, path) to robots-allowed.

    ``rules(host, rule_type, path_prefix)`` is broadcast.
    """
    r = F.broadcast(
        rules.select(
            F.col("host").alias("r_host"),
            (F.col("rule_type") == "allow").alias("r_allow"),
            F.col("path_prefix").alias("r_prefix"),
        )
    )
    joined = candidates.join(
        r,
        (candidates["host"] == r["r_host"])
        & candidates["path"].startswith(r["r_prefix"]),
        "left",
    )
    # verdict per url: among matching rules take the longest prefix;
    # allow wins length ties (sort by (len, is_allow) and take max)
    verdict = joined.groupBy(*[F.col(c) for c in candidates.columns]).agg(
        F.max(
            F.when(
                F.col("r_prefix").isNotNull(),
                F.struct(
                    F.length("r_prefix").alias("ln"),
                    F.col("r_allow").alias("allow"),
                ),
            )
        ).alias("best")
    )
    return verdict.filter(
        F.col("best").isNull() | F.col("best.allow")
    ).drop("best")
