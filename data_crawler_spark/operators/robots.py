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
    array<struct<prefix,allow,wild,pattern>> — the broadcastable
    per-host dictionary. RFC 9309 §2.2.3 wildcards are honored: a
    rule whose path carries ``*`` (any chars) or a trailing ``$``
    (end anchor; mid-rule ``$`` is literal) gets a precomputed
    anchored Java-regex ``pattern`` (metachars escaped natively —
    this stays a zero-Python build); wildcard-free rules (``wild``
    false) keep the plain prefix byte-match, so prefix-only rulesets
    gate exactly as before."""
    p = F.col("path_prefix")
    anchored = p.endswith("$")
    body = F.when(anchored, F.expr(
        "substring(path_prefix, 1, length(path_prefix) - 1)")).otherwise(p)
    esc = F.regexp_replace(body, r"([\\.\[\]{}()+?^$|])", r"\\$1")
    pattern = F.concat(
        F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    wild = p.contains("*") | anchored
    return rules.groupBy(F.col("host").alias("r_host")).agg(
        F.collect_list(
            F.struct(
                p.alias("prefix"),
                (F.col("rule_type") == "allow").alias("allow"),
                wild.alias("wild"),
                pattern.alias("pattern"),
            )
        ).alias("r_rules")
    )


def robots_gate(candidates: DataFrame, rules: DataFrame) -> DataFrame:
    """Filter ``candidates`` (must carry url, host, path) to robots-allowed.

    Verdict per url: among rules matching the path (prefix byte-match
    for plain rules, the precomputed anchored regex for RFC 9309
    ``*``/``$`` wildcard rules), take the most specific — longest
    original rule text, the published tie metric; allow wins length
    ties (max over struct(len, allow) — Spark orders structs
    lexicographically and true > false). No matching rule (or no rules
    row for the host) => allowed.
    """
    hr = F.broadcast(host_rules_df(rules))
    joined = candidates.join(hr, candidates["host"] == hr["r_host"], "left")
    matching = F.filter(
        "r_rules",
        lambda r: F.when(r["wild"],
                         F.regexp_like(F.col("path"), r["pattern"]))
                   .otherwise(F.col("path").startswith(r["prefix"])))
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


def parse_robots_txt(robots: DataFrame, host_col: str = "host",
                     text_col: str = "robots_txt",
                     user_agent: str = "*") -> DataFrame:
    """Parse RAW robots.txt text into the ``rules(host, rule_type,
    path_prefix)`` frame ``robots_gate`` consumes — the seam between a
    fetched per-host robots.txt page table and the gating join.

    REP subset implemented (the part robots_gate evaluates):
    consecutive ``User-agent:`` lines form a group; ``Allow:`` /
    ``Disallow:`` directives bind to the CURRENT group (matched
    case-insensitively against ``user_agent``, exact token — ``*`` by
    default, our crawler's agent); RFC 9309 group selection — if ANY
    group names the specific agent, only those groups apply (even if
    they carry no rules: an empty matching group means allow-all);
    otherwise the ``*`` groups apply; ``#`` comments strip to end of
    line; directives with an empty value record no rule (an empty
    Disallow means allow-all per REP — absence of a rule IS allowed in
    robots_gate's verdict); unknown directives (Crawl-delay, Sitemap)
    are skipped but still terminate a user-agent run, exactly like the
    reference parsers.

    All doc-local native expressions: one ``F.aggregate`` fold over the
    split lines carrying struct state (specific/star group-applies,
    ua-run, saw-specific, both rule lists), then one explode —
    O(lines) per host inside codegen, no Python, and the output is the
    O(hosts)-row frame the gate broadcasts."""
    empty_rules = F.expr(
        "CAST(array() AS array<struct<prefix:string,allow:boolean>>)")
    init = F.struct(F.lit(False).alias("ap_s"), F.lit(False).alias("ap_g"),
                    F.lit(False).alias("ua_run"),
                    F.lit(False).alias("saw_s"),
                    empty_rules.alias("rules_s"),
                    empty_rules.alias("rules_g"))
    ua = F.lit(user_agent.lower())

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*", ""))
        low = F.lower(line)
        val = F.trim(F.regexp_replace(line, r"^[A-Za-z-]+\s*:\s*", ""))
        is_ua = low.rlike(r"^user-agent\s*:")
        is_allow = low.rlike(r"^allow\s*:")
        is_dis = low.rlike(r"^disallow\s*:")
        is_blank = F.length(line) == 0
        hit_s = F.lower(val) == ua
        hit_g = val == "*"

        def applies(prev, hit):
            return (F.when(is_ua,
                           F.when(acc["ua_run"], prev | hit).otherwise(hit))
                    .otherwise(prev))

        ap_s = applies(acc["ap_s"], hit_s)
        ap_g = applies(acc["ap_g"], hit_g)
        is_rule = (is_allow | is_dis) & (F.length(val) > 0)
        entry = F.array(F.struct(val.alias("prefix"),
                                 is_allow.alias("allow")))

        def grow(prev, ap):
            return F.when(is_rule & ap,
                          F.concat(prev, entry)).otherwise(prev)

        # blank lines leave the run state alone (REP: groups end at the
        # next User-agent line, not at blank lines)
        ua_run = F.when(is_blank, acc["ua_run"]).otherwise(is_ua)
        return F.struct(
            ap_s.alias("ap_s"), ap_g.alias("ap_g"), ua_run.alias("ua_run"),
            (acc["saw_s"] | (is_ua & hit_s)).alias("saw_s"),
            grow(acc["rules_s"], acc["ap_s"]).alias("rules_s"),
            grow(acc["rules_g"], acc["ap_g"]).alias("rules_g"))

    parsed = F.aggregate(
        F.split(F.col(text_col), "\r?\n"), init, step,
        lambda acc: F.when(acc["saw_s"], acc["rules_s"])
        .otherwise(acc["rules_g"]))
    return (robots.select(F.col(host_col).alias("host"),
                          F.explode(parsed).alias("r"))
            .select("host",
                    F.when(F.col("r.allow"), F.lit("allow"))
                    .otherwise(F.lit("disallow")).alias("rule_type"),
                    F.col("r.prefix").alias("path_prefix")))


def parse_sitemap_directives(robots: DataFrame, host_col: str = "host",
                             text_col: str = "robots_txt") -> DataFrame:
    """Extract ``Sitemap:`` directive URLs from per-host robots.txt
    text -> ``(host, sitemap_url)`` — the discovery seam that chains
    robots fetching into the sitemap seed source (links.sitemap_urls
    parses the fetched files). Per the sitemaps protocol the directive
    is GLOBAL (not user-agent-group scoped), so this is a pure
    split + explode + regexp filter — no group fold, zero Exchange,
    zero Python. URLs are canonicalized with the frontier's own
    canonicalize_col and non-http(s) values drop; one row per
    directive, duplicates preserved (callers distinct() when seeding)."""
    from data_crawler_spark.operators.links import (canonicalize_col,
                                                    is_http_col)
    line = F.explode(F.split(F.col(text_col), "\r?\n")).alias("line")
    src = robots.select(F.col(host_col).alias("host"), line)
    stripped = F.trim(F.regexp_replace(F.col("line"), "#.*", ""))
    raw = F.trim(F.regexp_replace(stripped, r"(?i)^sitemap\s*:\s*", ""))
    return (src.where(F.lower(stripped).rlike(r"^sitemap\s*:"))
            .select("host", canonicalize_col(raw).alias("sitemap_url"))
            .where(is_http_col(F.col("sitemap_url"))))


def parse_crawl_delay(robots: DataFrame, host_col: str = "host",
                      text_col: str = "robots_txt",
                      user_agent: str = "*") -> DataFrame:
    """Extract the ``Crawl-delay`` (seconds, double) each host asks of
    ``user_agent`` — the politeness seam: feed the result into the
    hosts table's ``crawl_delay`` column. Same RFC 9309 group
    selection as parse_robots_txt (specific group wins, even empty;
    else the ``*`` group); the LAST delay in the selected groups wins
    (later directives override); hosts asking nothing emit no row.
    Same single F.aggregate fold, zero Exchange / zero Python."""
    init = F.struct(F.lit(False).alias("ap_s"), F.lit(False).alias("ap_g"),
                    F.lit(False).alias("ua_run"),
                    F.lit(False).alias("saw_s"),
                    F.lit(None).cast("double").alias("delay_s"),
                    F.lit(None).cast("double").alias("delay_g"))
    ua = F.lit(user_agent.lower())

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*", ""))
        low = F.lower(line)
        val = F.trim(F.regexp_replace(line, r"^[A-Za-z-]+\s*:\s*", ""))
        is_ua = low.rlike(r"^user-agent\s*:")
        is_delay = low.rlike(r"^crawl-delay\s*:")
        is_blank = F.length(line) == 0
        hit_s = F.lower(val) == ua
        hit_g = val == "*"

        def applies(prev, hit):
            return (F.when(is_ua,
                           F.when(acc["ua_run"], prev | hit).otherwise(hit))
                    .otherwise(prev))

        # try_cast: ANSI mode throws on a malformed delay ("soon")
        num = F.when(is_delay, val.try_cast("double"))

        def delay(prev, ap):
            return F.when(is_delay & ap & num.isNotNull(),
                          num).otherwise(prev)

        ua_run = F.when(is_blank, acc["ua_run"]).otherwise(is_ua)
        return F.struct(
            applies(acc["ap_s"], hit_s).alias("ap_s"),
            applies(acc["ap_g"], hit_g).alias("ap_g"),
            ua_run.alias("ua_run"),
            (acc["saw_s"] | (is_ua & hit_s)).alias("saw_s"),
            delay(acc["delay_s"], acc["ap_s"]).alias("delay_s"),
            delay(acc["delay_g"], acc["ap_g"]).alias("delay_g"))

    delay = F.aggregate(
        F.split(F.col(text_col), "\r?\n"), init, step,
        lambda acc: F.when(acc["saw_s"], acc["delay_s"])
        .otherwise(acc["delay_g"]))
    return (robots.select(F.col(host_col).alias("host"),
                          delay.alias("crawl_delay"))
            .filter(F.col("crawl_delay").isNotNull()))


def apply_crawl_delay(hosts: DataFrame, delays: DataFrame,
                      round_seconds: float = 60.0) -> DataFrame:
    """Fold per-host ``Crawl-delay`` (parse_crawl_delay's output) into
    the hosts table's ``budget_per_round``: a host asking d seconds
    between fetches gets at most floor(round_seconds / d) fetches in a
    politeness round. The delay only ever REDUCES a host's budget
    (least with the existing value — robots.txt can't grant more than
    the crawl's own allocation); a delay longer than the round floors
    at 1 fetch/round (the coarsest politeness a round-granular
    scheduler can express — stretching delays across rounds would need
    per-host round skipping, which the round loop does not model).
    Broadcast join: delays is one row per opting-in host, dimension-
    sized next to the frontier."""
    if round_seconds <= 0:
        raise ValueError(f"round_seconds must be > 0, got {round_seconds}")
    # private join name: the engine's hosts table carries its OWN
    # crawl_delay column (sources/web.py) which must pass through
    # untouched
    d = F.broadcast(delays.select(
        "host", F.col("crawl_delay").alias("_robots_delay")))
    allowed = F.greatest(
        F.floor(F.lit(float(round_seconds)) / F.col("_robots_delay")),
        F.lit(1)).cast("long")
    newb = F.when(
        F.col("_robots_delay").isNotNull() & (F.col("_robots_delay") > 0),
        F.least(F.col("budget_per_round").cast("long"), allowed)
    ).otherwise(F.col("budget_per_round"))
    return (hosts.join(d, "host", "left")
            .withColumn("budget_per_round", newb)
            .drop("_robots_delay"))


def robots_refresh_candidates(captures: DataFrame, now,
                              ttl_hours: float = 24.0,
                              host_col: str = "host",
                              fetched_at_col: str = "fetched_at") -> DataFrame:
    """Hosts whose robots.txt capture is past its cache lifetime —
    (host, last_fetch, age_hours) for every host whose LATEST robots
    fetch is older than ``ttl_hours`` at ``now``. RFC 9309 §2.4 allows
    caching robots.txt up to 24 hours (the standard crawler default);
    gating rounds against rules older than that risks fetching pages a
    publisher has since disallowed. Feed the output into the fetch
    scheduler as /robots.txt seed URLs ahead of the host's page budget.

    One map-side-partial max per host over the (host, ts) projection —
    O(hosts) output, the capture text never reads."""
    if ttl_hours <= 0:
        raise ValueError(f"ttl_hours must be > 0, got {ttl_hours}")
    now_ts = F.lit(now).cast("timestamp")
    latest = (captures.groupBy(F.col(host_col).alias("host"))
              .agg(F.max(F.col(fetched_at_col).cast("timestamp"))
                   .alias("last_fetch")))
    age_h = (now_ts.cast("double") - F.col("last_fetch").cast("double")) / 3600.0
    return (latest.select("host", "last_fetch",
                          F.round(age_h, 6).alias("age_hours"))
            .where(F.col("age_hours") > ttl_hours))
