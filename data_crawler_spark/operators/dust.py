"""DUST — Different URLs with Similar Text (Bar-Yossef et al. 2009,
"Do Not Crawl in the DUST") — mining URL-rewrite rules from crawl
evidence, the crawler-side complement to rel=canonical dedup
(structured.canonical_dedup): sites that spray session ids, tracking
params, or sort toggles into their links multiply every page into
dozens of frontier entries; a learned "this query param never changes
the content on this host" rule collapses them BEFORE fetch, where the
saving is bandwidth and politeness budget, not just storage.

Reference semantics (SURVEY.md §0 driver contract; the reference
snapshot at /root/reference contains no source — this follows the
published DUST family instead): rules are mined per (host, param) from
capture evidence and must be supported by multiple independent witness
groups before they fire.

Evidence model, kept deliberately conservative:

* a WITNESS GROUP for (host, param) is a set of captures whose URLs
  are identical after removing every occurrence of ``param`` from the
  query (same host, path, and remaining query) but carried ≥2 distinct
  serializations of ``param`` — i.e. the param value really varied
  while everything else stayed fixed;
* a group is POSITIVE evidence when all its captures share one content
  hash (the param didn't matter) and a CONFLICT when hashes differ;
* ``(host, param)`` becomes a rule when positive groups ≥
  ``min_support`` and conflicts ≤ ``max_conflict_frac`` of all
  informative groups. Conflicts are counted, not silently dropped —
  a param like ``page=`` produces conflict groups and never fires.

Distributed shape: everything is native column work (split /
higher-order filter / array_join) over the capture scan; the only
shuffles are the two map-side-partial groupBys on (host, param,
residual) then (host, param) — rows are slim (url-sized strings,
hashes), the corpus text never moves. ``apply_param_rules`` is a
broadcast join on host (the rule table is O(hosts × params), tiny by
construction) followed by a pure map rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.links import (host_col, path_col,
                                                scheme_col)


def _params_col(url: Column) -> Column:
    """query string -> array of raw 'k=v' / bare 'k' segments (empty
    segments from '&&' or a trailing '&' dropped, order preserved)."""
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return F.filter(F.split(query, "&"), lambda s: s != "")


def _key_of(seg: Column) -> Column:
    return F.substring_index(seg, "=", 1)


def mine_param_rules(captures: DataFrame, url_col: str = "url",
                     hash_col: str = "content_hash",
                     min_support: int = 2,
                     max_conflict_frac: float = 0.0) -> DataFrame:
    """Mine ``(host, param)`` strip-rules from ``(url, content_hash)``
    capture evidence. Returns ``(host, param, support, conflicts)``
    sorted nowhere — callers order as needed. ``content_hash`` is any
    stable digest of the EXTRACTED text (pagestore's xxhash64
    convention), so ad rotation in raw HTML doesn't poison evidence.

    Input URLs should be canonicalized (functions/canonicalize) so the
    residual grouping isn't split by byte-noise the canonicalizer
    already folds."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if not 0.0 <= max_conflict_frac < 1.0:
        raise ValueError(
            f"max_conflict_frac must be in [0, 1), got {max_conflict_frac}")
    u = F.col(url_col)
    base = captures.select(
        host_col(u).alias("host"),
        # scheme rides the residual: http and https captures of one
        # path are different resources — conflating them could mint a
        # rule from cross-scheme accidents
        F.concat(scheme_col(u), F.lit(":"), path_col(u)).alias("path"),
        _params_col(u).alias("params"),
        F.col(hash_col).alias("h"))
    with_key = (base
                .filter(F.size("params") > 0)
                .select("host", "path", "params", "h",
                        F.explode(F.array_distinct(
                            F.transform("params", _key_of)))
                        .alias("param")))
    key = F.col("param")
    # the url with every occurrence of `param` removed, and the removed
    # occurrences themselves (serialized sorted so 'a=1&a=2' == 'a=2&a=1')
    others = F.filter("params", lambda s: _key_of(s) != key)
    mine = F.filter("params", lambda s: _key_of(s) == key)
    ev = with_key.select(
        "host", "param", "h",
        F.concat(F.col("path"), F.lit("?"),
                 F.array_join(F.array_sort(others), "&")).alias("residual"),
        F.array_join(F.array_sort(mine), "&").alias("val"))
    # "value varied" / "hash uniform" are min==max questions, not
    # counts: min/max partial-aggregate map-side, where countDistinct
    # would Expand the evidence stream ×2 and add a third exchange
    groups = (ev.groupBy("host", "param", "residual")
              .agg((F.min("val") != F.max("val")).alias("vals_varied"),
                   (F.min("h") == F.max("h")).alias("hash_uniform"))
              .filter(F.col("vals_varied")))    # value actually varied
    tallies = (groups.groupBy("host", "param")
               .agg(F.sum(F.when(F.col("hash_uniform"), 1).otherwise(0))
                    .alias("support"),
                    F.sum(F.when(~F.col("hash_uniform"), 1).otherwise(0))
                    .alias("conflicts")))
    total = F.col("support") + F.col("conflicts")
    return tallies.filter(
        (F.col("support") >= min_support)
        & (F.col("conflicts") <= F.lit(max_conflict_frac) * total))


def apply_param_rules(df: DataFrame, rules: DataFrame,
                      url_col: str = "url",
                      out_col: str | None = None) -> DataFrame:
    """Rewrite ``url_col`` by stripping each host's mined-irrelevant
    params (in place unless ``out_col``). One broadcast join on host —
    the rule table is tiny by construction — then a pure map: filter
    the param segments, re-join, drop a now-empty '?'. URLs whose host
    has no rules (or with no query) pass through byte-identical."""
    out_col = out_col or url_col
    host_rules = (rules.groupBy(F.col("host").alias("_rhost"))
                  .agg(F.collect_set("param").alias("_drop")))
    u = F.col(url_col)
    joined = df.join(F.broadcast(host_rules),
                     host_col(u) == F.col("_rhost"), "left")
    kept = F.filter(_params_col(u),
                    lambda s: ~F.array_contains(F.col("_drop"), _key_of(s)))
    stem = F.regexp_extract(u, r"^([^?#]*)", 1)
    rewritten = F.when(
        F.size(kept) > 0,
        F.concat(stem, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(stem)
    new_url = F.when(F.col("_drop").isNull(), u).otherwise(rewritten)
    return (joined
            .withColumn(out_col, new_url)
            .drop("_rhost", "_drop"))
