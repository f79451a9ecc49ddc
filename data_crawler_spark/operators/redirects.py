"""Redirect-chain resolution — pointer jumping over the redirect map.

A crawl at scale accumulates a large (url -> redirect_to) map (3xx
responses, <meta refresh>, rel=canonical). Downstream everything —
dedup keys, the link graph, anchor targets, the frontier itself —
wants each URL rewritten to its FINAL destination, which means
following chains (a -> b -> c) and refusing cycles. A naive
follow-one-hop-per-iteration loop needs O(longest chain) joins; this
operator pointer-jumps (final <- final(final), the same doubling trick
as connected_components, dedup.py:763), so a chain of length d
resolves in O(log d) self-joins. Common Crawl's redirect chains are
overwhelmingly short (1-3 hops) with a long tail — max_iter=20 covers
chains of 2^20 hops.

Cycle handling: rows whose chain never leaves the redirect map
(self-redirects, 2-cycles, chains INTO a cycle) are flagged
``cyclic=true`` at loop end — their final_url is whatever vertex the
jump landed on and their hop count is undefined; callers drop or
quarantine them (a crawler treats a redirect cycle as a dead URL).

Scale shape: each iteration is one equi-join of the still-live map
against itself keyed on final_url — hash exchange both sides, AQE
sizes it; the frame halves its live set every iteration.
localCheckpoint per iteration cuts the exponentially-growing lineage
(the established idiom for this repo's iterative operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects", "apply_redirects",
           "host_fold_rules", "apply_host_folds"]


def resolve_redirects(redirects: DataFrame, url_col: str = "url",
                      target_col: str = "redirect_to",
                      max_iter: int = 20) -> DataFrame:
    """(url, redirect_to) -> (url, final_url, hops, cyclic).

    ``hops`` is the exact chain length for non-cyclic rows (pointer
    jumping sums the two halves' hop counts, so exactness survives the
    doubling); undefined for cyclic rows. Input must be a MAP — one
    row per redirecting url (duplicate sources would multiply rows
    through the self-join); enforce upstream with pick-latest-per-key
    (op 23) if captures disagree over time."""
    cur = (redirects.select(
        F.col(url_col).alias("url"),
        F.col(target_col).alias("final_url"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint())

    for _ in range(max_iter):
        m = cur.select(F.col("url").alias("m_url"),
                       F.col("final_url").alias("m_final"),
                       F.col("hops").alias("m_hops"))
        nxt = (cur.join(m, cur["final_url"] == m["m_url"], "left")
               .select(
                   "url",
                   F.coalesce("m_final", "final_url").alias("final_url"),
                   (F.col("hops") + F.coalesce("m_hops", F.lit(0)))
                   .alias("hops"),
                   F.col("m_url").isNotNull().alias("_hit"),
               ).localCheckpoint())
        n_hit = nxt.where("_hit").count()
        cur = nxt.drop("_hit")
        if n_hit == 0:
            # no row's final is a redirect source: fully resolved,
            # and therefore no cycles exist either
            return cur.withColumn("cyclic", F.lit(False))

    # rows still pointing INTO the map after 2^max_iter-deep jumps
    # are on/into a cycle
    keys = cur.select(F.col("url").alias("m_url"))
    return (cur.join(keys, cur["final_url"] == keys["m_url"], "left")
            .select("url", "final_url", "hops",
                    F.col("m_url").isNotNull().alias("cyclic")))


def apply_redirects(df: DataFrame, resolved: DataFrame,
                    url_col: str = "url") -> DataFrame:
    """Rewrite ``url_col`` through the resolved map: redirecting URLs
    become their final_url, cyclic ones are DROPPED (dead URLs),
    non-redirecting URLs pass through. One left join on the url."""
    m = resolved.select(F.col("url").alias("_r_url"), "final_url",
                        "cyclic")
    return (df.join(m, df[url_col] == m["_r_url"], "left")
            .where(~F.coalesce("cyclic", F.lit(False)))
            .withColumn(url_col, F.coalesce("final_url", F.col(url_col)))
            .drop("_r_url", "final_url", "cyclic"))


def host_fold_rules(resolved: DataFrame, url_col: str = "url",
                    final_col: str = "final_url",
                    min_support: int = 3, min_frac: float = 0.9,
                    min_path_frac: float = 0.9) -> DataFrame:
    """Mine host-level canonicalization folds from resolved redirects —
    the site-wide aliases (www.a.com -> a.com, http -> https, old
    domain -> new domain) that a crawler should rewrite in the
    FRONTIER, before fetch, instead of paying one redirect round-trip
    per URL forever. Returns ``(src_host, dst_scheme, dst_host,
    support, dominance, path_frac)``.

    Evidence bar, per source ORIGIN (scheme + authority incl. port,
    so an http->https fold on one host is mineable): the dominant
    (scheme, host) destination must carry ≥ ``min_support`` redirects
    and ≥ ``min_frac`` of the origin's total, and ≥ ``min_path_frac``
    of its redirects must PRESERVE path+query — the alias signature.
    The path test is what keeps parked/soft-404 hosts (everything ->
    /landing) from folding: those rewrite paths, aliases don't.

    Shape: native expressions over the resolved map, two map-side-
    partial groupBys ((src, dst) then src) — O(redirecting hosts)
    output, broadcastable by construction."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    from data_crawler_spark.operators.links import (after_authority_col,
                                                    host_col, scheme_col)

    rest, scheme = after_authority_col, scheme_col
    src, dst = F.col(url_col), F.col(final_col)
    ev = (resolved
          .filter(~F.coalesce(F.col("cyclic"), F.lit(False)))
          .select(
              scheme(src).alias("src_scheme"),
              host_col(src).alias("src_host"),
              scheme(dst).alias("dst_scheme"),
              host_col(dst).alias("dst_host"),
              (rest(src) == rest(dst)).cast("long").alias("kept_path")))
    pairs = (ev.groupBy("src_scheme", "src_host", "dst_scheme", "dst_host")
             .agg(F.count("*").alias("cnt"),
                  F.sum("kept_path").alias("path_cnt")))
    picked = (pairs.groupBy("src_scheme", "src_host")
              .agg(F.sum("cnt").alias("total"),
                   F.max_by(
                       F.struct("dst_scheme", "dst_host", "cnt",
                                "path_cnt"),
                       F.struct(F.col("cnt"), F.col("path_cnt"),
                                F.col("dst_scheme"), F.col("dst_host")))
                   .alias("d")))
    out = picked.select(
        "src_scheme", "src_host",
        F.col("d.dst_scheme").alias("dst_scheme"),
        F.col("d.dst_host").alias("dst_host"),
        F.col("d.cnt").alias("support"),
        (F.col("d.cnt") / F.col("total")).alias("dominance"),
        (F.col("d.path_cnt") / F.col("d.cnt")).alias("path_frac"))
    return out.filter(
        ((F.col("src_host") != F.col("dst_host"))
         | (F.col("src_scheme") != F.col("dst_scheme")))
        & (F.col("support") >= min_support)
        & (F.col("dominance") >= min_frac)
        & (F.col("path_frac") >= min_path_frac))


def apply_host_folds(df: DataFrame, rules: DataFrame,
                     url_col: str = "url") -> DataFrame:
    """Rewrite ``url_col`` through the mined host folds: scheme and
    authority replaced, path+query kept byte-for-byte. One broadcast
    join on the url's (scheme, host) origin (the rule table is
    O(origins)); unmatched URLs pass through untouched."""
    from data_crawler_spark.operators.links import (after_authority_col,
                                                    host_col, scheme_col)

    # join-private prefixes: a caller frame may legitimately carry
    # dst_scheme/dst_host columns of its own
    r = rules.select(F.col("src_scheme").alias("_fs"),
                     F.col("src_host").alias("_fh"),
                     F.col("dst_scheme").alias("_fds"),
                     F.col("dst_host").alias("_fdh"))
    u = F.col(url_col)
    joined = df.join(F.broadcast(r),
                     (host_col(u) == F.col("_fh"))
                     & (scheme_col(u) == F.col("_fs")), "left")
    folded = F.concat(F.col("_fds"), F.lit("://"), F.col("_fdh"),
                      after_authority_col(u))
    return (joined
            .withColumn(url_col,
                        F.when(F.col("_fh").isNull(), u).otherwise(folded))
            .drop("_fs", "_fh", "_fds", "_fdh"))
