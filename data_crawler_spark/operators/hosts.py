"""Host/domain reputation statistics and leakage-free splitting.

Web-corpus curation makes KEEP/DROP and budget decisions at the site
level, not the page level: a domain whose pages are 90% mutual
duplicates or uniformly low-quality is down-weighted or blocklisted
wholesale (the CCNet/RefinedWeb playbook), and train/val/test splits
must cut along site boundaries or near-duplicate pages leak across
the split and inflate eval. Both want one thing: per-domain
aggregates over the extracted corpus.

Scale shape: everything reduces through ONE hash exchange on the
domain key with map-side partials — the mode(lang) and the exact
unique-page count use Spark's native partial aggregation; the content
fingerprint is 8 bytes so the wide text column never rides the
shuffle. At 10^8 registrable domains the output is comfortably a
broadcastable dimension for gating joins back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.links import registered_domain_col
from data_crawler_spark.operators.sampling import hash_split
from data_crawler_spark.operators.text import (
    quality_score_col,
    token_count_col,
)

__all__ = ["host_stats", "domain_split", "reputation_filter",
           "mirror_candidates"]


def host_stats(df: DataFrame, url_col: str = "url",
               text_col: str = "text",
               lang_col: str | None = "lang") -> DataFrame:
    """Corpus -> one row per registrable domain:
    ``(domain, n_pages, n_unique, dup_ratio, mean_quality,
    mean_tokens, top_lang)``.

    n_unique counts distinct content fingerprints (xxhash64 of text;
    intra-domain boilerplate shows up as dup_ratio -> 1), top_lang is
    the modal language (ties broken deterministically low), quality is
    the engine's native quality_score_col. One exchange; all partials
    map-side."""
    lang = (F.col(lang_col) if lang_col and lang_col in df.columns
            else F.lit(None).cast("string"))
    rows = df.select(
        registered_domain_col(F.col(url_col)).alias("domain"),
        F.xxhash64(text_col).alias("_fp"),
        quality_score_col(F.col(text_col)).alias("_q"),
        token_count_col(F.col(text_col)).alias("_tok"),
        lang.alias("_lang"),
    )
    return (
        rows.groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("_fp").alias("n_unique"),
            F.avg("_q").alias("mean_quality"),
            F.avg("_tok").alias("mean_tokens"),
            F.mode("_lang", True).alias("top_lang"),
        )
        .withColumn(
            "dup_ratio",
            F.lit(1.0) - F.col("n_unique") / F.col("n_pages"))
        .select("domain", "n_pages", "n_unique", "dup_ratio",
                "mean_quality", "mean_tokens", "top_lang")
    )


def reputation_filter(df: DataFrame, stats: DataFrame,
                      url_col: str = "url",
                      max_dup_ratio: float = 0.9,
                      min_mean_quality: float = 0.0) -> DataFrame:
    """Drop every page of domains failing the reputation gates. The
    stats side is the small one — broadcast, no corpus shuffle."""
    bad = (stats.where((F.col("dup_ratio") > max_dup_ratio)
                       | (F.col("mean_quality") < min_mean_quality))
           .select("domain"))
    dom = registered_domain_col(F.col(url_col)).alias("_dom")
    return (df.withColumn("_dom", dom)
            .join(F.broadcast(bad), F.col("_dom") == bad["domain"],
                  "left_anti")
            .drop("_dom"))


def domain_split(df: DataFrame, url_col: str = "url",
                 fractions: dict[str, float] | None = None,
                 seed: int = 1) -> DataFrame:
    """Leakage-free train/val/test split: the split key is the
    REGISTRABLE DOMAIN, so every page (and every near-duplicate) of a
    site lands on the same side — pure map over hash_split, no
    shuffle, stable across reruns and cluster sizes."""
    tagged = df.withColumn(
        "_dom", registered_domain_col(F.col(url_col)))
    return hash_split(tagged, id_col="_dom", fractions=fractions,
                      seed=seed).drop("_dom")


def mirror_candidates(df: DataFrame, url_col: str = "url",
                      text_col: str | None = None,
                      min_shared: int = 10,
                      min_overlap: float = 0.5,
                      max_feature_df: int = 50) -> DataFrame:
    """Mirror-host detection (Bharat & Broder, WWW 1999; Bharat et al.
    TOIS 2000): hosts serving the same content under the same paths.
    A crawler that recognizes mirrors skips entire hosts — at mirror
    rates the mirror studies measured (~10% of popular-site crawl
    volume), that is a host-level dedup lever the page-level near-dup
    pass only pays for AFTER fetching.

    Features are per-page path fingerprints — ``xxhash64(path)``, or
    ``xxhash64(path, xxhash64(text))`` when ``text_col`` is given
    (content-aware mode: same software layout with different content
    no longer matches). Hosts are candidate mirrors when they share
    ``>= min_shared`` features and the overlap — shared divided by the
    SMALLER host's feature count, the containment form, so a complete
    mirror of a site's subtree still scores 1.0 — is
    ``>= min_overlap``. Features present on more than
    ``max_feature_df`` hosts are dropped first: ubiquitous paths
    (``/``, ``/index.html``, ``/robots.txt``) carry no mirror signal
    and would otherwise explode quadratically (the papers drop
    high-document-frequency features for exactly both reasons).

    Scale shape: after the df-cap, one feature yields at most
    ``max_feature_df²/2`` pairs, so the self-join is bounded per key —
    no skew salting needed by construction; every aggregate is
    map-side-partial over 16-24-byte rows, page text never rides any
    shuffle (it folds to 8 bytes in the scan), and the host-size side
    of the final join is O(hosts) (AQE broadcasts it). Returns
    ``(host_a, host_b, shared, n_a, n_b, overlap)`` with
    ``host_a < host_b``.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    if max_feature_df < 2:
        raise ValueError(
            f"max_feature_df must be >= 2, got {max_feature_df}")
    from data_crawler_spark.operators.links import host_col, path_col

    u = F.col(url_col)
    fp = (F.xxhash64(path_col(u), F.xxhash64(F.col(text_col)))
          if text_col else F.xxhash64(path_col(u)))
    feats = (df.select(host_col(u).alias("host"), fp.alias("fp"))
             .filter(F.col("host") != "")
             .distinct())

    rare = (feats.groupBy("fp")
            .agg(F.count("*").alias("hosts_with"))
            .filter(F.col("hosts_with") <= max_feature_df)
            .select("fp"))
    kept = feats.join(rare, "fp")
    # sizes count the KEPT features — the vectors actually compared;
    # a df-capped ubiquitous path must not dilute the overlap either
    sizes = kept.groupBy("host").agg(F.count("*").alias("n"))

    a = kept.select("fp", F.col("host").alias("host_a"))
    b = kept.select("fp", F.col("host").alias("host_b"))
    pairs = (a.join(b, "fp")
             .filter(F.col("host_a") < F.col("host_b"))
             .groupBy("host_a", "host_b")
             .agg(F.count("*").alias("shared")))

    sa = sizes.select(F.col("host").alias("host_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"),
                      F.col("n").alias("n_b"))
    return (pairs.join(sa, "host_a").join(sb, "host_b")
            .withColumn("overlap",
                        F.col("shared") / F.least("n_a", "n_b"))
            .filter((F.col("shared") >= min_shared)
                    & (F.col("overlap") >= min_overlap))
            .select("host_a", "host_b", "shared", "n_a", "n_b",
                    "overlap"))
