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

__all__ = ["host_stats", "domain_split", "reputation_filter"]


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
