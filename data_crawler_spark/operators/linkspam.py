"""Link-spam signals — per-domain outlink structure statistics.

Link farms and SEO spam have a structural signature long before any
content model sees them: abnormal out-degree, links pointing almost
exclusively off-site, a tiny set of target domains repeated across
every page, and near-zero anchor-text diversity. These are the
classic features behind TrustRank-style demotion; a corpus pipeline
computes them per REGISTRABLE DOMAIN and feeds the result to the same
reputation gate as host_stats (operators/hosts.py).

Scale shape: one explode over the already-extracted outlink arrays
(no html), domain reduction in native expressions, then ONE exchange
on (src_domain, dst_domain) for the skew-breaking pre-count — the
same pattern as anchor_summary: a spam domain with 10^8 outlinks
collapses to its distinct target domains before any per-domain fold —
followed by the per-domain aggregate on the pre-counted rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.links import (
    canonicalize_col,
    is_http_col,
    registered_domain_col,
    resolve_href_col,
)

__all__ = ["domain_link_signals"]


def domain_link_signals(pages: DataFrame, url_col: str = "url",
                        links_col: str = "links") -> DataFrame:
    """Pages with an extracted outlink array -> one row per source
    domain:

    - n_pages, n_outlinks, outlinks_per_page
    - external_ratio: fraction of outlinks leaving the domain
    - n_dst_domains: distinct external target domains
    - top_dst_share: fraction of EXTERNAL outlinks going to the
      single most-linked target domain (1.0 = every external link
      points at one place — the link-farm tell)

    Page counts include linkless pages (they dilute
    outlinks_per_page, deliberately)."""
    src_dom = registered_domain_col(F.col(url_col)).alias("src_domain")

    pages_per = (pages.select(src_dom)
                 .groupBy("src_domain")
                 .agg(F.count("*").alias("n_pages")))

    resolved = canonicalize_col(
        resolve_href_col(F.col("_u"), F.col("_href")))
    edges = (
        pages.select(src_dom, F.col(url_col).alias("_u"),
                     F.explode(F.col(links_col)).alias("_href"))
        .select("src_domain", resolved.alias("_dst"))
        # mailto:/javascript:/fragment junk is not an outlink
        .where(is_http_col(F.col("_dst")))
        .select("src_domain",
                registered_domain_col(F.col("_dst")).alias("dst_domain"))
    )
    # skew pre-count: (src, dst) pairs first
    pair = edges.groupBy("src_domain", "dst_domain").agg(
        F.count("*").alias("cnt"))
    ext = F.col("dst_domain") != F.col("src_domain")
    per_src = pair.groupBy("src_domain").agg(
        F.sum("cnt").alias("n_outlinks"),
        F.sum(F.when(ext, F.col("cnt")).otherwise(0)).alias("_n_ext"),
        F.count(F.when(ext, True)).alias("n_dst_domains"),
        F.max(F.when(ext, F.col("cnt")).otherwise(0)).alias("_max_ext"),
    )
    return (
        pages_per.join(per_src, "src_domain", "left")
        .select(
            "src_domain",
            "n_pages",
            F.coalesce("n_outlinks", F.lit(0)).alias("n_outlinks"),
            (F.coalesce("n_outlinks", F.lit(0)) / F.col("n_pages"))
            .alias("outlinks_per_page"),
            F.when(F.coalesce("n_outlinks", F.lit(0)) > 0,
                   F.col("_n_ext") / F.col("n_outlinks"))
            .otherwise(F.lit(0.0)).alias("external_ratio"),
            F.coalesce("n_dst_domains", F.lit(0)).alias("n_dst_domains"),
            F.when(F.coalesce("_n_ext", F.lit(0)) > 0,
                   F.col("_max_ext") / F.col("_n_ext"))
            .otherwise(F.lit(0.0)).alias("top_dst_share"),
        )
    )
