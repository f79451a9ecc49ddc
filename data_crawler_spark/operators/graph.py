"""Link-graph analytics: PageRank over the crawl's (src, dst) edge
list — the classic frontier-prioritization signal (Page et al. 1998;
Cho/Garcia-Molina's crawl-ordering studies showed PageRank-ordered
crawling reaches important pages first). The output feeds straight
into the scheduler: ``rank`` is exactly the ``priority`` column
``schedule_per_host`` / ``with_crawl_seq`` order by.

Spec (mirrored by the pure-Python reference in tests/test_graph.py):
node set = distinct(src ∪ dst) over the DEDUPED edge set (parallel
links count once — a page linking twice is one endorsement); per
iteration

    rank'(v) = (1-d)/N + d · (Σ_{u→v} rank(u)/outdeg(u) + D/N)

where D = Σ rank(dangling u) (no out-edges) — the standard dangling
redistribution that keeps Σ rank = 1 exactly. A FIXED ``max_iter``
iterations (deterministic output; convergence-threshold stopping would
make results depend on float noise across partitionings).

100 TB shape: the deduped edge list is hash-partitioned by ``src``
ONCE and persisted — every iteration's contribution join reuses that
layout and shuffles only the O(nodes) rank rows (16 bytes each), never
the edges. Each iteration is one join + one map-side-partial groupBy;
the rank frame localCheckpoints per iteration (O(nodes) rows) so
lineage stays flat over 20+ iterations, and the dangling mass is the
iteration's single 1-row driver action. The loop is driver-side by
nature (iterative fixpoint — the documented non-SQL seam, same as
connected_components' pointer jumping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85, max_iter: int = 20,
             src_col: str = "src", dst_col: str = "dst",
             num_partitions: int | None = None,
             nodes: DataFrame | None = None) -> DataFrame:
    """Ranks for every node of the edge list: ``(node, rank)`` with
    Σ rank = 1. ``nodes`` (optional, single id column) unions extra
    vertices into the node set — pass the crawled page table's urls so
    LINKLESS leaf pages with no inlinks still receive the (1−d)/N
    floor instead of vanishing (they participate as dangling mass).
    ``num_partitions`` pins the edge/rank partitioning width (defaults
    to ``spark.sql.shuffle.partitions``)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    spark = edges.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            num_partitions = spark.sparkContext.defaultParallelism

    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .repartition(num_partitions, "src")
         .persist())
    try:
        node_set = (e.select(F.col("src").alias("node"))
                    .union(e.select(F.col("dst").alias("node"))))
        if nodes is not None:
            extra = nodes.select(
                F.col(nodes.columns[0]).alias("node"))
            node_set = node_set.union(
                extra.filter(F.col("node").isNotNull()))
        node_set = (node_set.distinct()
                    .repartition(num_partitions, "node"))
        n = node_set.count()
        if n == 0:
            return spark.createDataFrame([], "node string, rank double")

        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        # (node, deg) with deg null for dangling nodes; this frame is
        # static across iterations — checkpoint it once
        base = (node_set.join(outdeg.withColumnRenamed("src", "node"),
                              "node", "left")
                .localCheckpoint())

        ranks = base.select("node", "deg",
                            F.lit(1.0 / n).alias("rank"))
        for _ in range(max_iter):
            dangling = (ranks.filter(F.col("deg").isNull())
                        .agg(F.sum("rank")).first()[0]) or 0.0
            contrib = (e.join(ranks.select(F.col("node").alias("src"),
                                           (F.col("rank") / F.col("deg"))
                                           .alias("c")), "src")
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.sum("c").alias("inflow")))
            ranks = (base.join(contrib, "node", "left")
                     .select("node", "deg",
                             (F.lit((1.0 - damping) / n)
                              + F.lit(damping)
                              * (F.coalesce(F.col("inflow"), F.lit(0.0))
                                 + F.lit(dangling / n))).alias("rank"))
                     .localCheckpoint())
        return ranks.select("node", "rank")
    finally:
        e.unpersist()


def link_graph(pages: DataFrame, url_col: str = "url",
               links_col: str = "links") -> DataFrame:
    """(src, dst) edge list from a page frame carrying an extracted
    outlink array column — one explode, no shuffle; compose with
    ``pagerank`` (passing ``pages.select(url_col)`` as its ``nodes``
    so linkless pages keep a rank) and hand the result to the
    scheduler as priority."""
    return pages.select(F.col(url_col).alias("src"),
                        F.explode(F.col(links_col)).alias("dst"))


def hits(edges: DataFrame, max_iter: int = 20,
         src_col: str = "src", dst_col: str = "dst",
         num_partitions: int | None = None) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — PageRank's sibling
    signal: high-hub pages are link directories (seed-list curation),
    high-authority pages are the linked-to content. Same spec
    discipline as pagerank: deduped edges, FIXED iteration count,
    L2-normalized after every half-step (the standard formulation),
    mirrored bit-for-bit in tests. Same 100 TB shape too: edges
    persisted once partitioned by join key, per-iteration shuffles
    carry only (node, score) rows, scores localCheckpoint per
    iteration. Returns (node, hub, authority)."""
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    spark = edges.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            num_partitions = spark.sparkContext.defaultParallelism

    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         .repartition(num_partitions, "src")
         .persist())
    try:
        node_set = (e.select(F.col("src").alias("node"))
                    .union(e.select(F.col("dst").alias("node")))
                    .distinct().repartition(num_partitions, "node")
                    .localCheckpoint())
        if node_set.count() == 0:
            return spark.createDataFrame(
                [], "node string, hub double, authority double")

        scores = node_set.select("node", F.lit(1.0).alias("hub"),
                                 F.lit(1.0).alias("authority"))

        def _l2_normalized(df, col):
            norm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))
                          ).first()[0] or 1.0
            return df.withColumn(col, F.col(col) / F.lit(float(norm)))

        for _ in range(max_iter):
            # auth(v) = Σ hub(u → v)
            auth = (e.join(scores.select(F.col("node").alias("src"),
                                         "hub"), "src")
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("hub").alias("authority")))
            scores = (node_set.join(auth, "node", "left")
                      .select("node",
                              F.coalesce("authority", F.lit(0.0))
                              .alias("authority")))
            scores = _l2_normalized(scores, "authority")
            # hub(u) = Σ auth(u → v)
            hub = (e.join(scores.select(F.col("node").alias("dst"),
                                        "authority"), "dst")
                   .groupBy(F.col("src").alias("node"))
                   .agg(F.sum("authority").alias("hub")))
            scores = (node_set.join(hub, "node", "left")
                      .join(scores.select("node", "authority"), "node")
                      .select("node",
                              F.coalesce("hub", F.lit(0.0)).alias("hub"),
                              "authority"))
            scores = _l2_normalized(scores, "hub").localCheckpoint()
        if max_iter == 0:
            scores = scores.select("node", F.lit(1.0).alias("hub"),
                                   F.lit(1.0).alias("authority"))
        return scores.select("node", "hub", "authority")
    finally:
        e.unpersist()


def domain_graph(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Collapse a page-level edge list onto registered domains:
    ``(src, dst, n_links)`` with intra-domain edges dropped (site-
    internal navigation is noise at domain granularity — Common
    Crawl's published host/domain graphs make the same cut). The
    groupBy is map-side-partial over the two short domain strings, so
    a 10^11-edge page graph reduces to the ~10^8-domain graph before
    the exchange; feed the result straight into ``pagerank``/``hits``
    for domain-level authority (the scale at which link analysis is
    usually run and spam-resisted)."""
    from data_crawler_spark.operators.links import registered_domain_col

    s = registered_domain_col(F.col(src_col))
    d = registered_domain_col(F.col(dst_col))
    return (edges.select(s.alias("src"), d.alias("dst"))
            .filter((F.col("src") != "") & (F.col("dst") != "")
                    & (F.col("src") != F.col("dst")))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("n_links")))
