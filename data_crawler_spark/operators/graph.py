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
redistribution that keeps Σ rank = 1 exactly. By DEFAULT a fixed
``max_iter`` iterations (deterministic output; convergence-threshold
stopping makes results depend on float noise across partitionings) —
``tol`` is the caller's explicit opt-in trade for the incremental
warm-start path, where exiting a few iterations after the old
fixpoint is the entire point.

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
             nodes: DataFrame | None = None,
             init_ranks: DataFrame | None = None,
             tol: float | None = None,
             stats: dict | None = None) -> DataFrame:
    """Ranks for every node of the edge list: ``(node, rank)`` with
    Σ rank = 1. ``nodes`` (optional, single id column) unions extra
    vertices into the node set — pass the crawled page table's urls so
    LINKLESS leaf pages with no inlinks still receive the (1−d)/N
    floor instead of vanishing (they participate as dangling mass).
    ``num_partitions`` pins the edge/rank partitioning width (defaults
    to ``spark.sql.shuffle.partitions``).

    Incremental recompute: pass ``init_ranks`` (a previous run's
    (node, rank), any overlap with the current node set) to warm-start
    — new nodes take the uniform 1/N, the vector renormalizes to Σ=1,
    and the power iteration converges from the old fixpoint instead of
    uniform. With ``tol`` set, iteration stops once the L1 delta
    between successive vectors drops below it (one extra ~16-byte-row
    join+agg per iteration), which is what makes the warm start pay:
    after a small crawl delta the old ranks are near the new fixpoint
    and the loop exits in a few iterations instead of max_iter.
    ``stats`` (a dict, mutated) records {"iterations", "delta"}."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    if tol is not None and tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
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
            if stats is not None:
                stats["iterations"] = 0
                stats["delta"] = None
            return spark.createDataFrame([], "node string, rank double")

        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        # (node, deg) with deg null for dangling nodes; this frame is
        # static across iterations — checkpoint it once
        base = (node_set.join(outdeg.withColumnRenamed("src", "node"),
                              "node", "left")
                .localCheckpoint())

        if init_ranks is not None:
            # one row per node even if the caller unioned partial rank
            # tables (duplicates would fan base out through the join
            # and double-count that node's outflow forever after)
            ir = (init_ranks.select(
                      F.col(init_ranks.columns[0]).alias("node"),
                      F.col("rank").alias("_r0"))
                  .groupBy("node").agg(F.max("_r0").alias("_r0")))
            seeded = (base.join(ir, "node", "left")
                      .select("node", "deg",
                              F.coalesce("_r0", F.lit(1.0 / n))
                              .alias("rank"))
                      .localCheckpoint())
            total = seeded.agg(F.sum("rank")).first()[0] or 1.0
            ranks = seeded.withColumn("rank", F.col("rank") / F.lit(total))
        else:
            ranks = base.select("node", "deg",
                                F.lit(1.0 / n).alias("rank"))
        it, delta = 0, None
        for it in range(1, max_iter + 1):
            dangling = (ranks.filter(F.col("deg").isNull())
                        .agg(F.sum("rank")).first()[0]) or 0.0
            contrib = (e.join(ranks.select(F.col("node").alias("src"),
                                           (F.col("rank") / F.col("deg"))
                                           .alias("c")), "src")
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.sum("c").alias("inflow")))
            new_ranks = (base.join(contrib, "node", "left")
                         .select("node", "deg",
                                 (F.lit((1.0 - damping) / n)
                                  + F.lit(damping)
                                  * (F.coalesce(F.col("inflow"), F.lit(0.0))
                                     + F.lit(dangling / n))).alias("rank"))
                         .localCheckpoint())
            if tol is not None:
                delta = (new_ranks.select("node", "rank")
                         .join(ranks.select("node",
                                            F.col("rank").alias("_p")),
                               "node")
                         .agg(F.sum(F.abs(F.col("rank") - F.col("_p"))))
                         .first()[0]) or 0.0
                ranks = new_ranks
                if delta < tol:
                    break
            else:
                ranks = new_ranks
        if stats is not None:
            stats["iterations"] = it
            stats["delta"] = delta
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


def harmonic_centrality(edges: DataFrame, max_radius: int = 10,
                        lg_config_k: int = 12,
                        src_col: str = "src", dst_col: str = "dst",
                        num_partitions: int | None = None,
                        nodes: DataFrame | None = None) -> DataFrame:
    """Harmonic centrality ``H(x) = Σ_{y≠x} 1/d(y,x)`` for every node
    — the signal Common Crawl publishes next to PageRank for its
    host/domain ranks (spam-resistant: it counts how CLOSE the rest of
    the web is to you, not how much rank flows in). Exact computation
    is all-pairs BFS; the published scale algorithm is HyperBall
    (Boldi & Vigna, "In-Core Computation of Geometric Centralities
    with HyperBall", 2013): every node keeps a HyperLogLog sketch of
    its in-distance ball, and radius r+1's ball is the HLL union of
    the node's own ball with its in-neighbors' balls — set union
    becomes a mergeable-sketch aggregate, so the whole thing is r
    rounds of join + groupBy.

    This implementation is HyperBall AS a DataFrame plan on Spark's
    native DataSketches HLL expressions (``hll_sketch_agg`` /
    ``hll_union_agg`` / ``hll_sketch_estimate`` — JVM-side, no
    Python): per radius, ONE equi-join ships in-neighbor sketches to
    their targets and ONE map-side-partial union-agg merges them;
    ``H`` accumulates ``(|B_r| − |B_{r−1}|)/r``. Returns ``(node,
    harmonic, reach)`` where ``reach`` is the final ball-size estimate
    (the neighborhood-function value, itself useful as a
    connectivity/spam feature).

    100 TB shape: the deduped edge list is hash-partitioned by ``src``
    once and persisted (pagerank's layout); each round shuffles only
    (node, sketch) rows — a sketch is ≤ 2^lg_config_k bytes-ish and
    EXACT below ~2^(lg_config_k−5) members, so small-ball nodes carry
    tiny sparse sketches. The state frame localCheckpoints per round
    (flat lineage); rounds stop early when the global ball mass stops
    growing (one 1-row driver action per round — a data property, not
    a layout property, so early stop is deterministic). Accuracy is
    the HLL trade: relative ±~1.04/√2^lg_config_k on BIG balls, exact
    on small ones — centrality RANKINGS at web scale tolerate this by
    design (the paper's entire point).

    Like pagerank: parallel edges count once; ``nodes`` unions extra
    isolated vertices (harmonic 0, reach 1)."""
    if max_radius < 0:
        raise ValueError(f"max_radius must be >= 0, got {max_radius}")
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
            extra = nodes.select(F.col(nodes.columns[0]).alias("node"))
            node_set = node_set.union(
                extra.filter(F.col("node").isNotNull()))
        node_set = (node_set.distinct()
                    .repartition(num_partitions, "node"))
        if node_set.isEmpty():
            return spark.createDataFrame(
                [], "node string, harmonic double, reach long")

        # radius 0: every ball is {node} itself
        state = (node_set.groupBy("node")
                 .agg(F.hll_sketch_agg("node", F.lit(lg_config_k))
                      .alias("sk"))
                 .select("node", "sk",
                         F.hll_sketch_estimate("sk").alias("est"),
                         F.lit(0.0).alias("h"))
                 .localCheckpoint())
        total = state.agg(F.sum("est")).collect()[0][0]

        for r in range(1, max_radius + 1):
            contrib = (e.join(state.select(F.col("node").alias("src"),
                                           "sk"), "src")
                       .select(F.col("dst").alias("node"), "sk"))
            unioned = (contrib.union(state.select("node", "sk"))
                       .groupBy("node")
                       .agg(F.hll_union_agg("sk").alias("sk_new")))
            # clamp the estimate monotone: the SKETCH only grows, but
            # the composite estimator can dip a hair across its
            # mode transitions — a raw dip would add a negative
            # harmonic increment now and re-count the same mass later
            state = (state.drop("sk").join(unioned, "node")
                     .withColumn("est_new",
                                 F.greatest(
                                     F.hll_sketch_estimate("sk_new"),
                                     F.col("est")))
                     .select("node",
                             F.col("sk_new").alias("sk"),
                             F.col("est_new").alias("est"),
                             (F.col("h")
                              + (F.col("est_new") - F.col("est"))
                              / F.lit(float(r))).alias("h"))
                     .localCheckpoint())
            new_total = state.agg(F.sum("est")).collect()[0][0]
            if new_total == total:  # every ball saturated
                break
            total = new_total

        return state.select("node", F.col("h").alias("harmonic"),
                            F.col("est").alias("reach"))
    finally:
        e.unpersist()


def label_propagation(edges: DataFrame, max_iter: int = 10,
                      src_col: str = "src", dst_col: str = "dst",
                      num_partitions: int | None = None,
                      nodes: DataFrame | None = None) -> DataFrame:
    """Community detection by label propagation (Raghavan et al. 2007)
    over the (symmetrized) link graph: every node starts as its own
    community and repeatedly adopts the most frequent label among its
    neighbors. Near-linear time, no parameter to tune — the standard
    first-pass community signal for link-spam farms (dense mutual-link
    neighborhoods collapse to one label) and corpus diversity audits
    (how many distinct link communities feed the corpus). Returns
    ``(node, community)``.

    Determinism: synchronous updates with the tie-break made total —
    max vote count, then MIN label — so the result is a function of
    the graph alone, not partition layout (tested). Each node's OWN
    current label votes once alongside its neighbors (the retention
    variant): plain synchronous LPA oscillates forever on
    bipartite/star shapes, retention damps the flip. A FIXED
    ``max_iter`` still bounds the loop, and it stops early the first
    round no label changes (one count action per round, a data
    property, layout-independent).

    100 TB shape: pagerank's exact iteration layout — symmetrized
    deduped edges hash-partitioned by src once and persisted, each
    round ONE join ships (node, label) rows to neighbors, ONE
    map-side-partial count + min_by picks the mode, localCheckpoint
    keeps lineage flat. Labels are node ids (strings): shuffle rows
    stay ~2 id widths."""
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    spark = edges.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            num_partitions = spark.sparkContext.defaultParallelism

    fwd = edges.select(F.col(src_col).alias("src"),
                       F.col(dst_col).alias("dst"))
    rev = edges.select(F.col(dst_col).alias("src"),
                       F.col(src_col).alias("dst"))
    both = fwd.union(rev).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull())
    e = (both
         .filter(F.col("src") != F.col("dst"))
         .distinct()
         .repartition(num_partitions, "src")
         .persist())
    try:
        # node set from the PRE-self-loop-filter endpoints: a node
        # whose only edge is a self-loop still gets a community row
        # (its own label), matching pagerank's node-set contract
        node_set = both.select(F.col("src").alias("node"))
        if nodes is not None:
            extra = nodes.select(F.col(nodes.columns[0]).alias("node"))
            node_set = node_set.union(
                extra.filter(F.col("node").isNotNull()))
        node_set = (node_set.distinct()
                    .repartition(num_partitions, "node"))
        if node_set.isEmpty():
            return spark.createDataFrame(
                [], "node string, community string")

        labels = (node_set.select("node", F.col("node").alias("community"))
                  .localCheckpoint())
        for _ in range(max_iter):
            nb = (e.join(labels.withColumnsRenamed(
                       {"node": "src", "community": "nb_label"}), "src")
                  .select(F.col("dst").alias("node"), "nb_label"))
            # own label votes once: the retention variant that stops
            # the synchronous-update oscillation on bipartite/star
            # shapes (plain sync LPA flips a<->b forever on a path)
            nb = nb.union(labels.select(
                "node", F.col("community").alias("nb_label")))
            counts = nb.groupBy("node", "nb_label").agg(
                F.count("*").alias("cnt"))
            # mode with a TOTAL tie-break: max cnt, then min label
            mode = (counts.groupBy("node")
                    .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                                        F.col("nb_label").alias("lbl")))
                         .alias("m"))
                    .select("node", F.col("m.lbl").alias("new_label")))
            new_labels = (labels.join(mode, "node", "left")
                          .select("node",
                                  F.coalesce("new_label", "community")
                                  .alias("community"))
                          .localCheckpoint())
            n_changed = (new_labels.alias("n")
                         .join(labels.alias("o"), "node")
                         .filter(F.col("n.community")
                                 != F.col("o.community"))
                         .count())
            labels = new_labels
            if n_changed == 0:
                break
        return labels
    finally:
        e.unpersist()


def trustrank(edges: DataFrame, seeds: DataFrame, damping: float = 0.85,
              max_iter: int = 20, src_col: str = "src",
              dst_col: str = "dst",
              num_partitions: int | None = None,
              nodes: DataFrame | None = None) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004):
    PageRank personalized to a hand-curated SEED set of trusted pages
    — teleportation (and dangling mass) returns to the seeds instead
    of spreading uniformly, so trust decays with link distance from
    the seeds and spam farms that pump ordinary PageRank through
    self-referential link mass receive (almost) none. The published
    anti-spam companion to ``pagerank``: rank with both, and a high
    pagerank / low trustrank gap IS the spam-mass signal (their §6).

    Spec: node set and edge dedup as in ``pagerank``; t(v) = 1/|S| for
    seed nodes else 0; per iteration

        trust'(v) = (1−d)·t(v) + d·(Σ_{u→v} trust(u)/outdeg(u) + D·t(v))

    with D = Σ trust(dangling) — Σ trust = 1 exactly every iteration.
    Seeds not present in the graph still teleport (they join the node
    set); an empty seed intersection raises (trust must enter
    somewhere). Fixed ``max_iter`` for cross-layout determinism.

    100 TB shape: identical to pagerank — edges persisted once
    partitioned by src, per-iteration shuffles carry (node, trust)
    rows only, the seed membership rides the checkpointed base frame,
    one 1-row dangling action per iteration."""
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
        seed_set = (seeds.select(F.col(seeds.columns[0]).alias("node"))
                    .filter(F.col("node").isNotNull()).distinct())
        node_set = (e.select(F.col("src").alias("node"))
                    .union(e.select(F.col("dst").alias("node")))
                    .union(seed_set))
        if nodes is not None:
            extra = nodes.select(F.col(nodes.columns[0]).alias("node"))
            node_set = node_set.union(
                extra.filter(F.col("node").isNotNull()))
        node_set = (node_set.distinct()
                    .repartition(num_partitions, "node"))

        n_seeds = seed_set.count()
        if n_seeds == 0:
            raise ValueError("trustrank needs a non-empty seed set")

        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        base = (node_set
                .join(outdeg.withColumnRenamed("src", "node"),
                      "node", "left")
                .join(seed_set.withColumn("_seed", F.lit(True)),
                      "node", "left")
                .withColumn("t", F.when(F.coalesce("_seed", F.lit(False)),
                                        F.lit(1.0 / n_seeds))
                            .otherwise(F.lit(0.0)))
                .drop("_seed")
                .localCheckpoint())

        trust = base.select("node", "deg", "t",
                            F.col("t").alias("trust"))
        for _ in range(max_iter):
            dangling = (trust.filter(F.col("deg").isNull())
                        .agg(F.sum("trust")).first()[0]) or 0.0
            contrib = (e.join(trust.select(F.col("node").alias("src"),
                                           (F.col("trust") / F.col("deg"))
                                           .alias("c")), "src")
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.sum("c").alias("inflow")))
            trust = (base.join(contrib, "node", "left")
                     .select("node", "deg", "t",
                             (F.lit(1.0 - damping) * F.col("t")
                              + F.lit(damping)
                              * (F.coalesce(F.col("inflow"), F.lit(0.0))
                                 + F.lit(dangling) * F.col("t")))
                             .alias("trust"))
                     .localCheckpoint())
        return trust.select("node", "trust")
    finally:
        e.unpersist()


def spam_mass(ranks: DataFrame, trust: DataFrame) -> DataFrame:
    """Relative spam mass (Gyöngyi et al. 2004 §6): the fraction of a
    node's PageRank NOT backed by trust, ``(rank − trust)/rank`` —
    near 1 for farm pages, near/below 0 for seed-adjacent pages. One
    equi-join of the two O(nodes) rank frames; nodes absent from the
    trust frame count as untrusted (trust 0)."""
    return (ranks.join(trust, "node", "left")
            .select("node", "rank",
                    F.coalesce("trust", F.lit(0.0)).alias("trust"),
                    F.when(F.col("rank") > 0,
                           (F.col("rank")
                            - F.coalesce("trust", F.lit(0.0)))
                           / F.col("rank"))
                    .alias("spam_mass")))


def opic(edges: DataFrame, max_iter: int = 20,
         src_col: str = "src", dst_col: str = "dst",
         num_partitions: int | None = None,
         nodes: DataFrame | None = None) -> DataFrame:
    """On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    WWW 2003) — the importance estimator designed to run DURING a
    crawl: unlike PageRank it needs no convergence of a global power
    iteration before the numbers are usable; cash/history are
    meaningful after any prefix of reads, so a crawler can re-rank its
    frontier every round from the running totals.

    Spec (synchronous batch variant — every page is "read" once per
    iteration, a fair read schedule per the paper's §3 convergence
    conditions; mirrored bit-for-bit by tests/test_graph.py):
    a VIRTUAL page V is linked from and to every real page (the
    paper's device for dangling pages + ergodicity). State: cash C
    and history H per page, C0 = 1/N uniform over real pages,
    C0(V) = 0, H0 = 0. Per iteration every real page u distributes
    C(u)/(outdeg(u)+1) along each real outlink AND to V (dangling
    pages send everything to V), accruing H(u) += C(u); V
    simultaneously distributes its cash uniformly, C(V)/N to each
    real page, accruing H(V) += C(V). Total cash (real + virtual)
    stays exactly 1. Reported importance is the paper's estimator
    (H(v) + C(v)) / (G + 1) with G = ΣH over ALL pages incl. V —
    so Σ importance over real pages = 1 − importance(V) < 1.

    100 TB shape: identical to ``pagerank`` — the deduped edge list is
    hash-partitioned by src ONCE and persisted, each iteration is one
    equi-join + one map-side-partial groupBy shuffling only O(nodes)
    24-byte (node, cash) rows, state localCheckpoints per iteration,
    and the virtual page's inflow is the iteration's single 1-row
    driver action. Returns ``(node, cash, history, importance)``;
    ``importance`` is the scheduler's priority column.
    """
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
            extra = nodes.select(F.col(nodes.columns[0]).alias("node"))
            node_set = node_set.union(
                extra.filter(F.col("node").isNotNull()))
        node_set = (node_set.distinct()
                    .repartition(num_partitions, "node"))
        n = node_set.count()
        if n == 0:
            return spark.createDataFrame(
                [], "node string, cash double, history double, "
                    "importance double")

        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        base = (node_set.join(outdeg.withColumnRenamed("src", "node"),
                              "node", "left")
                .localCheckpoint())

        state = base.select("node", "deg",
                            F.lit(1.0 / n).alias("cash"),
                            F.lit(0.0).alias("hist"))
        v_cash, v_hist = 0.0, 0.0
        # per-link share: every real page has outdeg+1 links (the +1
        # is the virtual link); a dangling page's whole cash goes to V
        share = F.col("cash") / (F.coalesce(F.col("deg"), F.lit(0))
                                 + F.lit(1))
        for _ in range(max_iter):
            v_in = state.agg(F.sum(share)).first()[0] or 0.0
            contrib = (e.join(state.select(F.col("node").alias("src"),
                                           share.alias("c")), "src")
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.sum("c").alias("inflow")))
            state = (base.join(contrib, "node", "left")
                     .join(state.select("node",
                                        (F.col("hist") + F.col("cash"))
                                        .alias("hist")), "node")
                     .select("node", "deg",
                             (F.coalesce(F.col("inflow"), F.lit(0.0))
                              + F.lit(v_cash / n)).alias("cash"),
                             "hist")
                     .localCheckpoint())
            v_hist += v_cash
            v_cash = float(v_in)

        g = ((state.agg(F.sum("hist")).first()[0] or 0.0) + v_hist)
        return state.select(
            "node", "cash", F.col("hist").alias("history"),
            ((F.col("hist") + F.col("cash")) / F.lit(g + 1.0))
            .alias("importance"))
    finally:
        e.unpersist()


def _reach(edges: DataFrame, seeds: DataFrame, reverse: bool = False,
           max_iter: int = 50) -> DataFrame:
    """Transitive closure from ``seeds`` (single ``node`` column) over
    ``edges(src, dst)`` — the distributed BFS every Spark graph layer
    uses: per level, join the frontier against the edge list, anti-join
    out already-visited nodes, localCheckpoint to cut lineage. Includes
    the seeds. O(diameter) join rounds; each round's frontier shrinks
    to genuinely-new nodes only. Raises rather than returning a
    silently-truncated closure when the graph's diameter exceeds
    ``max_iter`` — a partial reach would MISLABEL every node past the
    horizon (unlike resolve_redirects, whose truncation has an honest
    'cyclic' escape hatch)."""
    s, d = ("dst", "src") if reverse else ("src", "dst")
    visited = seeds.select("node").distinct().localCheckpoint()
    frontier = visited
    for _ in range(max_iter):
        nxt = (edges.join(frontier.withColumnRenamed("node", s), s)
               .select(F.col(d).alias("node")).distinct()
               .join(visited, "node", "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            return visited
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    if not (edges.join(frontier.withColumnRenamed("node", s), s)
            .select(F.col(d).alias("node"))
            .join(visited, "node", "left_anti").isEmpty()):
        raise RuntimeError(
            f"BFS closure not complete after {max_iter} levels — "
            "raise max_iter (graph diameter exceeds it)")
    return visited


def bowtie_decomposition(edges: DataFrame, seed,
                         src_col: str = "src", dst_col: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """The Broder-et-al-2000 bow-tie map of a web graph: every node
    labeled ``SCC`` (the seed's strongly connected core), ``IN``
    (reaches the core), ``OUT`` (reached from it), ``TUBE`` (an
    IN->OUT path bypassing the core), ``TENDRIL`` (hangs off IN or
    into OUT), or ``DISCONNECTED`` (outside the core's weak
    component) — the standard structural audit of a crawled graph
    ("how much of what we crawled can't even reach the core?").

    ``seed`` must be a node of the intended core — pick the top
    PageRank/OPIC node; the decomposition is exact for whatever SCC
    the seed belongs to. Definitions follow the paper: SCC = forward ∩
    backward reachability of the seed; IN/OUT = the two reachability
    fans minus the core; tendrils = the weak component's leftovers,
    with TUBE the subset both reachable from IN and reaching OUT.

    Shape: six BFS closures (forward, backward, forward-from-IN,
    backward-from-OUT, undirected, all O(diameter) join rounds) over
    a deduplicated persisted edge list, then pure set algebra via
    left-anti/semi joins. Labels come out as one row per node."""
    spark = edges.sparkSession
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().persist())
    try:
        all_nodes = (e.select(F.col("src").alias("node"))
                     .union(e.select(F.col("dst").alias("node")))
                     .distinct().localCheckpoint())
        seed_df = spark.createDataFrame([(seed,)], ["node"])
        fwd = _reach(e, seed_df, reverse=False, max_iter=max_iter)
        bwd = _reach(e, seed_df, reverse=True, max_iter=max_iter)
        scc = fwd.join(bwd, "node", "left_semi").localCheckpoint()
        in_set = bwd.join(scc, "node", "left_anti").localCheckpoint()
        out_set = fwd.join(scc, "node", "left_anti").localCheckpoint()

        undirected = e.union(e.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
        wcc = _reach(undirected, seed_df, max_iter=2 * max_iter)
        core_fan = scc.union(in_set).union(out_set).distinct()
        tendrils = (wcc.join(core_fan, "node", "left_anti")
                    .localCheckpoint())
        fwd_in = _reach(e, in_set, reverse=False, max_iter=max_iter)
        bwd_out = _reach(e, out_set, reverse=True, max_iter=max_iter)
        tube = (tendrils.join(fwd_in, "node", "left_semi")
                .join(bwd_out, "node", "left_semi"))

        def lab(df, name):
            return df.select("node", F.lit(name).alias("component"))

        labeled = (lab(scc, "SCC")
                   .union(lab(in_set, "IN"))
                   .union(lab(out_set, "OUT"))
                   .union(lab(tube, "TUBE"))
                   .union(lab(tendrils.join(tube, "node", "left_anti"),
                              "TENDRIL")))
        rest = all_nodes.join(labeled.select("node"), "node", "left_anti")
        return labeled.union(lab(rest, "DISCONNECTED"))
    finally:
        e.unpersist()
