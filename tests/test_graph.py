"""PageRank: exact match vs a pure-Python mirror of the spec, rank-sum
invariant, partitioning determinism, scheduler integration."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.graph import link_graph, pagerank


def _ref_pagerank(edge_list, d=0.85, iters=20):
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    if n == 0:
        return {}
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(rank[v] for v in nodes if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for u, targets in out.items():
            share = rank[u] / len(targets)
            for v in targets:
                inflow[v] += share
        rank = {v: (1 - d) / n + d * (inflow[v] + dangling / n)
                for v in nodes}
    return rank


GRAPHS = {
    "chain": [("a", "b"), ("b", "c"), ("c", "d")],
    "cycle": [("a", "b"), ("b", "c"), ("c", "a")],
    "star_in": [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
    "dangling": [("a", "b"), ("a", "c"), ("b", "c")],  # c has no out-edges
    "parallel_dup": [("a", "b"), ("a", "b"), ("b", "a")],  # dedup to 1 edge
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_matches_mirror(spark, name):
    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, max_iter=20).collect()}
    want = _ref_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), (name, v)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_importance_ordering(spark):
    # everyone links to hub -> hub outranks its fans
    df = spark.createDataFrame(GRAPHS["star_in"], "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df).collect()}
    assert got["hub"] > got["a"] > got["b"] == pytest.approx(got["c"])


def test_partitioning_invariance(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r.node: r.rank
         for r in pagerank(df.coalesce(1), max_iter=8,
                           num_partitions=3).collect()}
    b = {r.node: r.rank
         for r in pagerank(df.repartition(13), max_iter=8,
                           num_partitions=8).collect()}
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], rel=1e-12)


def test_zero_iters_empty_and_validation(spark):
    df = spark.createDataFrame(GRAPHS["chain"], "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, max_iter=0).collect()}
    assert all(r == pytest.approx(0.25) for r in got.values())
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, max_iter=-1)


def test_feeds_scheduler_priority(spark):
    """The crawl integration: rank becomes the scheduler's priority,
    so the budgeted pick per host is the highest-PageRank candidate."""
    from data_crawler_spark.operators.scheduler import schedule_per_host

    pages = spark.createDataFrame(
        [("h://x/a", ["h://x/b", "h://x/c"]),
         ("h://x/b", ["h://x/c"]),
         ("h://x/c", ["h://x/a"])],
        "url string, links array<string>")
    ranks = pagerank(link_graph(pages), max_iter=10)
    want = _ref_pagerank([("h://x/a", "h://x/b"), ("h://x/a", "h://x/c"),
                          ("h://x/b", "h://x/c"), ("h://x/c", "h://x/a")],
                         iters=10)
    cand = (ranks.select(F.col("node").alias("url"),
                         F.col("rank").alias("priority"))
            .withColumn("host", F.lit("x"))
            .withColumn("depth", F.lit(1))
            .withColumn("discovered_round", F.lit(0)))
    hosts = spark.createDataFrame([("x", 1)],
                                  "host string, budget_per_round int")
    picked = schedule_per_host(cand, hosts).collect()
    assert len(picked) == 1
    assert picked[0].url == max(want, key=lambda v: (want[v], v))

def test_nodes_param_keeps_linkless_pages(spark):
    # 'iso' has no links and no inlinks: absent without nodes=, ranked
    # with it, and the mirror (which treats it as a dangling vertex)
    # agrees exactly
    df = spark.createDataFrame(GRAPHS["chain"], "src string, dst string")
    pages = spark.createDataFrame([("a",), ("b",), ("c",), ("d",),
                                   ("iso",)], "url string")
    without = {r.node for r in pagerank(df, max_iter=5).collect()}
    assert "iso" not in without
    got = {r.node: r.rank
           for r in pagerank(df, max_iter=5, nodes=pages).collect()}
    # mirror with the isolated vertex in the node set
    nodes = sorted({u for u, _ in GRAPHS["chain"]}
                   | {v for _, v in GRAPHS["chain"]} | {"iso"})
    n = len(nodes)
    out_deg = {}
    for u, v in GRAPHS["chain"]:
        out_deg.setdefault(u, []).append(v)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        dangling = sum(rank[v] for v in nodes if v not in out_deg)
        inflow = {v: 0.0 for v in nodes}
        for u, ts in out_deg.items():
            for v in ts:
                inflow[v] += rank[u] / len(ts)
        rank = {v: 0.15 / n + 0.85 * (inflow[v] + dangling / n)
                for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def _ref_hits(edge_list, iters=20):
    import math
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out, into = {}, {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
        into.setdefault(v, []).append(u)
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(iters):
        auth = {v: sum(hub[u] for u in into.get(v, ())) for v in nodes}
        na = math.sqrt(sum(a * a for a in auth.values())) or 1.0
        auth = {v: a / na for v, a in auth.items()}
        hub = {u: sum(auth[v] for v in out.get(u, ())) for u in nodes}
        nh = math.sqrt(sum(h * h for h in hub.values())) or 1.0
        hub = {u: h / nh for u, h in hub.items()}
    return hub, auth


@pytest.mark.parametrize("name", ["chain", "star_in", "dangling"])
def test_hits_matches_mirror(spark, name):
    from data_crawler_spark.operators.graph import hits

    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub, r.authority)
           for r in hits(df, max_iter=12).collect()}
    hub, auth = _ref_hits(edges, iters=12)
    assert set(got) == set(hub)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], rel=1e-9, abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], rel=1e-9, abs=1e-12)


def test_hits_hub_vs_authority_roles(spark):
    from data_crawler_spark.operators.graph import hits

    # 'dir' links to everything (pure hub); targets are authorities
    edges = [("dir", f"p{i}") for i in range(4)]
    got = {r.node: r for r in hits(spark.createDataFrame(
        edges, "src string, dst string"), max_iter=8).collect()}
    assert got["dir"].hub == pytest.approx(1.0)
    assert got["dir"].authority == pytest.approx(0.0)
    assert all(got[f"p{i}"].authority == pytest.approx(0.5)
               for i in range(4))


def test_domain_graph_collapse(spark):
    from data_crawler_spark.operators.graph import domain_graph
    edges = spark.createDataFrame(
        [("http://a.x.test/1", "http://b.test/p"),
         ("http://a.x.test/2", "http://b.test/q"),
         ("http://x.test/3", "http://x.test/4"),      # intra: dropped
         ("http://b.test/p", "http://docs.x.test/z"),
         ("not a url", "http://b.test/p")],           # unparsable: out
        "src string, dst string")
    got = {(r.src, r.dst): r.n_links for r in domain_graph(edges).collect()}
    assert got == {("x.test", "b.test"): 2, ("b.test", "x.test"): 1}


def _exact_harmonic(edges, nodes=None):
    """All-pairs BFS reference: H(x) = sum over y!=x of 1/d(y, x)."""
    from collections import deque
    adj = {}
    ns = set(nodes or [])
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
        ns.add(s)
        ns.add(d)
    h = {n: 0.0 for n in ns}
    reach = {n: 1 for n in ns}
    for y in ns:  # BFS forward from y contributes 1/d to each target
        dist = {y: 0}
        q = deque([y])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for x, d in dist.items():
            if d > 0:
                h[x] += 1.0 / d
                reach[x] += 1
    return h, reach


@pytest.mark.parametrize("edges,nodes", [
    # chain a->b->c->d
    ([("a", "b"), ("b", "c"), ("c", "d")], None),
    # star hub: leaves point at hub
    ([(f"l{i}", "hub") for i in range(6)], None),
    # cycle + tail + parallel dup + isolated node via nodes=
    ([("a", "b"), ("b", "c"), ("c", "a"), ("a", "b"), ("t", "a")],
     ["iso"]),
])
def test_harmonic_centrality_exact_small(spark, edges, nodes):
    """HLL sketches are exact at these ball sizes, so HyperBall must
    reproduce all-pairs BFS harmonic centrality exactly."""
    from data_crawler_spark.operators.graph import harmonic_centrality
    e = spark.createDataFrame(edges, "src string, dst string")
    n = (spark.createDataFrame([(x,) for x in nodes], "node string")
         if nodes else None)
    got = {r["node"]: (r["harmonic"], r["reach"])
           for r in harmonic_centrality(e, max_radius=10,
                                        nodes=n).collect()}
    exp_h, exp_reach = _exact_harmonic(edges, nodes)
    assert set(got) == set(exp_h)
    for x in exp_h:
        assert abs(got[x][0] - exp_h[x]) < 1e-9, (x, got[x], exp_h[x])
        assert got[x][1] == exp_reach[x]


def test_harmonic_centrality_layout_invariant_and_radius_cap(spark):
    from data_crawler_spark.operators.graph import harmonic_centrality
    edges = [(f"n{i}", f"n{i+1}") for i in range(12)]  # a 13-node path
    e = spark.createDataFrame(edges, "src string, dst string")
    a = {r["node"]: (r["harmonic"], r["reach"])
         for r in harmonic_centrality(e, max_radius=20).collect()}
    b = {r["node"]: (r["harmonic"], r["reach"])
         for r in harmonic_centrality(e.repartition(7), max_radius=20,
                                      num_partitions=3).collect()}
    assert a == b
    # truncated horizon: radius 2 sees only the first two upstream hops
    c = {r["node"]: r["harmonic"]
         for r in harmonic_centrality(e, max_radius=2).collect()}
    assert abs(c["n12"] - (1.0 + 0.5)) < 1e-9
    assert abs(a["n12"][0] - sum(1.0 / k for k in range(1, 13))) < 1e-9


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge resolve to exactly two
    communities, one per clique, deterministically."""
    from itertools import combinations

    from data_crawler_spark.operators.graph import label_propagation
    c1 = [f"a{i}" for i in range(4)]
    c2 = [f"b{i}" for i in range(4)]
    edges = ([(x, y) for x, y in combinations(c1, 2)]
             + [(x, y) for x, y in combinations(c2, 2)]
             + [("a0", "b0")])
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["community"]
           for r in label_propagation(e, max_iter=10).collect()}
    assert len({got[x] for x in c1}) == 1
    assert len({got[x] for x in c2}) == 1
    assert got["a0"] != got["b0"]

    # layout invariance
    re = {r["node"]: r["community"]
          for r in label_propagation(e.repartition(5), max_iter=10,
                                     num_partitions=3).collect()}
    assert re == got


def test_label_propagation_isolated_and_direction(spark):
    from data_crawler_spark.operators.graph import label_propagation
    # direction must not matter (symmetrized): a->b, c->b one community
    e = spark.createDataFrame(
        [("a", "b"), ("c", "b")], "src string, dst string")
    n = spark.createDataFrame([("iso",)], "node string")
    got = {r["node"]: r["community"]
           for r in label_propagation(e, max_iter=5, nodes=n).collect()}
    assert got["a"] == got["b"] == got["c"]
    assert got["iso"] == "iso"  # keeps its own label


def _ref_trustrank(edge_list, seeds, d=0.85, iters=20):
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges}
                   | set(seeds))
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    t = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    trust = dict(t)
    for _ in range(iters):
        dangling = sum(trust[v] for v in nodes if v not in out)
        inflow = {v: 0.0 for v in nodes}
        for u, ts in out.items():
            for v in ts:
                inflow[v] += trust[u] / len(ts)
        trust = {v: (1 - d) * t[v] + d * (inflow[v] + dangling * t[v])
                 for v in nodes}
    return trust


def test_trustrank_matches_mirror_and_demotes_spam(spark):
    from data_crawler_spark.operators.graph import pagerank, trustrank

    # trusted cluster a->b->c plus a spam farm: satellites pump
    # their hub s1 (the Gyöngyi et al. §2 farm shape)
    edges = ([("a", "b"), ("b", "c"), ("c", "a")]
             + [("s1", f"sat{i}") for i in range(6)]
             + [(f"sat{i}", "s1") for i in range(6)])
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["trust"]
           for r in trustrank(e, seeds, max_iter=20).collect()}
    want = _ref_trustrank(edges, {"a"})
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the farm outranks honest pages on PageRank but holds ~zero trust
    pr = {r["node"]: r["rank"] for r in pagerank(e, max_iter=20).collect()}
    assert pr["s1"] > pr["b"]          # spam mass fools pagerank
    assert got["s1"] == pytest.approx(0.0, abs=1e-12)
    assert got["b"] > 0.1

    # spam-mass composition: farm pages ~1, trusted pages well below
    from data_crawler_spark.operators.graph import spam_mass
    pr_df = pagerank(e, max_iter=20)
    tr_df = trustrank(e, seeds, max_iter=20)
    sm = {r["node"]: r["spam_mass"] for r in
          spam_mass(pr_df, tr_df).collect()}
    assert sm["s1"] == pytest.approx(1.0, abs=1e-9)
    assert sm["b"] < 0.5


def test_trustrank_seed_outside_graph_and_validation(spark):
    from data_crawler_spark.operators.graph import trustrank
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    # seed not present in the edge list still teleports (dangling)
    seeds = spark.createDataFrame([("z",), ("a",)], "node string")
    got = {r["node"]: r["trust"]
           for r in trustrank(e, seeds, max_iter=10).collect()}
    want = _ref_trustrank([("a", "b")], {"z", "a"}, iters=10)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-12)
    empty_seeds = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError):
        trustrank(e, empty_seeds)


# ---------------------------------------------------------------- OPIC

def _ref_opic(edge_list, iters, extra_nodes=()):
    """Pure-Python mirror of graph.opic's synchronous-batch spec."""
    edges = sorted(set(edge_list))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges}
                   | set(extra_nodes))
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    cash = {v: 1.0 / n for v in nodes}
    hist = {v: 0.0 for v in nodes}
    v_cash = v_hist = 0.0
    for _ in range(iters):
        inflow = {v: 0.0 for v in nodes}
        v_in = 0.0
        for u in nodes:
            deg = len(out.get(u, []))
            sh = cash[u] / (deg + 1)
            for v in out.get(u, []):
                inflow[v] += sh
            v_in += sh
        for u in nodes:
            hist[u] += cash[u]
            cash[u] = inflow[u] + v_cash / n
        v_hist += v_cash
        v_cash = v_in
    g = sum(hist.values()) + v_hist
    return {v: (hist[v] + cash[v]) / (g + 1.0) for v in nodes}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_opic_matches_mirror(spark, name):
    from data_crawler_spark.operators.graph import opic

    edges = GRAPHS[name]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = opic(df, max_iter=12).collect()
    got = {r.node: r.importance for r in rows}
    want = _ref_opic(edges, iters=12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), (name, v)
    # real pages share 1 minus the virtual page's importance
    assert 0.0 < sum(got.values()) < 1.0
    # history is the accumulated spent cash: strictly positive
    assert all(r.history > 0 for r in rows)


def test_opic_ordering_and_isolated_node(spark):
    from data_crawler_spark.operators.graph import opic

    df = spark.createDataFrame(GRAPHS["star_in"], "src string, dst string")
    got = {r.node: r.importance for r in opic(df, max_iter=15).collect()}
    assert got["hub"] > got["a"] > got["b"] == pytest.approx(got["c"])

    # a linkless page passed via nodes= still accrues importance
    # (the virtual page redistributes to everyone)
    extra = df.sparkSession.createDataFrame([("z",)], "node string")
    got2 = {r.node: r.importance
            for r in opic(df, max_iter=15, nodes=extra).collect()}
    want2 = _ref_opic(GRAPHS["star_in"], iters=15, extra_nodes=("z",))
    for v in want2:
        assert got2[v] == pytest.approx(want2[v], rel=1e-9)
    assert got2["z"] > 0


def test_opic_partitioning_invariance_and_validation(spark):
    from data_crawler_spark.operators.graph import opic

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r.node: r.importance
         for r in opic(df.coalesce(1), max_iter=6,
                       num_partitions=3).collect()}
    b = {r.node: r.importance
         for r in opic(df.repartition(13), max_iter=6,
                       num_partitions=8).collect()}
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], rel=1e-12)
    empty = spark.createDataFrame([], "src string, dst string")
    assert opic(empty).count() == 0
    with pytest.raises(ValueError):
        opic(df, max_iter=-1)


def test_pagerank_warm_start_converges_faster(spark):
    """A previous run's ranks + tol: the warm start must reach the
    tolerance in strictly fewer iterations than the cold start on the
    same (slightly grown) graph, and land on the same ranks."""
    from data_crawler_spark.operators.graph import pagerank

    # a hub cycle fed by many leaves: fast-mixing (the hub cycle sets
    # the contraction rate, not the damping bound — a sparse
    # permutation graph here mixes at ~0.85/iter and nothing converges
    # in test time), and big enough that a one-node crawl delta is a
    # small perturbation (on a 6-node toy the fixpoint itself moves
    # ~20% and warm starting buys nothing — verified)
    base_edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")] + \
                 [(f"l{i}", "a" if i % 2 else "b") for i in range(40)]
    e1 = spark.createDataFrame(base_edges, "src string, dst string")
    # a tightly-converged prior (the realistic nightly artifact: the
    # published ranks ARE a fixpoint, not a half-finished sweep)
    prior = pagerank(e1, max_iter=200, tol=1e-12)

    # the crawl delta adds one page
    e2 = spark.createDataFrame(base_edges + [("new", "c")],
                               "src string, dst string")
    cold_stats, warm_stats = {}, {}
    cold = pagerank(e2, max_iter=60, tol=1e-9, stats=cold_stats)
    warm = pagerank(e2, max_iter=60, tol=1e-9, init_ranks=prior,
                    stats=warm_stats)
    assert warm_stats["iterations"] < cold_stats["iterations"]
    c = {r.node: r.rank for r in cold.collect()}
    w = {r.node: r.rank for r in warm.collect()}
    assert set(c) == set(w)
    assert all(abs(c[k] - w[k]) < 1e-6 for k in c)
    assert abs(sum(w.values()) - 1.0) < 1e-9

    # the degenerate restart (unchanged graph) exits after ONE sweep —
    # the nightly no-op recompute costs one iteration, not max_iter
    st = {}
    pagerank(e1, max_iter=60, tol=1e-9, init_ranks=prior, stats=st)
    assert st["iterations"] == 1

    import pytest as _p
    with _p.raises(ValueError):
        pagerank(e2, tol=0.0)


def test_bowtie_decomposition(spark):
    """Hand-built Broder bow-tie: core cycle, IN/OUT fans, a tube, a
    tendril off IN, a tendril into OUT, and a disconnected island."""
    from data_crawler_spark.operators.graph import bowtie_decomposition

    edges = [
        # SCC: s1 -> s2 -> s3 -> s1
        ("s1", "s2"), ("s2", "s3"), ("s3", "s1"),
        ("in1", "s1"), ("in2", "in1"),          # IN chain
        ("s3", "out1"), ("out1", "out2"),       # OUT chain
        ("in1", "tube1"), ("tube1", "out1"),    # tube bypassing the core
        ("in1", "t_in"),                        # tendril off IN
        ("t_out", "out2"),                      # tendril into OUT
        ("x1", "x2"),                           # disconnected island
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.component
           for r in bowtie_decomposition(e, "s1").collect()}
    assert got == {
        "s1": "SCC", "s2": "SCC", "s3": "SCC",
        "in1": "IN", "in2": "IN",
        "out1": "OUT", "out2": "OUT",
        "tube1": "TUBE",
        "t_in": "TENDRIL", "t_out": "TENDRIL",
        "x1": "DISCONNECTED", "x2": "DISCONNECTED",
    }
    # every node labeled exactly once, under any layout
    out2 = bowtie_decomposition(e.repartition(5), "s1")
    assert out2.groupBy("node").count().filter("count > 1").count() == 0
    assert {r.node: r.component for r in out2.collect()} == got
    # a seed inside OUT decomposes relative to ITS (trivial) core
    rel = {r.node: r.component
           for r in bowtie_decomposition(e, "out1").collect()}
    assert rel["out1"] == "SCC" and rel["s1"] == "IN"


def test_pagerank_stats_empty_and_duplicate_init(spark):
    from data_crawler_spark.operators.graph import pagerank

    st = {}
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, tol=1e-9, stats=st).count() == 0
    assert st == {"iterations": 0, "delta": None}

    # duplicate rows in init_ranks must not fan the rank vector out
    edges = spark.createDataFrame(GRAPHS["cycle"], "src string, dst string")
    clean = pagerank(edges, max_iter=5)
    dup_init = clean.union(clean)
    warm = pagerank(edges, max_iter=5, init_ranks=dup_init)
    assert warm.count() == 3
    w = {r.node: r.rank for r in warm.collect()}
    c = {r.node: r.rank for r in clean.collect()}
    assert all(w[k] == pytest.approx(c[k], rel=1e-9) for k in c)


def test_bowtie_raises_on_truncated_reach(spark):
    from data_crawler_spark.operators.graph import bowtie_decomposition

    chain = [(f"c{i}", f"c{i+1}") for i in range(12)] + [("c12", "c0")]
    e = spark.createDataFrame(chain, "src string, dst string")
    # the 13-cycle needs 13 BFS levels; a 5-level budget must FAIL
    # loudly instead of mislabeling the far side of the cycle
    with pytest.raises(RuntimeError, match="BFS closure"):
        bowtie_decomposition(e, "c0", max_iter=5)
    ok = {r.component for r in
          bowtie_decomposition(e, "c0", max_iter=20).collect()}
    assert ok == {"SCC"}
