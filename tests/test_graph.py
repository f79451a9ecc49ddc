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
