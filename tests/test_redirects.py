"""Redirect-chain resolution (operators/redirects.py)."""

from __future__ import annotations

import pytest

from data_crawler_spark.operators.redirects import (
    apply_redirects,
    resolve_redirects,
)


def _map(spark, pairs):
    return spark.createDataFrame(pairs, "url string, redirect_to string")


def test_chains_resolve_with_exact_hops(spark):
    # chain of 5, a fork joining it mid-way, and a 1-hop redirect
    pairs = [(f"u{i}", f"u{i+1}") for i in range(5)]  # u0->..->u5
    pairs += [("side", "u3"), ("one", "t")]
    got = {r["url"]: (r["final_url"], r["hops"], r["cyclic"])
           for r in resolve_redirects(_map(spark, pairs)).collect()}
    assert got["u0"] == ("u5", 5, False)
    assert got["u4"] == ("u5", 1, False)
    assert got["side"] == ("u5", 3, False)
    assert got["one"] == ("t", 1, False)


def test_long_chain_logarithmic(spark):
    # depth 60 >> any real chain; resolves well inside max_iter=20
    # pointer-jumping iterations (needs only ceil(log2(60)) = 6)
    pairs = [(f"c{i}", f"c{i+1}") for i in range(60)]
    got = {r["url"]: (r["final_url"], r["hops"])
           for r in resolve_redirects(_map(spark, pairs)).collect()}
    assert got["c0"] == ("c60", 60)
    assert got["c59"] == ("c60", 1)


@pytest.mark.parametrize("cycle_len", [1, 2, 3])
def test_cycles_flagged(spark, cycle_len):
    pairs = [(f"x{i}", f"x{(i + 1) % cycle_len}") for i in range(cycle_len)]
    pairs += [("into", "x0"), ("clean", "out")]
    got = {r["url"]: r for r in
           resolve_redirects(_map(spark, pairs), max_iter=6).collect()}
    for i in range(cycle_len):
        assert got[f"x{i}"]["cyclic"] is True
    assert got["into"]["cyclic"] is True
    assert got["clean"]["cyclic"] is False
    assert got["clean"]["final_url"] == "out"


def test_apply_redirects(spark):
    resolved = resolve_redirects(_map(spark, [
        ("a", "b"), ("b", "final"), ("loop", "loop")]))
    df = spark.createDataFrame(
        [("a", 1), ("final", 2), ("loop", 3), ("other", 4)],
        "url string, v int")
    got = sorted((r["url"], r["v"])
                 for r in apply_redirects(df, resolved).collect())
    # a rewrites to final (both rows survive), loop is dropped as
    # cyclic, other passes through untouched
    assert got == [("final", 1), ("final", 2), ("other", 4)]


def test_host_fold_rules_and_apply(spark):
    from data_crawler_spark.operators.redirects import (apply_host_folds,
                                                        host_fold_rules,
                                                        resolve_redirects)

    redirects = [
        # www alias: path-preserving, dominant -> folds
        ("http://www.a.com/1", "http://a.com/1"),
        ("http://www.a.com/2", "http://a.com/2"),
        ("http://www.a.com/3", "http://a.com/3"),
        # https upgrade on the same host -> scheme-only fold
        ("http://b.com/x", "https://b.com/x"),
        ("http://b.com/y", "https://b.com/y"),
        ("http://b.com/z", "https://b.com/z"),
        # parked host: everything to one landing page -> path test fails
        ("http://park.com/p1", "http://lander.com/home"),
        ("http://park.com/p2", "http://lander.com/home"),
        ("http://park.com/p3", "http://lander.com/home"),
        # split destinations -> dominance fails
        ("http://mix.com/1", "http://d1.com/1"),
        ("http://mix.com/2", "http://d1.com/2"),
        ("http://mix.com/3", "http://d2.com/3"),
        # chain: old.com -> www.a.com -> a.com resolves to the FINAL
        ("http://old.com/q1", "http://www.a.com/q1"),
        ("http://old.com/q2", "http://www.a.com/q2"),
        ("http://old.com/q3", "http://www.a.com/q3"),
    ]
    # complete the chain targets so resolution follows through
    redirects += [(f"http://www.a.com/q{i}", f"http://a.com/q{i}")
                  for i in (1, 2, 3)]
    df = spark.createDataFrame(redirects, "url string, redirect_to string")
    rules = host_fold_rules(resolve_redirects(df))
    got = {(r.src_scheme, r.src_host): (r.dst_scheme, r.dst_host)
           for r in rules.collect()}
    assert got == {
        ("http", "www.a.com"): ("http", "a.com"),
        ("http", "b.com"): ("https", "b.com"),
        ("http", "old.com"): ("http", "a.com"),   # chain-resolved
    }

    frontier = spark.createDataFrame(
        [("http://www.a.com/new?q=1",), ("http://b.com/fresh",),
         ("https://b.com/already",), ("http://park.com/p9",),
         ("http://other.com/u",)], "url string")
    out = sorted(r.url for r in
                 apply_host_folds(frontier, rules).collect())
    assert out == sorted([
        "http://a.com/new?q=1",        # path+query byte-preserved
        "https://b.com/fresh",
        "https://b.com/already",       # untouched (no https rule)
        "http://park.com/p9",          # parked host never folds
        "http://other.com/u",
    ])

    # layout invariance + validation
    r2 = {(r.src_scheme, r.src_host)
          for r in host_fold_rules(resolve_redirects(
              df.repartition(7))).collect()}
    assert r2 == set(got)
    with pytest.raises(ValueError):
        host_fold_rules(resolve_redirects(df), min_support=0)


def test_apply_host_folds_caller_column_collision(spark):
    """A frame already carrying dst_scheme/dst_host columns must fold
    without AMBIGUOUS_REFERENCE (rule columns are join-private)."""
    from data_crawler_spark.operators.redirects import apply_host_folds

    rules = spark.createDataFrame(
        [("http", "www.a.com", "https", "a.com", 3, 1.0, 1.0)],
        "src_scheme string, src_host string, dst_scheme string, "
        "dst_host string, support long, dominance double, "
        "path_frac double")
    df = spark.createDataFrame(
        [("http://www.a.com/p", "gopher", "weird.example")],
        "url string, dst_scheme string, dst_host string")
    got = apply_host_folds(df, rules).collect()[0]
    assert got.url == "https://a.com/p"
    # the caller's own columns survive untouched
    assert got.dst_scheme == "gopher" and got.dst_host == "weird.example"


def test_apply_host_folds_idempotent(spark):
    """Mined rules target FINAL hops (the miner runs on resolved
    chains), so folding is a projection: twice == once even when the
    evidence contained multi-hop chains."""
    from data_crawler_spark.operators.redirects import (apply_host_folds,
                                                        host_fold_rules,
                                                        resolve_redirects)

    redirects = [(f"http://old.com/p{i}", f"http://www.a.com/p{i}")
                 for i in range(3)] + \
                [(f"http://www.a.com/p{i}", f"https://a.com/p{i}")
                 for i in range(3)]
    df = spark.createDataFrame(redirects, "url string, redirect_to string")
    rules = host_fold_rules(resolve_redirects(df))
    frontier = spark.createDataFrame(
        [("http://old.com/new",), ("http://www.a.com/x",),
         ("https://a.com/y",)], "url string")
    once = apply_host_folds(frontier, rules)
    twice = apply_host_folds(once, rules)
    got_once = sorted(r.url for r in once.collect())
    assert got_once == sorted(r.url for r in twice.collect())
    # both alias tiers land directly on the final origin in ONE pass
    assert got_once == ["https://a.com/new", "https://a.com/x",
                        "https://a.com/y"]
