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
