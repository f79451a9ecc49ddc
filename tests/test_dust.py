"""DUST param-rule mining: hand-built evidence with known-irrelevant
(session id) and known-relevant (page) params, conservative-threshold
behavior, and the rewrite's byte-level guarantees."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.dust import (apply_param_rules,
                                               mine_param_rules)

# content hash depends ONLY on (path, id): sess/utm never matter,
# page always matters.
CAPTURES = [
    # two witness groups for sess on a.com (id=1 and id=2 residuals)
    ("http://a.com/p?id=1&sess=x", 11),
    ("http://a.com/p?id=1&sess=y", 11),
    ("http://a.com/p?id=2&sess=x", 22),
    ("http://a.com/p?sess=z&id=2", 22),      # order must not matter
    # one witness group for utm on a.com -> below min_support=2
    ("http://a.com/q?utm=aa", 33),
    ("http://a.com/q?utm=bb", 33),
    # page VARIES content: conflict evidence, never a rule
    ("http://a.com/l?page=1", 44),
    ("http://a.com/l?page=2", 55),
    ("http://a.com/m?page=1", 66),
    ("http://a.com/m?page=2", 77),
    # same param name on another host: rules are per-host
    ("http://b.com/p?sess=1", 88),
    ("http://b.com/p?sess=2", 99),
]


@pytest.fixture(scope="module")
def caps(spark):
    return spark.createDataFrame(CAPTURES, "url string, content_hash long")


def test_mine_rules_exact(spark, caps):
    got = {(r.host, r.param): (r.support, r.conflicts)
           for r in mine_param_rules(caps, min_support=2).collect()}
    assert got == {("a.com", "sess"): (2, 0)}
    # min_support=1 lets the single-group utm rule through, and b.com's
    # sess (its two values CHANGED the hash -> one conflict group, no
    # support) still never fires
    low = {(r.host, r.param)
           for r in mine_param_rules(caps, min_support=1).collect()}
    assert low == {("a.com", "sess"), ("a.com", "utm")}


def test_mine_conflict_tolerance_and_layout(spark, caps):
    # page has 0 support / 2 conflict groups: even a loose conflict
    # budget cannot create support that isn't there
    loose = {(r.host, r.param) for r in
             mine_param_rules(caps, min_support=1,
                              max_conflict_frac=0.9).collect()}
    assert ("a.com", "page") not in loose
    # partition layout must not change the mined set
    for n in (1, 3, 8):
        got = {(r.host, r.param) for r in
               mine_param_rules(caps.repartition(n),
                                min_support=2).collect()}
        assert got == {("a.com", "sess")}

    with pytest.raises(ValueError):
        mine_param_rules(caps, min_support=0)
    with pytest.raises(ValueError):
        mine_param_rules(caps, max_conflict_frac=1.0)


def test_mixed_hash_same_value_is_not_support(spark):
    # the SAME sess value fetched twice with different content (page
    # changed between captures) is not an informative group: n_vals==1
    rows = [("http://c.com/p?sess=x", 1), ("http://c.com/p?sess=x", 2)]
    df = spark.createDataFrame(rows, "url string, content_hash long")
    assert mine_param_rules(df, min_support=1).count() == 0


def test_apply_rules_rewrite(spark, caps):
    rules = mine_param_rules(caps, min_support=2)
    out = {r.url: r.rewritten for r in
           apply_param_rules(caps, rules, out_col="rewritten").collect()}
    # sess stripped on a.com, other params and their order preserved
    assert out["http://a.com/p?id=1&sess=x"] == "http://a.com/p?id=1"
    assert out["http://a.com/p?sess=z&id=2"] == "http://a.com/p?id=2"
    # page/utm untouched; b.com untouched (no rules for that host)
    assert out["http://a.com/l?page=1"] == "http://a.com/l?page=1"
    assert out["http://a.com/q?utm=aa"] == "http://a.com/q?utm=aa"
    assert out["http://b.com/p?sess=1"] == "http://b.com/p?sess=1"
    # rewrite collapses the frontier: the two sess variants of id=1
    # become one distinct URL
    n = (apply_param_rules(caps, rules)
         .select("url").distinct().count())
    assert n == len({u for u, _ in CAPTURES}) - 2


def test_apply_edge_shapes(spark, caps):
    rules = mine_param_rules(caps, min_support=2)
    rows = [
        ("http://a.com/p",),                   # no query
        ("http://a.com/p?sess=1",),            # query empties entirely
        ("http://a.com/p?sess=1&sess=2&id=3",),  # duplicate keys
        ("http://a.com/p?sess",),              # bare flag form
        ("http://a.com/p?id=a%26b&sess=1",),   # encoded & stays opaque
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r.url for r in apply_param_rules(df, rules).collect()]
    assert got == [
        "http://a.com/p",
        "http://a.com/p",
        "http://a.com/p?id=3",
        "http://a.com/p",
        "http://a.com/p?id=a%26b",
    ]
    # empty rule table: everything passes through byte-identical
    empty = rules.filter(F.lit(False))
    same = [r.url for r in apply_param_rules(caps, empty).collect()]
    assert sorted(same) == sorted(u for u, _ in CAPTURES)


def test_dust_plan_shape(spark, caps):
    from tests.test_plans import plan_str

    rules = mine_param_rules(caps, min_support=2)
    p = plan_str(rules, "simple")
    # all-native column work: no Python stage anywhere in the mine
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # exactly the two contracted shuffles: (host,param,residual) then
    # (host,param) — min/max form, so no countDistinct Expand either
    assert p.count("Exchange hashpartitioning") == 2
    assert "Expand" not in p
    assert "partial_" in plan_str(rules, "formatted")

    a = plan_str(apply_param_rules(caps, rules))
    assert "BatchEvalPython" not in a and "ArrowEvalPython" not in a
    # the rewrite joins the rule table broadcast — the capture stream
    # itself must never hash-shuffle on the join key
    assert "BroadcastHashJoin" in a


def test_apply_rules_idempotent(spark, caps):
    """A frontier rewrite must be a projection: applying the mined
    rules twice equals once (the crawler re-canonicalizes URLs every
    round, so a non-idempotent rewrite would drift keys forever)."""
    rules = mine_param_rules(caps, min_support=2)
    once = apply_param_rules(caps.select("url"), rules)
    twice = apply_param_rules(once, rules)
    assert sorted(r.url for r in once.collect()) \
        == sorted(r.url for r in twice.collect())
