"""Value-level bound checks for the rows-only ANN entry (sim02_03):
recall vs brute force stays approximate by design (property-tested in
test_similarity.py), but every pair the ANN paths DO emit must carry an
exact cosine and a rank consistent with those cosines. The oracle is a
DuckDB full-pairs cosine over the same fixture embeddings (cast to
DOUBLE[] — Spark accumulates float32 products in float64, so the two
engines agree to ~1e-6 on round-6 values; the assertion bound is the
measured cross-engine float noise, not a semantic slack)."""

import duckdb
import pytest

EMB = "/root/testdata/sf0.001/embeddings.parquet"

# Spark multiplies the raw float32 components and folds in float64;
# DuckDB's DOUBLE[] oracle promotes before multiplying. On unit-scale
# cosines the divergence is bounded by dim * eps_f32 ~ 4e-6.
CROSS_ENGINE_TOL = 5e-6


@pytest.fixture(scope="module")
def oracle_cosines() -> dict:
    rows = duckdb.sql(f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM read_parquet('{EMB}'))
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cos
        FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id != c.vec_id
    """).fetchall()
    return {(a, b): c for a, b, c in rows}


def _check_values_and_ranks(emitted, oracle, k):
    """(a) every emitted cosine matches the oracle pairwise cosine;
    (b) per query: ranks are 1..n contiguous, cosine non-increasing,
    ties broken by ascending neighbor_id; (c) no self-pairs."""
    assert emitted, "ANN must surface neighbors at fixture scale"
    by_query: dict = {}
    for r in emitted:
        assert r.query_id != r.neighbor_id
        assert (r.query_id, r.neighbor_id) in oracle
        want = oracle[(r.query_id, r.neighbor_id)]
        assert abs(r.cosine - want) <= CROSS_ENGINE_TOL, (
            r.query_id, r.neighbor_id, r.cosine, want)
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1)), qid
        assert len(rows) <= k
        for prev, cur in zip(rows, rows[1:]):
            assert (prev.cosine > cur.cosine
                    or (prev.cosine == cur.cosine
                        and prev.neighbor_id < cur.neighbor_id)), (
                qid, prev, cur)


def test_lsh_topk_values_exact_vs_duckdb(spark, oracle_cosines):
    from data_crawler_spark.operators.similarity import lsh_topk

    e = spark.read.parquet(EMB)
    got = lsh_topk(e, e.filter("vec_id < 10"), k=5, dim=64).collect()
    _check_values_and_ranks(got, oracle_cosines, k=5)


def test_ivf_topk_values_exact_vs_duckdb(spark, oracle_cosines):
    from data_crawler_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(EMB)
    got = ivf_topk(e, e.filter("vec_id < 10"), k=5,
                   n_lists=16, n_probe=4).collect()
    _check_values_and_ranks(got, oracle_cosines, k=5)
