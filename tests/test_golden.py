"""Golden-file regression (SURVEY.md §5.6): the SPARK engine's output
matches the committed oracle-produced goldens — guards against silent
drift in either the generator, the spec functions, or the engine.
Regenerate only via `python tools/make_golden.py`."""

import json
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"


@pytest.fixture(scope="module")
def golden():
    p = GOLDEN_DIR / "web1k.json"
    if not p.exists():
        pytest.skip("golden file not generated yet")
    return json.loads(p.read_text())


@pytest.fixture(scope="module")
def crawl(spark, web1k, tmp_path_factory, golden):
    from data_crawler_spark.plans.crawl import run_crawl
    return run_crawl(spark, web1k, tmp_path_factory.mktemp("golden_state"),
                     max_rounds=golden["max_rounds"])


def test_first_100_visits(crawl, golden):
    from data_crawler_spark.plans.crawl import visit_order_df
    got = [[r.round, r.url] for r in
           visit_order_df(crawl["ctx"]).limit(100).collect()]
    assert got == golden["first_100_visits"]


def test_scheduled_per_round(crawl, golden):
    import pyspark.sql.functions as F
    rows = (crawl["ctx"].scheduled.read().groupBy("round")
            .agg(F.count("*").alias("n")).orderBy("round").collect())
    assert [r.n for r in rows] == golden["scheduled_per_round"]


def test_seen_digest(crawl, golden):
    from data_crawler_spark.functions.hashing import xxhash64_str
    seen = sorted(r.url for r in crawl["ctx"].seen.read().select("url").collect())
    acc = 0
    for u in seen:
        acc ^= xxhash64_str(u)
    assert len(seen) == golden["seen_count"]
    assert acc == golden["seen_xxhash64_xor_digest"]
