from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import SparkSession

from data_crawler_spark.sources.web import gen_tier

FIXTURE_CACHE = Path(__file__).resolve().parent.parent / ".fixtures_cache"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[8]")
        # one JVM serves the whole 540+-test suite; Spark's 1g default
        # driver heap OOMs near the end of the run from accumulated
        # session state (localCheckpoint/broadcast blocks awaiting the
        # async ContextCleaner) — an env limit, not a plan defect
        .config("spark.driver.memory", "6g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("data_crawler_spark-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def web1k() -> Path:
    return gen_tier(FIXTURE_CACHE, "web1k")


@pytest.fixture(scope="session")
def oracle1k(web1k):
    from oracle.crawler import OracleCrawler
    return OracleCrawler(web1k).run(max_rounds=8)


@pytest.fixture()
def tmp_state(tmp_path) -> Path:
    d = tmp_path / "state"
    d.mkdir()
    yield d
    shutil.rmtree(d, ignore_errors=True)
