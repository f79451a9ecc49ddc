"""The fetch Transport seam (plans/crawl.py): the crawl loop must be
deployable against a live web by swapping ONE method — fetch(sched) ->
pages — with zero round/commit/dedup logic changes.

Proof: the full exactness contract (visit order, seen set, extracted
bytes) holds under a fake HTTP transport that delivers pages through a
mapInPandas "response" stage instead of the page-store join, and the
politeness contract is visible AT the seam — no fetch call ever asks a
host for more URLs in one round than its budget."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.links import host_col
from data_crawler_spark.plans.crawl import (
    FETCH_COLS,
    PageStoreTransport,
    Transport,
    run_crawl,
    visit_order_df,
)

MAX_ROUNDS = 8


class FakeHttpTransport(Transport):
    """HTTP-shaped test transport: pages are delivered by a batched
    mapInPandas stage keyed on url (the shape an aiohttp-pool
    implementation would have — each batch is one 'connection pool'
    worth of requests), served from an in-memory response map instead
    of sockets. Records every call's per-host request counts so tests
    can assert the politeness contract at the seam."""

    def __init__(self, spark, web_dir):
        pdf = (spark.read.parquet(str(web_dir / "pages.parquet"))
               .drop("text").toPandas())
        self._responses = spark.sparkContext.broadcast(
            pdf.set_index("url", drop=False))
        self.calls: list[dict[str, int]] = []

    def fetch(self, sched: DataFrame) -> DataFrame:
        # driver-side politeness audit (test instrumentation — the
        # skinny sched slice is tiny; a real transport would not
        # collect)
        hosts = (sched.select(host_col(F.col("url")).alias("h"))
                 .groupBy("h").count().collect())
        self.calls.append({r["h"]: int(r["count"]) for r in hosts})
        responses = self._responses

        def serve(batches):
            for pdf in batches:
                hit = pdf["url"].isin(responses.value.index)
                if not hit.any():
                    continue
                got = responses.value.loc[pdf["url"][hit]]
                out = pd.DataFrame({
                    "url": got["url"].to_numpy(),
                    "depth": pdf["depth"][hit].to_numpy(),
                    "warc_ts": got["warc_ts"].to_numpy(),
                    "lang": got["lang"].to_numpy(),
                    "html": got["html"].to_numpy(),
                })
                yield out

        return sched.mapInPandas(
            serve, "url string, depth int, warc_ts timestamp, "
                   "lang string, html binary")


@pytest.fixture(scope="module")
def http_result(spark, web1k, tmp_path_factory):
    t = FakeHttpTransport(spark, web1k)
    state = tmp_path_factory.mktemp("http_state")
    res = run_crawl(spark, web1k, state, max_rounds=MAX_ROUNDS,
                    transport=t)
    res["transport"] = t
    return res


def test_http_transport_exactness(http_result, oracle1k):
    """The entire equivalence contract holds with fetch replaced."""
    got = [(r["round"], r["url"])
           for r in visit_order_df(http_result["ctx"]).collect()]
    assert got == oracle1k.visit_order
    seen = {r["url"] for r in http_result["ctx"].seen.read().collect()}
    assert seen == oracle1k.seen
    ext = {r["url"]: r["text"] for r in
           http_result["ctx"].extracted.read()
           .select("url", "text").collect()}
    assert ext == oracle1k.extracted


def test_politeness_budget_at_the_seam(http_result, spark, web1k):
    """No fetch call ever requests more URLs for a host in one round
    than that host's per-round budget — the transport sees politeness
    already enforced, so an HTTP implementation needs no own limiter
    beyond per-batch pacing."""
    t = http_result["transport"]
    assert len(t.calls) >= 3  # one call per non-empty round
    budgets = {r["host"]: int(r["budget_per_round"]) for r in
               spark.read.parquet(str(web1k / "hosts.parquet")).collect()}
    default = max(budgets.values())
    for call in t.calls:
        assert call  # never an empty fetch
        for host, n in call.items():
            assert n <= budgets.get(host, default), (host, n)


def test_default_transport_is_page_store(spark, web1k, tmp_path):
    """open_crawl with no transport builds PageStoreTransport and the
    plan keeps its broadcast shape (html never shuffles)."""
    from data_crawler_spark.plans.crawl import open_crawl

    ctx = open_crawl(spark, web1k, tmp_path / "s")
    assert isinstance(ctx.transport, PageStoreTransport)
    sched = ctx.frontier.read().select("url", "depth").limit(5)
    df = ctx.transport.fetch(sched)
    assert df.columns == FETCH_COLS
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "html" not in line
