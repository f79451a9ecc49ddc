"""Change-rate estimation + recrawl priority (operators/freshness.py).

Hand-computed Cho–Garcia-Molina values pin the estimator; plan test
pins the one-exchange shape."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.cdx import cdx_index
from data_crawler_spark.operators.freshness import (
    capture_intervals,
    change_rate,
    recrawl_priority,
)

T0 = datetime(2026, 8, 1)


def _hours(h):
    return T0 + timedelta(hours=h)


def _index(spark, rows):
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    return cdx_index(pages)


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        # fast: 4 intervals of 10h, digests a a b b c -> X=2
        *[("https://fast.com/", _hours(10 * i), d)
          for i, d in enumerate([b"a", b"a", b"b", b"b", b"c"])],
        # static: 4 intervals of 10h, never changes
        *[("https://static.com/", _hours(10 * i), b"s")
          for i in range(5)],
        # always-changing: 2 intervals of 1h, X=2 (X=n smoothing case)
        *[("https://hot.com/", _hours(i), d)
          for i, d in enumerate([b"p", b"q", b"r"])],
        # single capture: no interval, no estimate
        ("https://new.com/", _hours(0), b"n"),
    ]
    return _index(spark, rows)


def test_capture_intervals(idx):
    iv = {(r["url"], r["warc_ts"]): (r["interval_s"], r["changed"])
          for r in capture_intervals(idx).collect()}
    assert iv[("https://fast.com/", _hours(0))] == (None, None)
    assert iv[("https://fast.com/", _hours(10))] == (36000.0, False)
    assert iv[("https://fast.com/", _hours(20))] == (36000.0, True)
    assert iv[("https://new.com/", _hours(0))] == (None, None)


def test_change_rate_matches_hand_computation(idx):
    rates = {r["surt_key"]: r for r in change_rate(idx).collect()}

    fast = rates["com,fast)/"]
    assert (fast["n_intervals"], fast["n_changes"]) == (4, 2)
    assert fast["span_s"] == 4 * 36000.0
    # r = -ln((4-2+.5)/(4+.5)); lambda = r / 36000
    assert fast["lambda_per_s"] == pytest.approx(
        -math.log(2.5 / 4.5) / 36000.0, rel=1e-12)
    assert fast["url"] == "https://fast.com/"
    assert fast["last_ts"] == _hours(40)

    static = rates["com,static)/"]
    assert static["n_changes"] == 0
    assert static["lambda_per_s"] == pytest.approx(0.0, abs=1e-15)

    hot = rates["com,hot)/"]  # X == n stays finite via +0.5 smoothing
    assert (hot["n_intervals"], hot["n_changes"]) == (2, 2)
    assert hot["lambda_per_s"] == pytest.approx(
        -math.log(0.5 / 2.5) / 3600.0, rel=1e-12)

    new = rates["com,new)/"]
    assert new["n_intervals"] == 0 and new["n_changes"] == 0
    assert new["lambda_per_s"] is None and new["span_s"] is None


def test_recrawl_priority_ordering(idx):
    now = _hours(48)
    pri = {r["surt_key"]: r["p_changed"]
           for r in recrawl_priority(change_rate(idx), now).collect()}
    # hot last seen 2h->46h stale at huge lambda ~= certain change;
    # fast is moderately stale; static is exactly 0 however stale.
    assert pri["com,hot)/"] > pri["com,fast)/"] > pri["com,static)/"]
    assert pri["com,static)/"] == pytest.approx(0.0, abs=1e-15)
    # single-capture key ages in on the 1/day prior: 48h stale
    assert pri["com,new)/"] == pytest.approx(
        1.0 - math.exp(-(1.0 / 86400.0) * 48 * 3600), rel=1e-9)
    # probabilities, not scores
    assert all(0.0 <= p <= 1.0 for p in pri.values())


def test_recrawl_priority_monotone_in_age(idx):
    rates = change_rate(idx)
    early = {r["surt_key"]: r["p_changed"]
             for r in recrawl_priority(rates, _hours(41)).collect()}
    late = {r["surt_key"]: r["p_changed"]
            for r in recrawl_priority(rates, _hours(90)).collect()}
    for k, p in early.items():
        assert late[k] >= p


def test_change_rate_single_exchange(idx):
    """The lag window and the per-key aggregate share one hash
    exchange on surt_key (the cdx_index sort adds its range exchange
    upstream)."""
    plan = (change_rate(idx)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1


def test_sitemap_staleness(spark):
    from data_crawler_spark.operators.freshness import sitemap_staleness
    entries = spark.createDataFrame(
        [("http://a.test/new", "2026-05-01 00:00:00"),
         ("http://a.test/old", "2026-01-01 00:00:00"),
         ("http://a.test/unseen", "2026-01-01 00:00:00"),
         ("http://a.test/noclaim", None)],
        "url string, lastmod string").withColumn(
        "lastmod", F.col("lastmod").cast("timestamp"))
    captures = spark.createDataFrame(
        [("http://a.test/new", "2026-03-01 00:00:00"),
         ("http://a.test/new", "2026-02-01 00:00:00"),
         ("http://a.test/old", "2026-03-01 00:00:00"),
         ("http://a.test/noclaim", "2026-03-01 00:00:00")],
        "url string, warc_ts string").withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp"))
    got = {r.url: r.stale
           for r in sitemap_staleness(entries, captures).collect()}
    assert got == {"http://a.test/new": True,      # lastmod > capture
                   "http://a.test/old": False,     # captured after claim
                   "http://a.test/unseen": True,   # never captured
                   "http://a.test/noclaim": False}  # no claim, captured


def test_conditional_fetch_plan(spark):
    from datetime import datetime, timezone

    from data_crawler_spark.operators.freshness import (
        conditional_fetch_plan)

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M").replace(
            tzinfo=timezone.utc)

    rows = [
        # url A: two captures; latest carries etag + server claim
        ("http://a.test/", ts("2026-01-01 00:00"), None, None),
        ("http://a.test/", ts("2026-02-01 00:00"), '"v2"',
         ts("2026-01-31 12:00")),
        # url B: latest capture has NO validators -> fall back to
        # capture ts, null etag
        ("http://b.test/", ts("2026-01-10 00:00"), '"old"',
         ts("2026-01-09 00:00")),
        ("http://b.test/", ts("2026-03-01 00:00"), None, None),
        # url C: single capture
        ("http://c.test/", ts("2026-02-15 08:30"), None, None),
    ]
    caps = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, etag string, "
              "last_modified timestamp")
    got = {r["url"]: r for r in conditional_fetch_plan(
        caps, etag_col="etag", last_modified_col="last_modified")
        .collect()}
    assert len(got) == 3
    a = got["http://a.test/"]
    assert a["last_capture"] == ts("2026-02-01 00:00").replace(tzinfo=None)
    assert a["if_none_match"] == '"v2"'
    assert a["if_modified_since"] == ts("2026-01-31 12:00").replace(
        tzinfo=None)
    b = got["http://b.test/"]
    assert b["if_none_match"] is None
    # server claim missing on the LATEST capture -> our capture time
    assert b["if_modified_since"] == b["last_capture"] == ts(
        "2026-03-01 00:00").replace(tzinfo=None)
    c = got["http://c.test/"]
    assert c["if_modified_since"] == ts("2026-02-15 08:30").replace(
        tzinfo=None)

    # validator-less capture table: optional columns default off
    bare = conditional_fetch_plan(caps.select("url", "warc_ts"))
    r = {x["url"]: x for x in bare.collect()}["http://a.test/"]
    assert r["if_none_match"] is None
    assert r["if_modified_since"] == r["last_capture"]

    # layout invariance (ties + partitioning)
    re = {x["url"]: x for x in conditional_fetch_plan(
        caps.repartition(7), etag_col="etag",
        last_modified_col="last_modified").collect()}
    assert re == got


# ------------------------------------------- HTTP cache directives

def test_cache_directives_parse(spark):
    from data_crawler_spark.operators.freshness import cache_directives_col

    rows = [
        ("a", "HTTP/1.1 200 OK\nCache-Control: public, max-age=300\nAge: 50\n"),
        ("b", "Cache-Control: s-maxage=999\n"),           # shared-cache only
        ("c", "Cache-Control: no-store\nExpires: Mon, 12 Aug 2026 10:00:00 GMT\n"),
        ("d", "Expires: 0\n"),                            # unparsable Expires
        ("e", 'Cache-Control: max-age="60", no-cache\n'),
        ("f", "X-Other: 1\n"),
    ]
    df = spark.createDataFrame(rows, "id string, headers string")
    got = {r.id: r.d.asDict() for r in df.select(
        "id", cache_directives_col(F.col("headers")).alias("d")).collect()}
    assert got["a"]["max_age"] == 300 and got["a"]["age"] == 50
    assert not got["a"]["no_store"] and not got["a"]["no_cache"]
    assert got["b"]["max_age"] is None                    # s-maxage ignored
    assert got["c"]["no_store"] and got["c"]["had_expires"]
    assert str(got["c"]["expires"]) == "2026-08-12 10:00:00"
    assert got["d"]["expires"] is None and got["d"]["had_expires"]
    assert got["e"]["max_age"] == 60 and got["e"]["no_cache"]
    assert got["f"]["max_age"] is None and not got["f"]["had_expires"]


def test_revalidation_schedule(spark):
    from datetime import datetime

    from data_crawler_spark.operators.freshness import revalidation_schedule

    t0 = datetime(2026, 8, 1, 12, 0, 0)
    t1 = datetime(2026, 8, 2, 12, 0, 0)
    rows = [
        # latest capture wins: the t1 row's policy applies
        ("u1", t0, "Cache-Control: max-age=10\n"),
        ("u1", t1, "Cache-Control: max-age=300\nAge: 50\n"),
        ("u2", t1, "Cache-Control: no-store\n"),
        ("u3", t1, "Expires: Mon, 03 Aug 2026 00:00:00 GMT\n"),
        ("u4", t1, "Expires: 0\n"),
        ("u5", t1, "X-Other: 1\n"),
        ("u6", t1, "Expires: Mon, 01 Jan 2001 00:00:00 GMT\n"),  # in the past
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, headers string")
    got = {r.url: r for r in revalidation_schedule(df).collect()}
    assert str(got["u1"].fresh_until) == "2026-08-02 12:04:10"   # +250s
    assert got["u2"].fresh_until == t1                           # no-store
    assert str(got["u3"].fresh_until) == "2026-08-03 00:00:00"
    assert got["u4"].fresh_until == t1                           # bad Expires
    assert got["u5"].fresh_until == t1                           # no policy
    # an Expires in the past never schedules a fetch before capture
    assert got["u6"].revalidate_from == t1
    assert all(r.revalidate_from >= r.last_capture for r in got.values())


def test_revalidation_same_ts_tie_and_session_tz(spark):
    from datetime import datetime

    from data_crawler_spark.operators.freshness import revalidation_schedule

    t1 = datetime(2026, 8, 2, 12, 0, 0)
    # two captures with the SAME timestamp but conflicting policies:
    # the pick must be a function of the data (struct tie-break), not
    # of which partition max_by scans last
    rows = [
        ("u1", t1, "Cache-Control: no-store\n"),
        ("u1", t1, "Cache-Control: max-age=3600\n"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, headers string")
    picks = {
        str(revalidation_schedule(df.repartition(n)).collect()[0]
            .fresh_until)
        for n in (1, 2, 7)
    }
    assert len(picks) == 1, picks

    # Expires must parse as GMT regardless of the session timezone —
    # 'zzz' in the pattern, not a literal shifted into session-local
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df2 = spark.createDataFrame(
            [("u3", t1, "Expires: Mon, 03 Aug 2026 10:00:00 GMT\n")],
            "url string, warc_ts timestamp, headers string")
        got = revalidation_schedule(df2).select(
            F.col("fresh_until").cast("string").alias("s")).collect()[0]
        # session tz is EDT (UTC-4): 10:00 GMT renders as 06:00 — the
        # old 'GMT'-literal pattern would have read the wall clock as
        # Eastern and rendered 10:00 (epoch shifted +4h)
        assert got.s == "2026-08-03 06:00:00"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_cache_control_multiple_lines_combine(spark):
    """RFC 9110 §5.3: repeated Cache-Control lines combine — a CDN
    appending its own line must not make the origin's vanish."""
    from datetime import datetime

    from data_crawler_spark.operators.freshness import revalidation_schedule

    t1 = datetime(2026, 8, 2, 12, 0, 0)
    rows = [
        ("u1", t1, "Cache-Control: public\nCache-Control: no-store\n"),
        ("u2", t1, "Cache-Control: public\nCache-Control: max-age=300\n"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, headers string")
    got = {r.url: r for r in revalidation_schedule(df).collect()}
    assert got["u1"].fresh_until == t1              # no-store honored
    assert str(got["u2"].fresh_until) == "2026-08-02 12:05:00"


def test_capture_change_fraction(spark):
    """change_frac is 0 for identical consecutive captures, ~1 for a
    full rewrite, null for first captures / sub-shingle text, and
    EXACTLY the independent per-capture signature agreement (pinning
    the join + window wiring); layout-invariant."""
    from data_crawler_spark.operators.dedup import minhash_signatures
    from data_crawler_spark.operators.freshness import (
        capture_change_fraction)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "crawler records every capture of the page text today")
    half = ("the quick brown fox jumps over the lazy dog while a "
            "totally different second half replaces the old ending "
            "entirely now")
    other = ("completely unrelated replacement content with none of "
             "the previous words remaining anywhere in this document "
             "at all whatsoever")
    rows = [
        ("com,a)/", "http://a.com/", "2024-01-01 00:00:00", base),
        ("com,a)/", "http://a.com/", "2024-01-02 00:00:00", base),
        ("com,a)/", "http://a.com/", "2024-01-03 00:00:00", half),
        ("com,a)/", "http://a.com/", "2024-01-04 00:00:00", other),
        ("com,b)/", "http://b.com/", "2024-01-01 00:00:00", base),
        ("com,c)/", "http://c.com/", "2024-01-01 00:00:00", "too short"),
        ("com,c)/", "http://c.com/", "2024-01-02 00:00:00", base),
        # duplicate capture identity with DIFFERENT payloads: collapses
        # deterministically to the lexicographically greatest text
        # (base > other here), so the next capture scores 0 change
        ("com,d)/", "http://d.com/", "2024-01-01 00:00:00", base),
        ("com,d)/", "http://d.com/", "2024-01-01 00:00:00", other),
        ("com,d)/", "http://d.com/", "2024-01-02 00:00:00", base),
    ]
    df = (spark.createDataFrame(
        rows, "surt_key string, url string, warc_ts string, text string")
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp")))

    out_rows = capture_change_fraction(df.repartition(5)).collect()
    # SLIM contract: identity + change_frac only, one row per capture
    # identity (the com,d duplicate collapsed)
    assert set(out_rows[0].asDict()) == {"surt_key", "warc_ts", "url",
                                         "change_frac"}
    assert len(out_rows) == len(rows) - 1
    got = {(r.surt_key, str(r.warc_ts)): r.change_frac for r in out_rows}
    assert got[("com,d)/", "2024-01-02 00:00:00")] == 0.0
    # first capture of each key: null
    assert got[("com,a)/", "2024-01-01 00:00:00")] is None
    assert got[("com,b)/", "2024-01-01 00:00:00")] is None
    # identical consecutive captures: exactly 0
    assert got[("com,a)/", "2024-01-02 00:00:00")] == 0.0
    # full rewrite: (almost) every component disagrees
    assert got[("com,a)/", "2024-01-04 00:00:00")] > 0.9
    # partial rewrite sits strictly between
    frac_half = got[("com,a)/", "2024-01-03 00:00:00")]
    assert 0.05 < frac_half < 0.95
    # sub-shingle first capture -> no signature -> next capture null
    assert got[("com,c)/", "2024-01-01 00:00:00")] is None
    assert got[("com,c)/", "2024-01-02 00:00:00")] is None

    # exactness: the fraction equals the independently computed
    # signature disagreement for the consecutive pair
    caps = {str(r[2]): r[3] for r in rows if r[0] == "com,a)/"}
    sig_df = spark.createDataFrame(
        [(ts, t) for ts, t in caps.items()], "cid string, text string")
    sigs = {r.cid: r.sig for r in
            minhash_signatures(sig_df, id_col="cid").collect()}
    ts_sorted = sorted(caps)
    for prev_ts, ts in zip(ts_sorted, ts_sorted[1:]):
        agree = sum(a == b for a, b in zip(sigs[prev_ts], sigs[ts]))
        assert got[("com,a)/", ts)] == pytest.approx(1.0 - agree / 64)

    # layout invariance
    again = {(r.surt_key, str(r.warc_ts)): r.change_frac
             for r in capture_change_fraction(df.repartition(1)).collect()}
    assert again == got


# ---------------------------------------------------------------------------
# recrawl_candidates (freshness -> scheduler seam)
# ---------------------------------------------------------------------------

def test_recrawl_candidates_shape_and_boost(spark, idx):
    from data_crawler_spark.operators.freshness import recrawl_candidates

    now = _hours(48)
    base = {r["url"]: r for r in
            recrawl_candidates(idx, now).collect()}
    pri = {r["url"]: r["p_changed"]
           for r in recrawl_priority(change_rate(idx), now).collect()}
    assert set(base) == set(pri)
    for url, r in base.items():
        assert r["priority"] == pytest.approx(pri[url], rel=1e-12)
        assert r["depth"] == 0 and r["discovered_round"] == 0
        assert url.startswith(f"https://{r['host']}/")

    # publisher-claimed staleness lifts priority to the floor; other
    # rows are untouched; a measured p above the floor would win
    stale = spark.createDataFrame(
        [("https://static.com/", True), ("https://fast.com/", False)],
        "url string, stale boolean")
    boosted = {r["url"]: r["priority"] for r in
               recrawl_candidates(idx, now, sitemap=stale,
                                  stale_priority=0.9).collect()}
    assert boosted["https://static.com/"] == pytest.approx(0.9)
    assert boosted["https://fast.com/"] == pytest.approx(
        pri["https://fast.com/"], rel=1e-12)
    assert boosted["https://hot.com/"] == pytest.approx(
        pri["https://hot.com/"], rel=1e-12)
    # hot's measured p (~1) beats a low floor
    stale_hot = spark.createDataFrame([("https://hot.com/", True)],
                                      "url string, stale boolean")
    b2 = {r["url"]: r["priority"] for r in
          recrawl_candidates(idx, now, sitemap=stale_hot,
                             stale_priority=0.1).collect()}
    assert b2["https://hot.com/"] == pytest.approx(
        pri["https://hot.com/"], rel=1e-12)


def test_recrawl_candidates_feed_scheduler(spark):
    from data_crawler_spark.operators.freshness import recrawl_candidates
    from data_crawler_spark.operators.scheduler import schedule_per_host

    # two urls on ONE host with different change histories: budget 1
    # must pick the faster-changing page
    rows = [
        *[(f"https://multi.com/fast", _hours(i), d)
          for i, d in enumerate([b"a", b"b", b"c"])],
        *[(f"https://multi.com/slow", _hours(10 * i), b"s")
          for i in range(3)],
    ]
    cands = recrawl_candidates(_index(spark, rows), _hours(30))
    hosts = spark.createDataFrame([("multi.com", 1)],
                                  "host string, budget_per_round int")
    got = schedule_per_host(cands, hosts).collect()
    assert [r["url"] for r in got] == ["https://multi.com/fast"]


def test_recrawl_candidates_duplicate_sitemap_rows(spark, idx):
    # the same url listed in two sitemap files yields ONE candidate
    # row, not a double-fetch of the host's politeness budget
    from data_crawler_spark.operators.freshness import recrawl_candidates

    now = _hours(48)
    stale = spark.createDataFrame(
        [("https://static.com/", True), ("https://static.com/", True)],
        "url string, stale boolean")
    cands = recrawl_candidates(idx, now, sitemap=stale,
                               stale_priority=0.9)
    urls = [r["url"] for r in cands.collect()]
    assert len(urls) == len(set(urls))
    boosted = {r["url"]: r["priority"] for r in cands.collect()}
    assert boosted["https://static.com/"] == pytest.approx(0.9)
