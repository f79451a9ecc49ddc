"""jusText-style boilerplate removal (operators/boilerplate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_crawler_spark.operators.boilerplate import (
    html_blocks,
    main_text,
    segment_blocks,
)

# one sentence ~80 chars, stopword density 13/21 = 0.62 >= 0.32
SENT = ("the quick fox and the lazy dog go to the park in the rain "
        "and it is a joy of it ")
GOOD = (SENT * 4).strip()        # > 200 chars -> context-free good
NEARGOOD = SENT.strip()          # 70..200 chars -> context-free neargood
PAGE = (
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script>var x = 'the the the the hidden script text';</script>"
    "</head><body>"
    '<div class="nav"><a href="/a">Home</a> <a href="/b">About</a> '
    '<a href="/c">Contact</a></div>'
    "<h2>Latest race results</h2>"
    f"<p>{GOOD}</p>"
    "<h3>More results</h3>"
    f"<p>{GOOD}</p>"
    f"<p>{NEARGOOD}</p>"
    "<footer>copyright 2026 example.com rights reserved</footer>"
    "</body></html>"
)


def test_segment_blocks_classification():
    blocks = segment_blocks(PAGE)
    by_text = {b["block_text"]: b for b in blocks}
    # script/style bodies are gone entirely
    assert not any("hidden script" in t for t in by_text)
    nav = by_text["Home About Contact"]
    # 16 of 18 chars are anchor text ("Home"+"About"+"Contact")
    assert nav["label"] == "bad" and nav["link_density"] > 0.8
    assert by_text[GOOD]["label"] == "good"
    assert by_text[NEARGOOD]["label"] == "neargood"
    assert by_text["More results"]["label"] == "short"
    # context pass: heading between two goods -> good; heading after
    # bad nav -> bad; neargood adjacent to good -> good; trailing
    # short footer (good left, boundary right) -> bad
    assert by_text["More results"]["final"] == "good"
    assert by_text["Latest race results"]["final"] == "bad"
    assert by_text[NEARGOOD]["final"] == "good"
    assert by_text["copyright 2026 example.com rights reserved"]["final"] \
        == "bad"
    assert by_text[GOOD]["final"] == "good"
    # block_idx is the document order
    assert [b["block_idx"] for b in blocks] == list(range(len(blocks)))


def test_main_text(spark):
    df = spark.createDataFrame(
        [("u1", PAGE.encode()), ("u2", b"<p>tiny</p>"), ("u3", None)],
        "url string, html binary")
    rows = {r["url"]: r["main_text"]
            for r in main_text(df).select("url", "main_text").collect()}
    assert rows["u1"] == "\n\n".join(
        [GOOD, "More results", GOOD, NEARGOOD])
    assert rows["u2"] == ""      # nothing survives -> empty, not null
    assert rows["u3"] is None    # null html stays null


def test_html_blocks_matches_pure_function(spark):
    df = spark.createDataFrame([("u1", PAGE.encode())],
                               "url string, html binary")
    got = [r.asDict() for r in
           html_blocks(df).orderBy("block_idx").collect()]
    want = [{"url": "u1", **b} for b in segment_blocks(PAGE)]
    assert got == want


def test_plans_no_exchange(spark):
    df = spark.createDataFrame([("u", PAGE.encode())],
                               "url string, html binary")
    for op in (main_text(df), html_blocks(df)):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_params_threaded_through(spark):
    # raising length_low past GOOD's size demotes everything
    df = spark.createDataFrame([("u", PAGE.encode())],
                               "url string, html binary")
    out = main_text(df, length_low=10_000).select("main_text").first()[0]
    assert out == ""
    # and str html (already-decoded pages) is accepted
    df2 = spark.createDataFrame([("u", PAGE)], "url string, html string")
    assert main_text(df2).select("main_text").first()[0] != ""


def test_string_accumulation_counts(spark):
    # a page whose anchors sit inside an otherwise-good block: link
    # density dilutes below the cutoff and the block stays good
    mixed = f"<p>{GOOD} <a href='/x'>tiny link</a></p>"
    b = segment_blocks(mixed)
    assert len(b) == 1 and b[0]["final"] == "good"
    assert 0.0 < b[0]["link_density"] < 0.2


def test_ordinary_prose_survives_default_stoplist():
    """The published 0.30/0.32 stop-density thresholds assume a full
    function-word stoplist: ordinary English prose (no stopword
    stuffing) must classify good under the defaults — the 8-word list
    scored it ~0.17 and stripped real content."""
    from data_crawler_spark.operators.boilerplate import segment_blocks

    prose = ("<p>Training-data pipelines strip that boilerplate before "
             "dedup and quality scoring, otherwise template text "
             "dominates the near-dup signatures and the survivors keep "
             "nav noise. This paragraph is plain technical English "
             "with no artificial stopword stuffing at all, and it is "
             "long enough to clear the high length threshold that the "
             "published defaults use for confident classification of "
             "body text in ordinary web documents.</p>")
    blocks = segment_blocks(prose)
    assert len(blocks) == 1
    assert blocks[0]["label"] == "good"
