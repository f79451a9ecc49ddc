"""End-to-end corpus cleaning pipeline: every stage exercised on one
corpus with a known expected survivor set."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.plans.corpus_pipeline import clean_corpus

# 60 words, stopword-rich, alphabetic, sane word lengths: passes every
# Gopher rule.
BASE = ("the crawl engine writes clean tokens and the shard packer "
        "reads them with care because the pipeline must keep order "
        "and the filters must agree on what counts as a word while "
        "the dedup stages remove copies of documents that have been "
        "seen before and the decontamination stage protects the eval "
        "set from leaking into training data today")

EVAL_Q = ("name the seven wonders of the ancient world and explain "
          "which of them still stands beside the nile river")


@pytest.fixture(scope="module")
def corpus(spark):
    near = BASE.replace("crawl engine", "fetch scheduler", 1)
    contaminated = (
        "students revising history papers often quote long passages "
        "verbatim and that habit is exactly what leak detection must "
        "catch so here the benchmark span appears embedded in prose "
        "that shares almost no vocabulary with any other document "
        "name the seven wonders of the ancient world and explain "
        "which of them still stands beside ruins visited by many "
        "travelers each warm season")
    rows = [
        (1, BASE),                          # clean: survives
        (2, "### " * 60 + "the of"),        # gopher symbol rule: dropped
        (3, "same line of the\n" * 8),      # repetition rule: dropped
        (4, BASE.upper()),                  # exact dup of 1 (normalized)
        (5, near),                          # near-dup of 1: dropped
        (6, contaminated),                  # 13-gram eval overlap: dropped
        (7, BASE.replace("the crawl", "a totally different story about "
                         "the crawl", 1) + " extra closing words of the "
            "final clean document here with more of the padding tokens "
            "that keep it far from every other document in this corpus "
            "and the jaccard low"),         # clean: survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_end_to_end(spark, corpus):
    eval_df = spark.createDataFrame([(EVAL_Q,)], "text string")
    out = clean_corpus(corpus, eval_df, near_dup_threshold=0.7,
                       shard_budget=40).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 7]
    # originals' columns survive, n_tokens/shard_id appended
    assert {"doc_id", "text", "n_tokens", "shard_id"} == set(out[0].asDict())
    # offset-binning over the 1,7 order: doc 1 (60 tokens) spans shards
    # 0..., doc 7 starts at floor(60/40) = 1
    assert out[0].shard_id == 0
    assert out[1].shard_id == out[0].n_tokens // 40


def test_clean_corpus_stage_toggles(spark, corpus):
    # everything off: pure token-count pass-through
    out = clean_corpus(corpus, quality=False, repetition=False,
                       exact=False, near_dup_threshold=None)
    assert out.count() == corpus.count()
    assert "n_tokens" in out.columns and "shard_id" not in out.columns
    # exact-only: drops just the normalized copy (doc 4)
    ids = {r.doc_id for r in
           clean_corpus(corpus, quality=False, repetition=False,
                        exact=True, near_dup_threshold=None).collect()}
    assert ids == {1, 2, 3, 5, 6, 7}


def test_clean_corpus_no_eval_keeps_contaminated(spark, corpus):
    ids = {r.doc_id for r in
           clean_corpus(corpus, near_dup_threshold=0.7).collect()}
    assert 6 in ids and ids == {1, 6, 7}


def test_clean_corpus_ngram_repetition_stage(spark):
    """The MassiveText n-gram stage drops a looped-phrase doc that the
    duplicate-LINE rules can't see (it is one long line)."""
    flags = dict(quality=False, repetition=False, exact=False,
                 near_dup_threshold=None)
    loop = ("alpha beta gamma delta epsilon " * 12).strip()
    df = spark.createDataFrame([(1, BASE), (2, loop)],
                               "doc_id long, text string")
    assert {r.doc_id for r in clean_corpus(df, **flags).collect()} == {1, 2}
    ids = {r.doc_id for r in
           clean_corpus(df, ngram_repetition=True, **flags).collect()}
    assert ids == {1}


def test_clean_corpus_paragraph_dedup_stage(spark):
    """Corpus-wide boilerplate stripping: one copy of the shared banner
    survives (the first), and a doc hollowed out below the survival
    fraction is dropped entirely."""
    flags = dict(quality=False, repetition=False, exact=False,
                 near_dup_threshold=None)
    rows = [
        (1, "intro one\nShared cookie banner text\nbody one"),
        (2, "intro two\nShared cookie banner text\nbody two"),
        (3, "Shared cookie banner text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in clean_corpus(df, paragraph_dedup_keep="first",
                                 **flags).collect()}
    assert set(out) == {1, 2}
    assert "Shared cookie banner text" in out[1]
    assert "Shared cookie banner text" not in out[2]
    assert out[2] == "intro two\nbody two"


def test_clean_corpus_mixture_and_split_stages(spark):
    """Mixture downsampling + split assignment ride the end of the
    pipeline: the kept set equals calling the sampling op directly
    (same seed), the binding group keeps everything, and the split
    column bins every survivor."""
    from data_crawler_spark.operators.sampling import sample_corpus_mixture

    flags = dict(quality=False, repetition=False, exact=False,
                 near_dup_threshold=None)
    rows = [(i, f"{BASE} variant {i}", "en" if i % 4 else "de")
            for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = clean_corpus(df, mixture_group_col="lang",
                       mixture_weights={"en": 1.0, "de": 1.0},
                       split_fractions={"train": 0.8, "val": 0.2},
                       seed=7, **flags)
    got = out.collect()
    assert "sample_rate" not in out.columns and "split" in out.columns
    want = {r.doc_id for r in
            sample_corpus_mixture(df, "lang", "doc_id",
                                  {"en": 1.0, "de": 1.0}, seed=7).collect()}
    assert {r.doc_id for r in got} == want
    # binding group (de, the smaller count) keeps rate 1.0
    assert {r.doc_id for r in got if r.lang == "de"} == \
        {i for i in range(1, 41) if i % 4 == 0}
    assert {r.split for r in got} <= {"train", "val"}
    assert {r.split for r in got} == {"train", "val"}  # both bins hit


def test_clean_corpus_c4_stage(spark):
    """The C4 stage both rewrites text (line cleaning feeds later
    stages) and drops pages on the document rules."""
    flags = dict(quality=False, repetition=False, exact=False,
                 near_dup_threshold=None)
    rows = [
        (1, "A first real sentence sits on this line.\n"
            "junk nav bar\n"
            "And a second full sentence follows right here.\n"
            "Finally a third sentence completes the page today."),
        (2, "Lorem ipsum filler dominates this entire placeholder page.\n"
            "Even though its other sentences look quite acceptable here.\n"
            "Three of them clear the minimum sentence count easily."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, c4=True, **flags).collect()
    assert [r.doc_id for r in out] == [1]
    assert "junk nav bar" not in out[0].text  # the rewrite reached text
    assert out[0].text.count("\n") == 2


def test_clean_corpus_lm_stage(spark):
    """The LM stage keeps the requested perplexity buckets: with
    head_frac + middle_frac covering half the corpus, the in-domain
    (lowest-perplexity) half must be exactly the survivor set."""
    from data_crawler_spark.operators.lm import (lm_score,
                                                 perplexity_buckets,
                                                 train_ngram_lm)

    flags = dict(quality=False, repetition=False, exact=False,
                 near_dup_threshold=None)
    ref_rows = [(100 + i, f"{BASE} reference copy {i}") for i in range(3)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    rows = ([(i, f"{BASE} in domain variant {i}") for i in range(1, 6)]
            + [(10 + i, f"zxq{i} vvw qqq plk unseen garble tokens "
                        f"gibberish blob number {i} keeps going")
               for i in range(1, 6)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, lm_ref=ref, lm_head_frac=0.25,
                       lm_middle_frac=0.25, lm_keep_buckets=("head",
                                                             "middle"),
                       **flags)
    got = {r.doc_id for r in out.collect()}
    # direct-op contrast: same model, same buckets
    model, total = train_ngram_lm(ref, n=3)
    scored = perplexity_buckets(
        lm_score(df, model, total), head_frac=0.25, middle_frac=0.25)
    want = {r.doc_id for r in scored.collect()
            if r.ppl_bucket in ("head", "middle")}
    assert got == want
    assert got == {1, 2, 3, 4, 5}      # the in-domain half survives
    assert set(out.columns) == {"doc_id", "text", "n_tokens"}


def test_clean_corpus_hygiene_stage(spark):
    """hygiene=True normalizes invisible characters BEFORE exact dedup,
    so a zero-width-polluted CRLF copy dedups against the clean
    original; without it both rows survive."""
    flags = dict(quality=False, repetition=False, near_dup_threshold=None)
    rows = [
        (1, "first line of prose\nsecond line of prose"),
        (2, "first line of​ prose\r\nsecond line of prose"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in clean_corpus(df, hygiene=True,
                                           **flags).collect()}
    assert kept == {1}
    kept_raw = {r.doc_id for r in clean_corpus(df, **flags).collect()}
    assert kept_raw == {1, 2}


def test_write_training_shards_roundtrip(spark, tmp_path):
    from data_crawler_spark.plans.corpus_pipeline import \
        write_training_shards

    rows = [(i, f"{BASE} doc {i}") for i in range(1, 13)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, quality=False, repetition=False,
                       near_dup_threshold=None,
                       split_fractions={"train": 0.75, "val": 0.25},
                       shard_budget=150)
    dest = str(tmp_path / "shards")
    write_training_shards(out, dest)
    back = spark.read.parquet(dest)
    want = {(r.doc_id, r.split, r.shard_id) for r in out.collect()}
    got = {(r.doc_id, r.split, r.shard_id) for r in back.collect()}
    assert got == want
    # physical layout: one directory per (split, shard_id)
    import os
    splits = {d for d in os.listdir(dest) if d.startswith("split=")}
    assert splits == {f"split={s}" for _, s, _ in want}
    assert all(any(x.startswith("shard_id=") for x in
                   os.listdir(os.path.join(dest, d))) for d in splits)
    with pytest.raises(ValueError):
        write_training_shards(df, dest)   # no split/shard columns


def test_clean_corpus_compression_stage(spark):
    from data_crawler_spark.operators.text import compression_ratio

    prose = ("a riverbank village holds its yearly market under cold "
             "skies while traders argue about wool prices and children "
             "chase geese between the stalls of early winter morning "
             "and the innkeeper counts coins in the doorway of it all")
    rows = [(1, prose),
            (2, "the of and to " * 200),   # template: ratio < lo
            (3, "")]                       # empty: no ratio -> dropped
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lo = 0.1
    out = clean_corpus(docs, quality=False, repetition=False, exact=False,
                       near_dup_threshold=None,
                       compression_bounds=(lo, 0.9))
    assert {r.doc_id for r in out.collect()} == {1}
    # the gate matches the direct operator at the same bounds
    direct = {r.doc_id for r in
              compression_ratio(docs, "text")
              .filter(f"compression_ratio between {lo} and 0.9").collect()}
    assert direct == {1}


def test_write_training_shards_jsonl(spark, tmp_path):
    import gzip
    import json as _json
    import os

    from data_crawler_spark.plans.corpus_pipeline import \
        write_training_shards

    rows = [(i, f"{BASE} doc {i}") for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, quality=False, repetition=False,
                       near_dup_threshold=None,
                       split_fractions={"train": 1.0}, shard_budget=150)
    dest = str(tmp_path / "jsonl")
    write_training_shards(out, dest, fmt="jsonl", compression="gzip")
    back = spark.read.json(dest)
    assert ({(r.doc_id, r.split, int(r.shard_id)) for r in back.collect()}
            == {(r.doc_id, r.split, r.shard_id) for r in out.collect()})
    # physically newline-delimited JSON, gzip members, in-shard sort
    shard0 = os.path.join(dest, "split=train", "shard_id=0")
    parts = [p for p in os.listdir(shard0) if p.endswith(".json.gz")]
    assert parts
    docs = []
    for p in sorted(parts):
        with gzip.open(os.path.join(shard0, p), "rt") as fh:
            docs += [_json.loads(line)["doc_id"]
                     for line in fh if line.strip()]
    assert docs == sorted(docs)
    with pytest.raises(ValueError, match="fmt"):
        write_training_shards(out, dest, fmt="csv")


def test_prepare_pages_end_to_end(spark):
    """Raw captures -> corpus-ready docs: blocklist, decode, robots
    meta, canonical collapse, main-text extraction, soft-404 drop."""
    from data_crawler_spark.plans.corpus_pipeline import prepare_pages

    nav = "<div><a href='/a'>nav</a> <a href='/b'>bar</a></div>"
    prose = ("<p>" + " ".join(
        "the fish is in the net and it is a part of the story to tell"
        .split() * 6) + " so the block is long enough to be kept.</p>")

    def page(body, head=""):
        return f"<html><head>{head}</head><body>{body}</body></html>"

    rows = [
        # survives: prose page with boilerplate nav (cp1252 bytes)
        ("http://good.test/a",
         page(nav + prose.replace("fish", "caf\xe9 fish"))
         .encode("windows-1252")),
        # blocklisted host
        ("http://spam.test/x", page(prose).encode()),
        # robots noindex opt-out
        ("http://good.test/noidx",
         page(prose, '<meta name="robots" content="noindex">').encode()),
        # canonical variant of /a -> collapses onto /a
        ("http://good.test/a?utm=1",
         page(nav + prose,
              '<link rel="canonical" href="http://good.test/a">')
         .encode()),
        # soft 404
        ("http://good.test/gone",
         page("<p>Page not found</p>",
              "<title>404 Not Found</title>").encode()),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = prepare_pages(pages, blocklist=["spam.test"])
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {"http://good.test/a"}
    text = got["http://good.test/a"]
    assert "café fish" in text         # charset decoded
    assert "nav" not in text           # boilerplate stripped
    assert out.columns[-1] == "doc_id"

    # toggles: no canonical collapse keeps the utm variant; no soft404
    # keeps the error page; no robots-meta keeps the opt-out
    lax = prepare_pages(pages, blocklist=["spam.test"], canonical=False,
                        soft404=False, respect_robots_meta=False)
    assert lax.count() == 4


def test_prepare_pages_feeds_clean_corpus(spark):
    """The two halves compose: prepare_pages output runs through
    clean_corpus unchanged."""
    from data_crawler_spark.plans.corpus_pipeline import (clean_corpus,
                                                          prepare_pages)

    prose = ("<p>" + " ".join(
        "the fish is in the net and it is a part of the story to tell"
        .split() * 8) + " and that is the whole of the story.</p>")
    rows = [(f"http://h{i}.test/p", f"<html><body>{prose}</body></html>"
             .encode()) for i in range(4)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    docs = prepare_pages(pages)
    out = clean_corpus(docs, quality=False, repetition=False,
                       near_dup_threshold=None)
    # identical bodies -> exact dedup keeps exactly one
    assert out.count() == 1
    assert "n_tokens" in out.columns


def test_clean_corpus_semantic_stage(spark):
    """SemDeDup stage: embedding-duplicate docs (different TEXT, so
    text dedup keeps both) collapse to one survivor; stage equals the
    direct op composition."""
    from data_crawler_spark.operators.similarity import semantic_dedup
    from data_crawler_spark.plans.corpus_pipeline import clean_corpus

    base = [float(x) for x in range(8)]
    other = [float(8 - x) for x in range(8)]
    rows = [
        ("d1", "the cat sat on the mat and it is a fine day", base),
        ("d2", "a totally different sentence about the sea is here",
         base),  # same embedding as d1 -> semantic dup
        ("d3", "the third doc is about something else entirely",
         other),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, embedding array<double>")
    out = clean_corpus(docs, quality=False, repetition=False,
                       exact=True, near_dup_threshold=None,
                       semantic_threshold=0.99, semantic_n_lists=2)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    direct = semantic_dedup(docs.select("doc_id", "embedding"),
                            threshold=0.99, id_col="doc_id",
                            n_lists=2)
    want = {r["doc_id"] for r in direct.filter("semdedup_keep")
            .collect()}
    assert kept == want
    assert "d3" in kept
    assert len(kept & {"d1", "d2"}) == 1


def test_semantic_dedup_empty_string_ids(spark):
    from data_crawler_spark.operators.similarity import semantic_dedup
    empty = spark.createDataFrame(
        [], "doc_id string, embedding array<double>")
    out = semantic_dedup(empty, id_col="doc_id")
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "string"


def test_incremental_corpus_cleaner(spark, tmp_path):
    """Two nightly deltas through the O(delta) cleaner: exact and
    near-dup memory both persist across calls; failures roll back
    both index tables."""
    from data_crawler_spark.plans.corpus_pipeline import (
        IncrementalCorpusCleaner)

    A = ("the fish is in the net and it is a part of the story to "
         "tell today for sure")
    B = ("a completely different document about the mountain trail "
         "and the weather up there")
    B_near = B + " indeed"
    C = "the third subject matter is entirely new content here"

    ic = IncrementalCorpusCleaner(
        spark, tmp_path / "state", near_dup_threshold=0.5,
        gates={"quality": False, "repetition": False})

    d1 = spark.createDataFrame(
        [(1, A), (2, A), (3, B)], "doc_id long, text string")
    out1 = {r["doc_id"] for r in ic.clean(d1).collect()}
    assert out1 == {1, 3}  # exact dup 2 dropped within the delta

    d2 = spark.createDataFrame(
        [(4, A),        # exact dup of corpus -> dropped by hash memory
         (5, B_near),   # near-dup of corpus doc 3 -> corpus wins
         (6, C),        # novel
         (7, B_near + " x"), (8, B_near + " x")],  # exact dups of each
        "doc_id long, text string")
    out2 = {r["doc_id"] for r in ic.clean(d2).collect()}
    assert 4 not in out2 and 5 not in out2
    assert 6 in out2
    # 7/8 exact-collapse to 7; 7 is a near-dup of corpus doc 3 too
    assert 8 not in out2
    assert out2 <= {6, 7}

    # failure rolls BOTH tables back: re-adding id 6 with new text
    # trips the index guard AFTER the hash commit
    v = ic.versions()
    d_bad = spark.createDataFrame(
        [(6, "some new text for a reused id which is forbidden")],
        "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ic.clean(d_bad)
    assert ic.versions() == v
    # and the state still works after the rollback
    d3 = spark.createDataFrame(
        [(9, A)], "doc_id long, text string")  # still remembered
    assert ic.clean(d3).count() == 0


def test_incremental_cleaner_rejects_corpus_stages(spark, tmp_path):
    from data_crawler_spark.plans.corpus_pipeline import (
        IncrementalCorpusCleaner)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        IncrementalCorpusCleaner(spark, tmp_path / "s",
                                 gates={"split_fractions":
                                        {"train": 1.0}})


def test_prepare_pages_replaces_existing_text_column(spark):
    """The crawl's PAGES shape already carries `text`; prepare_pages
    must REPLACE it, not append an ambiguous duplicate."""
    from data_crawler_spark.plans.corpus_pipeline import prepare_pages
    pages = spark.createDataFrame(
        [("http://h.test/p", "OLD EXTRACT",
          b"<html><body><p>" +
          b"the fish is in the net and it is a part of the story. "
          * 6 + b"</p></body></html>")],
        "url string, text string, html binary")
    out = prepare_pages(pages)
    assert out.columns.count("text") == 1
    [r] = out.collect()
    assert r["text"].startswith("the fish")  # replaced, not the old col
    # raw-text mode replaces too
    out2 = prepare_pages(pages, extract_main=False)
    assert out2.columns.count("text") == 1
    assert "<html" in out2.collect()[0]["text"]


def test_prepare_pages_param_rules_stage(spark):
    """DUST rewrite folds session-id URL variants to one doc_id before
    the canonical shuffle collapses the duplicate captures."""
    from data_crawler_spark.operators.dust import mine_param_rules
    from data_crawler_spark.plans.corpus_pipeline import prepare_pages

    prose = ("<p>" + " ".join(
        "the fish is in the net and it is a part of the story to tell"
        .split() * 6) + " so the block is long enough to be kept.</p>")
    html = f"<html><body>{prose}</body></html>".encode()
    rows = [
        ("http://s.test/p?id=1&sess=aa", html),
        ("http://s.test/p?id=1&sess=bb", html),
        ("http://s.test/p?id=2&sess=aa", html + b"<p>two</p>"),
        ("http://s.test/p?id=2&sess=cc", html + b"<p>two</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    rules = mine_param_rules(
        pages.select("url", F.xxhash64("html").alias("content_hash")),
        min_support=2)
    assert {(r.host, r.param) for r in rules.collect()} \
        == {("s.test", "sess")}

    out = prepare_pages(pages, param_rules=rules)
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert ids == ["http://s.test/p?id=1", "http://s.test/p?id=2"]
    # without the stage, every sess variant survives as its own doc
    assert prepare_pages(pages).count() == 4


def test_shard_manifest(spark):
    from data_crawler_spark.plans.corpus_pipeline import shard_manifest

    rows = [
        ("s0", 0, "d1", "alpha text", 2),
        ("s0", 0, "d2", "beta text", 2),
        ("s0", 1, "d3", "gamma", 1),
        ("s1", 0, "d4", "delta", 1),
    ]
    ddl = "split string, shard_id int, doc_id string, text string, n_tokens long"
    df = spark.createDataFrame(rows, ddl)
    m = {(r.split, r.shard_id): r for r in shard_manifest(df).collect()}
    assert m[("s0", 0)].n_docs == 2 and m[("s0", 0)].n_tokens == 4
    assert m[("s0", 1)].n_docs == 1 and m[("s1", 0)].n_docs == 1

    # digest: layout- and order-insensitive, content-sensitive
    for layout in (df.repartition(7), df.orderBy(F.desc("doc_id"))):
        m2 = {(r.split, r.shard_id): r.content_digest
              for r in shard_manifest(layout).collect()}
        assert m2 == {k: v.content_digest for k, v in m.items()}
    changed = spark.createDataFrame(
        [rows[0], ("s0", 0, "d2", "beta text EDITED", 2),
         rows[2], rows[3]], ddl)
    mc = {(r.split, r.shard_id): r.content_digest
          for r in shard_manifest(changed).collect()}
    assert mc[("s0", 0)] != m[("s0", 0)].content_digest
    assert mc[("s0", 1)] == m[("s0", 1)].content_digest

    # no token column; bad partition col validation
    m3 = shard_manifest(df, tokens_col=None)
    assert "n_tokens" not in m3.columns
    with pytest.raises(ValueError):
        shard_manifest(df, partition_by=("nope",))


def test_clean_corpus_near_dup_keep_by(spark):
    """near_dup_keep_by switches the survivor policy: the cluster
    member with the max metric survives instead of the min id (the
    RefinedWeb keep-longest rule with a length metric)."""
    near = BASE.replace("crawl engine", "fetch scheduler", 1)
    rows = [(1, BASE, 10.0),
            (2, near + " and a few more trailing words", 99.0),
            (3, "an unrelated document about entirely different things "
                "with plenty of the common stopwords that keep the "
                "gopher gate satisfied through the whole run today and "
                "the words do not repeat themselves unduly", 5.0)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, q double")

    default = clean_corpus(docs, quality=False, repetition=False,
                           near_dup_threshold=0.5)
    assert {r.doc_id for r in default.collect()} == {1, 3}

    kept = clean_corpus(docs, quality=False, repetition=False,
                        near_dup_threshold=0.5, near_dup_keep_by="q")
    assert {r.doc_id for r in kept.collect()} == {2, 3}


def test_clean_corpus_shuffled_per_split_shards(spark):
    """shard_shuffle_seed packs in seeded pseudo-random order (the
    shuffle_key column survives for the writer) and a split corpus
    packs PER SPLIT: shard ids restart at 0 in each split and every
    non-final shard lands within budget + one doc."""
    words = BASE.split()
    rows = [(i, " ".join(words[: 20 + (i * 7) % 40])) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(docs, quality=False, repetition=False, exact=False,
                       near_dup_threshold=None,
                       split_fractions={"train": 0.7, "val": 0.3},
                       shard_budget=200, shard_shuffle_seed=42).collect()
    assert {"doc_id", "text", "n_tokens", "split", "shard_id",
            "shuffle_key"} <= set(out[0].asDict())
    by_split = {}
    for r in out:
        by_split.setdefault(r.split, []).append(r)
    assert set(by_split) == {"train", "val"}
    for split, members in by_split.items():
        shard_of = {r.doc_id: r.shard_id for r in members}
        # reference packing: (shuffle_key, doc_id) order within the split
        members.sort(key=lambda r: (r.shuffle_key, r.doc_id))
        acc, want = 0, {}
        for r in members:
            want[r.doc_id] = acc // 200
            acc += r.n_tokens
        assert shard_of == want, split
        assert min(shard_of.values()) == 0, split

    # same seed -> same packing; different seed -> different shuffle
    again = clean_corpus(docs, quality=False, repetition=False, exact=False,
                         near_dup_threshold=None,
                         split_fractions={"train": 0.7, "val": 0.3},
                         shard_budget=200, shard_shuffle_seed=42).collect()
    assert ({(r.doc_id, r.split, r.shard_id) for r in again}
            == {(r.doc_id, r.split, r.shard_id) for r in out})
    other = clean_corpus(docs, quality=False, repetition=False, exact=False,
                         near_dup_threshold=None,
                         split_fractions={"train": 0.7, "val": 0.3},
                         shard_budget=200, shard_shuffle_seed=7).collect()
    assert ({r.shuffle_key for r in other} != {r.shuffle_key for r in out})


def _read_tar(path):
    import tarfile

    out = []
    with tarfile.open(path, "r:*") as tf:
        for m in tf.getmembers():
            out.append((m.name, tf.extractfile(m).read(),
                        m.mtime, m.uid, m.gid))
    return out


def test_webdataset_roundtrip(spark, tmp_path):
    """One tar per (split, shard), samples adjacent in sort order,
    .txt/.json/.bin members round-trip, null binary skipped, numpy
    metadata serializes as JSON numbers, zeroed tar headers."""
    import json

    from data_crawler_spark.plans.corpus_pipeline import \
        write_webdataset_shards

    rows = [
        ("d1", "alpha text", "train", 0, "en", 7, bytearray(b"\x00\x01")),
        ("d0", "beta text", "train", 0, "de", 3, None),
        ("d2", "gamma", "train", 1, "en", 9, bytearray(b"xyz")),
        ("d3", "delta", "val", 0, "fr", 1, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, split string, shard_id int, "
              "lang string, n_tokens long, payload binary")
    out = tmp_path / "wds"
    man = write_webdataset_shards(
        df, str(out), meta_cols=("lang", "n_tokens"), bin_col="payload")
    got = {r.tar_file: (r.n_samples, r.n_bytes) for r in man.collect()}
    t00 = out / "split=train" / "shard-000000.tar"
    t01 = out / "split=train" / "shard-000001.tar"
    tv0 = out / "split=val" / "shard-000000.tar"
    assert set(got) == {str(t00), str(t01), str(tv0)}
    assert got[str(t00)] == (2, t00.stat().st_size)

    members = _read_tar(t00)
    # d0 sorts before d1; json follows txt; d0's null payload skipped
    assert [m[0] for m in members] == [
        "d0.txt", "d0.json", "d1.txt", "d1.json", "d1.bin"]
    as_dict = {m[0]: m[1] for m in members}
    assert as_dict["d0.txt"] == b"beta text"
    assert json.loads(as_dict["d1.json"]) == {"lang": "en", "n_tokens": 7}
    assert as_dict["d1.bin"] == b"\x00\x01"
    assert all(m[2:] == (0, 0, 0) for m in members)  # mtime/uid/gid
    assert [m[0] for m in _read_tar(t01)] == ["d2.txt", "d2.json",
                                              "d2.bin"]


def test_webdataset_byte_stable_and_gzip(spark, tmp_path):
    """Two builds of the same corpus from different input layouts
    produce byte-identical archives; gzip_shards round-trips."""
    from data_crawler_spark.plans.corpus_pipeline import \
        write_webdataset_shards

    rows = [(f"d{i:03d}", f"text {i} " * (i % 5 + 1), "train", i % 3)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, split string, shard_id int")
    a, b, g = tmp_path / "a", tmp_path / "b", tmp_path / "g"
    write_webdataset_shards(df, str(a)).collect()
    write_webdataset_shards(df.repartition(11), str(b)).collect()
    files_a = sorted(p.relative_to(a) for p in a.rglob("*.tar"))
    assert files_a == sorted(p.relative_to(b) for p in b.rglob("*.tar"))
    for rel in files_a:
        assert (a / rel).read_bytes() == (b / rel).read_bytes(), rel

    write_webdataset_shards(df, str(g), gzip_shards=True).collect()
    gz = sorted(g.rglob("*.tar.gz"))
    assert len(gz) == 3
    keys_plain = [m[0] for m in _read_tar(a / "split=train" /
                                          "shard-000000.tar")]
    assert [m[0] for m in _read_tar(gz[0])] == keys_plain


def test_webdataset_validation(spark, tmp_path):
    from data_crawler_spark.plans.corpus_pipeline import \
        write_webdataset_shards

    df = spark.createDataFrame(
        [("d1", "t", "train", 0)],
        "doc_id string, text string, split string, shard_id int")
    with pytest.raises(ValueError, match="columns not in frame"):
        write_webdataset_shards(df, str(tmp_path / "x"),
                                meta_cols=("nope",))
    null_key = spark.createDataFrame(
        [(None, "t", "train", 0)],
        "doc_id string, text string, split string, shard_id int")
    with pytest.raises(Exception, match="null doc_id"):
        write_webdataset_shards(null_key, str(tmp_path / "y")).collect()


# ---------------------------------------------------------------------------
# dataset_card
# ---------------------------------------------------------------------------

def test_dataset_card_sections(spark):
    from data_crawler_spark.operators.stats import corpus_stats
    from data_crawler_spark.plans.corpus_pipeline import dataset_card

    rows = [
        (1, "https://a.example.com/x", "en", "one two three",
         ["one", " two", " three"], True, True),
        (2, "https://b.example.com/y", "en", "one two three",
         ["one", " two", " three"], True, False),
        (3, "https://sub.b.example.com/z", "de", "vier fünf",
         ["vier", " fünf"], False, True),
        (4, "https://c.other.org/w", "fr", "six", ["six"], True, True),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, lang string, text string, "
              "tokens array<string>, rule_ok boolean, "
              "caption_keep boolean")
    card = dataset_card(docs, lang_col="lang", url_col="url",
                        tokens_col="tokens", top_k=2,
                        exact_distinct=True)

    exp_stats = corpus_stats(docs, exact_distinct=True).first().asDict()
    assert card["stats"] == exp_stats
    assert card["stats"]["n_docs"] == 4
    assert card["stats"]["dup_rate"] == 0.25      # docs 1+2 identical

    langs = card["languages"]
    assert [r["lang"] for r in langs] == ["en", "de"]   # top_k=2, desc
    assert langs[0]["n_docs"] == 2

    # registrable domains: example.com holds 3 docs across subdomains
    assert card["top_domains"] == [
        {"domain": "example.com", "n_docs": 3},
        {"domain": "other.org", "n_docs": 1}]

    gates = card["gate_pass_rates"]
    assert gates["rule_ok_pass_rate"] == 0.75
    assert gates["caption_keep_pass_rate"] == 0.75

    enc = card["encoding"]
    assert enc["n_tokens"] == 9 and enc["n_docs"] == 4
    assert enc["fertility"] == 1.0                # 9 tokens / 9 words

    # optional sections stay absent when not requested
    minimal = dataset_card(docs.select("doc_id", "text"))
    assert set(minimal) == {"n_input_columns", "stats"}


def test_corpus_diff_card(spark):
    from data_crawler_spark.plans.corpus_pipeline import corpus_diff_card
    old = spark.createDataFrame(
        [(1, "alpha beta gamma"),          # unchanged
         (2, "two old words here"),        # changed in new
         (3, "will be removed entirely")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "alpha beta gamma"),
         (2, "rewritten"),
         (4, "brand new document added now")],
        "doc_id long, text string")
    card = corpus_diff_card(old, new)
    assert card["n_old"] == 3 and card["n_new"] == 3
    assert card["added"] == {"docs": 1, "tokens": 5}
    assert card["removed"] == {"docs": 1, "tokens": 4}
    assert card["changed"] == {"docs": 1, "tokens_old": 4, "tokens_new": 1}
    assert card["unchanged"] == {"docs": 1}
    assert card["tokens_old_total"] == 3 + 4 + 4
    assert card["tokens_new_total"] == 3 + 1 + 5


def test_clean_corpus_lang_major_frac_stage(spark):
    from data_crawler_spark.plans.corpus_pipeline import clean_corpus
    from data_crawler_spark.operators.text import lang_consistency
    en = "plain body words without marker hits making prose " * 8
    es = "el proyecto es la mejor cosa que es la de hoy " * 8
    docs = spark.createDataFrame(
        [(1, en), (2, f"{en}\n{es}"), (3, es)],
        "doc_id long, text string")
    out = clean_corpus(docs, quality=False, repetition=False, exact=False,
                       near_dup_threshold=None, lang_major_frac=0.9)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    direct = lang_consistency(docs)
    want = {r.doc_id for r in direct.filter("major_frac >= 0.9").collect()}
    assert kept == want == {1, 3}


def test_webdataset_duplicate_key_raises(spark, tmp_path):
    # duplicate member names are tar-legal but merge into one corrupted
    # sample at the reader's group-by-key — the writer must refuse
    from data_crawler_spark.plans.corpus_pipeline import \
        write_webdataset_shards

    df = spark.createDataFrame(
        [("d1", "alpha", "train", 0), ("d1", "beta", "train", 0)],
        "doc_id string, text string, split string, shard_id int")
    with pytest.raises(Exception, match="duplicate"):
        write_webdataset_shards(df, str(tmp_path / "wds")).collect()


def test_corpus_diff_card_empty_and_duplicate_ids(spark):
    from data_crawler_spark.plans.corpus_pipeline import corpus_diff_card

    empty = spark.createDataFrame([], "doc_id string, text string")
    card = corpus_diff_card(empty, empty)
    assert card["n_old"] == card["n_new"] == 0
    assert card["tokens_old_total"] == card["tokens_new_total"] == 0
    assert card["added"] == {"docs": 0, "tokens": 0}

    # duplicate ids never double-count: each side is a SET keyed by id
    # (smallest (fingerprint, n_tokens) row wins, deterministically)
    old = spark.createDataFrame([("d1", "alpha beta")],
                                "doc_id string, text string")
    new = spark.createDataFrame(
        [("d1", "alpha beta"), ("d1", "alpha beta"), ("d2", "new doc here")],
        "doc_id string, text string")
    card = corpus_diff_card(old, new)
    assert card["n_old"] == 1 and card["n_new"] == 2
    assert card["unchanged"]["docs"] == 1
    assert card["added"] == {"docs": 1, "tokens": 3}
    assert card["tokens_new_total"] == 2 + 3
