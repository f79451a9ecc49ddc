"""Text-analysis operators: spec cases + profile over documents."""

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.text import text_profile


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, "the quick brown fox is in the barn"),
        (2, "aaa!!! ??? ###"),
        (3, "这是一个中文句子加上一些更多的汉字内容在这里"),
        (4, ""),
        (5, "word " * 60),
        (6, "el la que es el la de la"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_profile(sample):
    out = {r.doc_id: r for r in text_profile(sample).collect()}
    assert out[1].n_tokens == 8
    assert out[1].stopword_ratio == pytest.approx(4 / 8, abs=1e-4)  # the,is,in,the
    assert out[1].punct_ratio == 0.0
    assert out[2].punct_ratio > 0.5
    assert out[3].lang_pred == "zh"
    assert out[6].lang_pred == "es"
    assert out[1].lang_pred == "en"
    assert out[4].n_tokens == 0 and out[4].quality < 0.7
    assert out[5].quality > out[2].quality  # clean text beats punct soup


def test_fingerprint_normalization(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, " HELLO\tWORLD ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = [r.fingerprint for r in text_profile(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


def test_profile_runs_on_fixture_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = text_profile(docs)
    assert out.count() == docs.count()
    assert set(r.lang_pred for r in out.select("lang_pred").distinct().collect()) <= {
        "en", "es", "de", "fr", "zh"}


def test_remove_repeated_tokens(spark):
    """First occurrence kept, order preserved, counts right."""
    from data_crawler_spark.operators.text import remove_repeated_tokens
    df = spark.createDataFrame(
        [(1, "buy now buy now best best deal now"),
         (2, "  a  b a   c  "),
         (3, "   "),
         (4, "unique words only here")],
        "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_unique)
           for r in remove_repeated_tokens(df).collect()}
    assert got == {
        1: ("buy now best deal", 8, 4),
        2: ("a b c", 4, 3),          # whitespace runs collapse
        4: ("unique words only here", 4, 4),
    }  # doc 3 (whitespace-only) is filtered


def test_pii_redact_matches_python_reference(spark):
    """The Spark regexp_replace chain equals a Python ``re`` reference
    applying the SAME PII_PATTERNS in order, over edge-casey inputs."""
    import re
    import pyspark.sql.functions as F
    from data_crawler_spark.operators.text import PII_PATTERNS, pii_redact_col

    samples = [
        "mail bob.smith+x@ex-ample.co.uk now",
        "a@b.io end-of-line a@b.c",                      # 1-char TLD: no match
        "ips 10.0.0.1 and 192.168.001.255, not 1.2.3",   # 3 octets: no match
        "card 4111111111111111 short 12345678901 long 11112222333344445555",
        "call 555-123-4567 or (555) 123-4567 or 555.123.4567",
        "5551234567 is not a phone match; 555-1234 neither",
        "mixed: u.1@d.com,10.1.2.3;555-000-1111 123456789012.",
        "",
        None,
    ]

    def ref(t):
        if t is None:
            return None
        for pat, repl in PII_PATTERNS:
            t = re.sub(pat, repl, t)
        return t

    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "i long, t string")
    got = {r.i: r.r for r in
           df.select("i", pii_redact_col(F.col("t")).alias("r")).collect()}
    want = {i: ref(s) for i, s in enumerate(samples)}
    assert got == want
    # placeholders carry no digits/@ -> redaction is idempotent
    assert {i: ref(v) for i, v in want.items()} == want


def _gopher_ref(text, min_words=50, max_words=100_000):
    """Pure-Python reference for gopher_rules (same definitions)."""
    import re
    words = text.strip().split() if text.strip() else []
    n = len(words)
    mean_wl = sum(len(w) for w in words) / n if n else 0.0
    sym = len(re.findall(r"#|\.\.\.|…", text))
    sym_ratio = sym / n if n else 0.0
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    nl = len(lines)
    bullet = sum(1 for l in lines
                 if l.startswith(("•", "- ", "* ")))
    ellipsis = sum(1 for l in lines if l.endswith(("...", "…")))
    bullet_frac = bullet / nl if nl else 0.0
    ellipsis_frac = ellipsis / nl if nl else 0.0
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    alpha_frac = alpha / n if n else 0.0
    low = text.lower()
    stop_hits = sum(1 for s in ["the", "be", "to", "of", "and", "that",
                                "have", "with"]
                    if re.search(r"(^|\s)" + s + r"(\s|$)", low))
    rules = {
        "rule_word_count": min_words <= n <= max_words,
        "rule_mean_word_len": 3.0 <= mean_wl <= 10.0,
        "rule_symbol_ratio": sym_ratio <= 0.1,
        "rule_bullet_lines": bullet_frac <= 0.9,
        "rule_ellipsis_lines": ellipsis_frac <= 0.3,
        "rule_alpha_words": alpha_frac >= 0.8,
        "rule_stopwords": stop_hits >= 2,
    }
    return {
        "n_words": n,
        "mean_word_len": round(mean_wl, 4),
        "symbol_ratio": round(sym_ratio, 4),
        "bullet_line_frac": round(bullet_frac, 4),
        "ellipsis_line_frac": round(ellipsis_frac, 4),
        "alpha_word_frac": round(alpha_frac, 4),
        "n_stop_hits": stop_hits,
        **rules,
        "gopher_keep": all(rules.values()),
    }


def test_gopher_rules_vs_reference(spark):
    from data_crawler_spark.operators.text import gopher_rules

    prose = ("the quick brown fox jumps over the lazy dog and then "
             "runs back to be with all of that pack near have with "
             "more plain words here making this document long enough "
             "to clear the fifty word floor easily ") * 2
    samples = [
        prose,                                       # keeps
        "short doc of the and",                      # word-count fail
        "\n".join(["• item one of the list"] * 10),  # bullety
        "### " * 60 + "the of",                      # symbol soup
        " ".join(["12345"] * 60) + " the of",        # numeric words
        "\n".join(["trailing off the and..."] * 10), # ellipsis lines
        "",                                          # empty
        "word\n\n  \nthe of " + "x " * 60,           # blank lines ignored
        "\n".join(["  • indented bullet of the"] * 9
                  + ["plain line"]),                 # bullets counted post-trim
        prose + "\n",                                # trailing newline: no
        "\tthe of " + "y " * 60,                     #   phantom empty words
        "line of the...\r\nread more...\r\n"       # CRLF pages: '\r'
        + "w " * 60,                                 #   stripped pre-rules
        "nb\u00a0sp the of " + "z " * 60,            # NBSP = whitespace
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in gopher_rules(df).collect()}
    for i, s in enumerate(samples):
        want = _gopher_ref(s)
        have = got[i]
        for k, v in want.items():
            if isinstance(v, float):
                assert have[k] == pytest.approx(v, abs=1e-4), (i, k)
            else:
                assert have[k] == v, (i, k)
    # spot-check the scenarios landed on the intended rule
    assert got[0]["gopher_keep"]
    assert not got[1]["rule_word_count"]
    assert not got[2]["rule_bullet_lines"]
    assert not got[3]["rule_symbol_ratio"]
    assert not got[4]["rule_alpha_words"]
    assert not got[5]["rule_ellipsis_lines"]
    assert not got[6]["gopher_keep"] and got[6]["n_words"] == 0
    # trailing '\n' must not change a single metric vs the bare prose
    skip = {"doc_id", "text"}
    assert {k: v for k, v in got[9].items() if k not in skip} \
        == {k: v for k, v in got[0].items() if k not in skip}
    assert got[10]["n_words"] == 62                  # no '' word from '\t'
    assert got[11]["ellipsis_line_frac"] == pytest.approx(2 / 3, abs=1e-4)
    assert got[12]["n_words"] == 64                  # NBSP splits words


def test_gopher_stop_hits_matches_regex_form(spark):
    """Round-6 pin: n_stop_hits is now one split + array_intersect; it
    must count exactly what the old per-stopword Java-regex scan
    ((^|\\s)s(\\s|$) over the lowered text) counted, including edge
    placement, repeated stopwords (distinct-count semantics), NBSP
    (NOT Java \\s) and punctuation-glued words (no match)."""
    from pyspark.sql import functions as F

    from data_crawler_spark.operators.text import (GOPHER_STOPWORDS,
                                                   gopher_rules)

    samples = [
        "the start", "end with the", "the", "THE UPPER", "x the y",
        "the the the of of", "the. of, and;", "no stop words here",
        "nb the sp", "tab\tthe\tsep", "crlf\r\nthe\r\nsep",
        "", "   ", "athe theb", "of\nthe\nand",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "doc_id long, text string")
    low = F.lower(F.col("text"))
    regex_hits = sum(
        (F.when(low.rlike(r"(^|\s)" + s + r"(\s|$)"), 1).otherwise(0)
         for s in GOPHER_STOPWORDS), F.lit(0))
    want = {r.doc_id: r.h for r in
            df.select("doc_id", regex_hits.alias("h")).collect()}
    got = {r.doc_id: r.n_stop_hits for r in gopher_rules(df).collect()}
    assert got == want


def test_gopher_rules_native_plan(spark):
    """The filter is a pure map: no exchange, no Python eval."""
    from data_crawler_spark.operators.text import gopher_rules

    df = spark.createDataFrame([(1, "a doc")], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_shard_by_token_budget_partitioning_invariant(spark):
    """shard_id is a pure function of the exclusive prefix sum: the
    window path and every two-phase width agree exactly, and match a
    sequential Python reference."""
    import random

    from data_crawler_spark.operators.text import shard_by_token_budget

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 900)) for i in range(500)]
    budget = 4096
    # sequential reference: offset binning over the id-ordered stream
    want, acc = {}, 0
    for i, tok in rows:
        want[i] = acc // budget
        acc += tok
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    df = df.repartition(8).persist()
    try:
        outs = {}
        for p in (1, 4, 8):
            got = {r.doc_id: r.shard_id for r in
                   shard_by_token_budget(df, budget,
                                         num_partitions=p).collect()}
            assert got == want, f"num_partitions={p}"
            outs[p] = got
        # shard sums land in budget +/- one doc (all but the last shard)
        sums = {}
        for i, tok in rows:
            sums[want[i]] = sums.get(want[i], 0) + tok
        last = max(sums)
        assert all(budget - 900 < s <= budget + 900
                   for sh, s in sums.items() if sh != last)
    finally:
        df.unpersist()


def test_shard_by_token_budget_rejects_bad_budget(spark):
    from data_crawler_spark.operators.text import shard_by_token_budget

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        shard_by_token_budget(df, 0)


def _repetition_ref(text):
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    n = len(lines)
    from collections import Counter
    cnt = Counter(lines)
    dup_lines = sum(1 for l in lines if cnt[l] > 1)
    total_chars = sum(len(l) for l in lines)
    dup_chars = sum(len(l) for l in lines if cnt[l] > 1)
    dlf = dup_lines / n if n else 0.0
    dcf = dup_chars / total_chars if total_chars else 0.0
    return {
        "dup_line_frac": round(dlf, 4),
        "dup_line_char_frac": round(dcf, 4),
        "rule_dup_lines": dlf <= 0.30,
        "rule_dup_line_chars": dcf <= 0.20,
        "repetition_keep": dlf <= 0.30 and dcf <= 0.20,
    }


def test_repetition_signals_vs_reference(spark):
    from data_crawler_spark.operators.text import repetition_signals

    samples = [
        "unique one\nunique two\nunique three\nunique four",   # clean
        "same line\nsame line\nsame line\nother",              # dup-heavy
        "a\nb\nc\n" + "the repeated boilerplate footer\n" * 2, # mixed
        "only one line",
        "",
        "x\n\n  \nx",                                          # blanks skip
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_signals(df).collect()}
    for i, s in enumerate(samples):
        for k, v in _repetition_ref(s).items():
            if isinstance(v, float):
                assert got[i][k] == pytest.approx(v, abs=1e-4), (i, k)
            else:
                assert got[i][k] == v, (i, k)
    assert got[0]["repetition_keep"]
    assert not got[1]["repetition_keep"]
    # pure map: no exchange, no Python eval
    plan = (repetition_signals(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "PythonUDF" not in plan


def _ngram_rep_ref(text, top_ngrams, dup_ngrams):
    """Pure-Python mirror of ngram_repetition_signals' documented spec."""
    import re as _re
    from collections import Counter

    toks = _re.findall(r"[A-Za-z0-9]+", text.lower())
    doc_chars = sum(len(w) for w in toks)
    out = {}
    for n, thr in top_ngrams:
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams or doc_chars == 0:
            frac = 0.0
        else:
            cnt = Counter(grams)
            c, ch = max((c, sum(len(w) for w in g))
                        for g, c in cnt.items())
            frac = c * ch / doc_chars
        out[f"top_{n}gram_char_frac"] = frac
        out[f"rule_top_{n}gram"] = frac <= thr
    for n, thr in dup_ngrams:
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        cnt = Counter(grams)
        covered = set()
        for i, g in enumerate(grams):
            if cnt[g] >= 2:
                covered.update(range(i, i + n))
        frac = (sum(len(toks[p]) for p in covered) / doc_chars
                if doc_chars else 0.0)
        out[f"dup_{n}gram_char_frac"] = frac
        out[f"rule_dup_{n}gram"] = frac <= thr
    out["ngram_repetition_keep"] = all(
        v for k, v in out.items() if k.startswith("rule_"))
    return out


def test_ngram_repetition_vs_reference(spark):
    from data_crawler_spark.operators.text import ngram_repetition_signals

    top = ((2, 0.20), (3, 0.18))
    dup = ((2, 0.15), (5, 0.15))   # n=2 exercises the shared-n path
    samples = [
        # pathological overlap: top-2gram frac 4*2/5 = 1.6 (>1, the
        # published rule's known quirk) and every position dup-covered
        "a a a a a",
        # repeated 5-word phrase split by unique words
        "alpha beta gamma delta epsilon one two "
        "alpha beta gamma delta epsilon three four",
        # overlapping duplicated 2-grams sharing positions (count once)
        "x y x y x y z",
        "single",
        "",
        "clean prose with no repeated windows at all here",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "doc_id long, text string").repartition(4)
    got = {r.doc_id: r.asDict()
           for r in ngram_repetition_signals(
               df, top_ngrams=top, dup_ngrams=dup).collect()}
    assert len(got) == len(samples)
    for i, s in enumerate(samples):
        ref = _ngram_rep_ref(s, top, dup)
        for k, v in ref.items():
            if isinstance(v, float):
                assert got[i][k] == pytest.approx(v, abs=1e-4), (i, k)
            else:
                assert got[i][k] == v, (i, k)
    assert not got[0]["ngram_repetition_keep"]
    # (keep == reference is asserted for every doc above; note a short
    # clean doc can still fail the top-n rule at cnt=1 — the published
    # rule is meant for word-count-gated docs, doc 5 shows it)
    # input columns survive, text untouched
    assert got[1]["text"] == samples[1]


def test_ngram_repetition_published_defaults_fuzz(spark):
    """Seeded word-salad fuzz at the published Table A1 rule set:
    every metric must equal the pure-Python reference, on every doc,
    regardless of partitioning."""
    import random

    from data_crawler_spark.operators.text import (
        MASSIVETEXT_DUP_NGRAM, MASSIVETEXT_TOP_NGRAM,
        ngram_repetition_signals)

    rng = random.Random(20260818)
    vocab = ["lorem", "ipsum", "dolor", "sit", "amet", "web", "crawl"]
    docs = []
    for i in range(24):
        n_words = rng.randint(0, 60)
        words = [rng.choice(vocab) for _ in range(n_words)]
        # half the docs get a planted repeated phrase
        if i % 2 == 0 and n_words >= 12:
            phrase = words[:6]
            k = rng.randint(0, n_words - 6)
            words[k:k + 6] = phrase
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string") \
              .repartition(8)
    got = {r.doc_id: r.asDict()
           for r in ngram_repetition_signals(df).collect()}
    for i, s in docs:
        ref = _ngram_rep_ref(s, MASSIVETEXT_TOP_NGRAM, MASSIVETEXT_DUP_NGRAM)
        for k, v in ref.items():
            if isinstance(v, float):
                assert got[i][k] == pytest.approx(v, abs=1e-4), (i, k)
            else:
                assert got[i][k] == v, (i, k)


def test_ngram_repetition_rejects_bad_rules(spark):
    from data_crawler_spark.operators.text import ngram_repetition_signals
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_repetition_signals(df, top_ngrams=(), dup_ngrams=())
    with pytest.raises(ValueError):
        ngram_repetition_signals(df, top_ngrams=((1, 0.2),), dup_ngrams=())


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

def _ref_c4(text, min_wpl=5, min_sent=3, banned=()):
    """Pure-Python mirror of text.c4_rules' documented spec."""
    import re

    kept = []
    for line in text.split("\n"):
        line = line.strip()
        if not re.search(r'[.!?"]$', line):
            continue
        if len(re.split(r"\s+", line)) < min_wpl:
            continue
        if "javascript" in line.lower():
            continue
        kept.append(line)
    c4_text = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", c4_text))
    low = text.lower()
    toks = set(re.findall(r"[A-Za-z0-9]+", low))
    keep = (n_sent >= min_sent and "lorem ipsum" not in low
            and "{" not in text
            and not ({w.lower() for w in banned} & toks))
    return (c4_text, len(kept), n_sent, keep)


C4_DOCS = [
    (1, "This page has a proper first sentence.\n"
        "short line.\n"                              # <5 words: dropped
        "no terminal punctuation on this line\n"     # dropped
        "Please enable JavaScript to view comments.\n"  # dropped
        "A second real sentence stands right here!\n"
        'He said "it ends with a quote"\n'           # ends with ": kept
        "And a third full sentence closes the page?"),
    (2, "Lorem ipsum dolor sit amet consectetur adipiscing elit today.\n"
        "Another fine sentence follows the placeholder text here.\n"
        "And one more to clear the sentence minimum easily."),  # lorem: drop
    (3, "function f() { return 1; } is inline code in prose.\n"
        "Yet the page also carries real sentences like this one.\n"
        "And a third one to pass the count cleanly."),           # {: drop
    (4, "Only one good sentence lives on this page today."),     # <3 sent
    (5, ""),                                                      # empty
    (6, "The profanity badword appears in this first sentence.\n"
        "Everything else about the page looks perfectly fine here.\n"
        "Three sentences make the minimum for the filter."),      # banned
]


def test_c4_rules_vs_reference(spark):
    from data_crawler_spark.operators.text import c4_rules

    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.c4_text, r.c4_n_lines_kept, r.c4_n_sentences,
                      r.c4_keep)
           for r in c4_rules(df, banned_words=("badword",)).collect()}
    for i, text in C4_DOCS:
        assert got[i] == _ref_c4(text, banned=("badword",)), f"doc {i}"
    # the right docs survive, for the right single reasons
    assert {i for i, v in got.items() if v[3]} == {1}
    # line cleaning really removed the junk lines from doc 1
    assert "JavaScript" not in got[1][0] and "short line." not in got[1][0]


def test_c4_rules_native_plan(spark):
    """Pure map: no Exchange, no Python eval in the plan."""
    from data_crawler_spark.operators.text import c4_rules

    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    plan = c4_rules(df, banned_words=("x",))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# Text hygiene: clean_text_col + unicode_normalize
# ---------------------------------------------------------------------------

def test_clean_text_col_vs_reference(spark):
    from data_crawler_spark.operators.text import clean_text_col

    import re

    def ref(t):
        t = re.sub("\r\n?", "\n", t)
        t = re.sub("[​‌‍﻿]", "", t)
        t = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x80-\x9F]", "", t)
        t = re.sub(r"[ \t]+", " ", t)
        t = re.sub(r" ?\n ?", "\n", t)
        return t.strip()

    docs = [
        "plain text stays put",
        "tabs\tand   runs\t\t of spaces",
        "zero​width‌ chars﻿ vanish",
        "ctrl\x00chars\x1f\x7f\x9fgone",
        "  lines \n  survive \t\n as separators  ",
        "crlf\r\nlines and lone\rcarriage returns",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "i long, text string")
    got = {r.i: r.c for r in
           df.select("i", clean_text_col(F.col("text")).alias("c")).collect()}
    assert got == {i: ref(t) for i, t in enumerate(docs)}
    # the point of the op: a CRLF copy cleans to the same bytes as the
    # LF original, so content hashes agree
    assert got[5] == "crlf\nlines and lone\ncarriage returns"


def test_unicode_normalize_vs_unicodedata(spark):
    from data_crawler_spark.operators.text import unicode_normalize

    import unicodedata

    docs = [
        "ﬁligree ℌ ﬀ",                     # ligatures + letterlike
        "ＦＵＬＬｗｉｄｔｈ　ｔｅｘｔ１２３",     # full-width + ideographic space
        "café naïve",                 # combining accent
        "①②③ ¼ ㎒",                        # enclosed digits, fractions, units
        "plain ascii unchanged",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "i long, text string")
    for form in ("NFKC", "NFC"):
        got = {r.i: r.text
               for r in unicode_normalize(df, form=form).collect()}
        want = {i: unicodedata.normalize(form, t)
                for i, t in enumerate(docs)}
        assert got == want, form
    out = unicode_normalize(df, out_col="norm")
    assert out.columns == ["i", "text", "norm"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="form"):
        unicode_normalize(df, form="NFX")


def test_compression_ratio_vs_zlib(spark):
    import zlib

    from data_crawler_spark.operators.text import compression_ratio

    docs = {
        1: "the " * 500,                                 # template farm
        2: ("a riverbank village holds its yearly market under cold "
            "skies while traders argue about wool prices and children "
            "chase geese between the stalls of early winter morning"),
        3: "qZ3!kV9@mX1#pW7$rT5%yU2^sH8&dG4*fJ6(bN0)",   # high-entropy
        4: "",                                           # no ratio
        5: None,
    }
    df = spark.createDataFrame(list(docs.items()), "i long, text string")
    got = {r.i: r.compression_ratio
           for r in compression_ratio(df, "text").collect()}
    for i, t in docs.items():
        if not t:
            assert got[i] is None, i
        else:
            raw = t.encode()
            assert got[i] == pytest.approx(
                len(zlib.compress(raw, 6)) / len(raw)), i
    # the signal orders as published: template << prose < junk
    assert got[1] < 0.1 < got[2] < got[3]


def test_compression_ratio_level_and_out_col(spark):
    from data_crawler_spark.operators.text import compression_ratio

    df = spark.createDataFrame([(1, "the " * 500)], "i long, text string")
    out = compression_ratio(df, "text", out_col="cr", level=9)
    assert out.columns == ["i", "text", "cr"]
    assert out.first()["cr"] <= 0.1


def test_shard_by_token_budget_order_col_and_group_col(spark):
    """order_col packs in (order, id) order; group_col restarts the
    packing per group. Window path == two-phase path == a sequential
    Python reference in every combination."""
    import random

    from data_crawler_spark.operators.text import shard_by_token_budget

    rng = random.Random(11)
    # group None is legitimate (the equi-join-drops-nulls trap): the
    # reference treats it as its own group, sorted first like asc
    rows = [(i, rng.randint(1, 400),
             f"k{rng.randint(0, 99):02d}-{i:04d}",
             None if i % 11 == 0 else ("train", "val")[i % 5 == 0])
            for i in range(300)]
    budget = 1500

    def ref(use_order, use_group):
        want = {}
        if use_group:
            # asc null-first group order, each group (incl. None) packs
            # on its own
            groups = sorted({r[3] for r in rows},
                            key=lambda g: (g is not None, g or ""))
        else:
            groups = [...]
        for g in groups:
            sub = (rows if g is ... else [r for r in rows if r[3] == g])
            sub = list(sub)
            sub.sort(key=(lambda r: (r[2], r[0])) if use_order
                     else (lambda r: r[0]))
            acc = 0
            for i, tok, _, _ in sub:
                want[i] = acc // budget
                acc += tok
        return want

    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, okey string, split string")
    df = df.repartition(7).persist()
    try:
        for use_order in (False, True):
            for use_group in (False, True):
                want = ref(use_order, use_group)
                for p in (1, 4):
                    got = {r.doc_id: r.shard_id for r in
                           shard_by_token_budget(
                               df, budget, num_partitions=p,
                               order_col="okey" if use_order else None,
                               group_col="split" if use_group else None)
                           .collect()}
                    assert got == want, (use_order, use_group, p)
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# Document chunking (token windows with overlap)
# ---------------------------------------------------------------------------

def _chunk_mirror(text, chunk_len, overlap):
    toks = text.split()
    if not toks:
        return []
    stride = chunk_len - overlap
    out, i = [], 0
    while True:
        start = i * stride
        piece = toks[start:start + chunk_len]
        out.append((i, start, len(piece), " ".join(piece)))
        if start + chunk_len >= len(toks):
            break
        i += 1
    return out


def test_chunk_documents_mirror(spark):
    from data_crawler_spark.operators.text import chunk_documents
    import random
    rng = random.Random(9)
    rows = [(i, " ".join(f"t{j}" for j in range(rng.randint(0, 40))))
            for i in range(15)]
    rows += [(100, ""), (101, None), (102, "one two,  three!   four")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_len=10, overlap=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.token_start, r.n_tokens, r.chunk_text))
    for i, text in rows:
        want = _chunk_mirror(text or "", 10, 3)
        assert sorted(got.get(i, [])) == want, i


def test_chunk_documents_overlap_property(spark):
    from data_crawler_spark.operators.text import chunk_documents
    text = " ".join(f"w{j}" for j in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(df, chunk_len=16, overlap=4).collect(),
                  key=lambda r: r.chunk_id)
    for a, b in zip(rows, rows[1:]):
        assert b.token_start == a.token_start + 12   # stride
        assert a.chunk_text.split()[-4:] == b.chunk_text.split()[:4]
    # full coverage: last chunk reaches the end
    assert rows[-1].token_start + rows[-1].n_tokens == 100


def test_chunk_documents_validation(spark):
    from data_crawler_spark.operators.text import chunk_documents
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_len=8, overlap=8)


# ---------------------------------------------------------------------------
# Paragraph-level language consistency
# ---------------------------------------------------------------------------

def test_lang_consistency_mixed_doc(spark):
    from data_crawler_spark.operators.text import lang_consistency, paragraph_langs
    en = "some plain words without any marker hits at all"          # -> en
    es = "el proyecto es la mejor cosa que tenemos hoy aqui"        # -> es
    zh = "中文段落内容测试" * 3     # -> zh (CJK)
    rows = [
        (1, f"{en}\n{en}\n{es}"),       # en-major, es minority
        (2, f"{zh}\n\n  \n{zh}"),       # pure zh; blank paras ignored
        (3, en),                        # single-paragraph doc
        (4, ""),                        # no non-empty paragraphs -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pl = {(r.doc_id, r.pos): r.lang for r in paragraph_langs(df).collect()}
    assert pl[(1, 0)] == "en" and pl[(1, 2)] == "es" and pl[(2, 0)] == "zh"
    got = {r.doc_id: r for r in lang_consistency(df).collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert r1.doc_lang == "en" and r1.n_langs == 2 and r1.n_paras == 3
    assert abs(r1.major_frac - 2 * len(en) / (2 * len(en) + len(es))) < 1e-6
    assert got[2].doc_lang == "zh" and got[2].major_frac == 1.0
    assert got[2].n_paras == 2          # whitespace-only paragraphs excluded
    assert got[3].n_langs == 1 and got[3].major_frac == 1.0


def test_lang_consistency_tie_break(spark):
    from data_crawler_spark.operators.text import lang_consistency
    # two languages with EXACTLY equal char mass -> lang asc wins
    en = "x" * 20                                       # no markers -> en
    es = "el que es la los xx"                          # markers -> es
    es = es + "x" * (len(en) - len(es))
    assert len(es) == len(en)
    df = spark.createDataFrame([(1, f"{en}\n{es}")], "doc_id long, text string")
    row = lang_consistency(df).collect()[0]
    assert row.major_frac == 0.5 and row.doc_lang == "en"


def test_chunk_documents_plan_map_only(spark):
    from data_crawler_spark.operators.text import chunk_documents
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (chunk_documents(df, chunk_len=3, overlap=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
