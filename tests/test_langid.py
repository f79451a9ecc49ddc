"""Cavnar-Trenkle n-gram language ID (operators/langid.py) vs a
pure-Python mirror of the spec."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_crawler_spark.operators.langid import (
    char_ngrams_col,
    langid_classify,
    train_language_profiles,
)

EN = [
    "the quick brown fox jumps over the lazy dog",
    "this is the house that jack built and the cat sat",
    "where there is a will there is a way to the sea",
]
DE = [
    "der schnelle braune fuchs springt ueber den faulen hund",
    "das ist das haus das der junge gebaut hat und die katze",
    "wo ein wille ist ist auch ein weg zum meer und zurueck",
]
HELD_OUT = [
    ("d1", "the dog and the fox went over the hill", "en"),
    ("d2", "der hund und der fuchs gingen ueber den berg", "de"),
    ("d3", "a way to the house of the cat", "en"),
    ("d4", "die katze ist in dem haus und schlaeft", "de"),
]


def _grams(text, n_max):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    if not norm:
        return []
    t = f" {norm} "
    out = []
    for n in range(1, n_max + 1):
        out += [t[i:i + n] for i in range(len(t) - n + 1)]
    return out


def _rank(counter, top_k):
    ranked = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
    return {g: i + 1 for i, (g, _) in enumerate(ranked[:top_k])}


def _ref_profiles(top_k, n_max):
    out = {}
    for lang, texts in (("en", EN), ("de", DE)):
        c = Counter()
        for t in texts:
            c.update(_grams(t, n_max))
        out[lang] = _rank(c, top_k)
    return out


def _ref_classify(text, profiles, top_k, n_max):
    c = Counter(_grams(text, n_max))
    if not c:
        return None, None
    doc = _rank(c, top_k)
    best = None
    for lang in sorted(profiles):
        p = profiles[lang]
        d = sum(abs(r - p[g]) if g in p else top_k
                for g, r in doc.items())
        if best is None or d < best[1]:
            best = (lang, d)
    return best


def _train_df(spark):
    rows = [(t, "en") for t in EN] + [(t, "de") for t in DE]
    return spark.createDataFrame(rows, "text string, lang string")


def test_char_ngrams_match_mirror(spark):
    rows = [("a b", ), ("  Hello   World ", ), ("", ), (None, )]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(char_ngrams_col(F.col("text"), 3).alias("g")).collect()
    for row, (text,) in zip(got, rows):
        assert row.g == _grams(text or "", 3)


@pytest.mark.parametrize("top_k,n_max", [(60, 3), (25, 2)])
def test_profiles_match_mirror(spark, top_k, n_max):
    prof = train_language_profiles(_train_df(spark), top_k=top_k,
                                   n_max=n_max).collect()
    want = _ref_profiles(top_k, n_max)
    got = {}
    for r in prof:
        got.setdefault(r.lang, {})[r.gram] = r.rank
    assert got == want


def test_classify_matches_mirror_and_labels(spark):
    top_k, n_max = 60, 3
    profiles = train_language_profiles(_train_df(spark), top_k=top_k,
                                       n_max=n_max)
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT] + [("empty", "   ")],
        "doc_id string, text string")
    got = {r.doc_id: (r.lang_pred, r.lang_pred_distance)
           for r in langid_classify(docs, profiles, top_k=top_k,
                                    n_max=n_max).collect()}
    ref_prof = _ref_profiles(top_k, n_max)
    for i, t, want_lang in HELD_OUT:
        lang, dist = _ref_classify(t, ref_prof, top_k, n_max)
        assert got[i] == (lang, dist), i
        assert lang == want_lang, i      # and the mirror gets it right
    assert got["empty"] == (None, None)


def test_validation(spark):
    with pytest.raises(ValueError):
        train_language_profiles(_train_df(spark), top_k=0)


def test_char_ngrams_unicode_whitespace_matches_mirror(spark):
    """NBSP/ideographic-space text: the native normalization collapses
    the same Unicode whitespace the mirror's re \\s does — grams must
    never contain \\xa0 (the Java-ASCII-\\s divergence, fixed)."""
    import re

    from pyspark.sql import functions as F

    from data_crawler_spark.operators.langid import char_ngrams_col

    texts = ["the dog", "a　b\tc\r\n", " lead and trail "]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.g for r in df.select(
        char_ngrams_col(F.col("text")).alias("g")).collect()]
    for t, g in zip(texts, got):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        padded = f" {norm} "
        want = [padded[i:i + n]
                for n in (1, 2, 3)
                for i in range(len(padded) - n + 1)]
        assert sorted(g) == sorted(want), repr(t)
        assert not any(" " in x for x in g)
