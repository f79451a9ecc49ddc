"""BPE tokenizer: hand-computed merge sequence on the classic corpus,
round-trip property, memoized distributed encode == driver encode."""

import re

import pytest

from data_crawler_spark.operators.tokenizer import (END, _encode_word,
                                                    bpe_encode,
                                                    bpe_token_count,
                                                    train_bpe, word_freqs)

# Sennrich-style toy corpus: frequencies force a known merge order.
TOY = [
    (1, "low low low low low"),
    (2, "lower lower"),
    (3, "newest newest newest newest newest newest"),
    (4, "widest widest widest"),
]


def _ref_freqs(rows):
    out = {}
    for _, t in rows:
        for w in re.findall(r"[A-Za-z0-9]+", t.lower()):
            out[w] = out.get(w, 0) + 1
    return out


@pytest.fixture(scope="module")
def toy_df(spark):
    return spark.createDataFrame(TOY, "doc_id long, text string")


def test_word_freqs(spark, toy_df):
    got = {r.word: r.cnt for r in word_freqs(toy_df).collect()}
    assert got == _ref_freqs(TOY)
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_merge_sequence_hand_computed(spark, toy_df):
    # pair counts round 1: ('e','s') and ('s','t') and ('t',END) each
    # 6+3=9; ('e','s') wins the lexicographic tie-break. Round 2:
    # ('es','t') 9 beats ('t',END) now consumed into... ('t', END) is
    # still 9 — ('es','t') < ('t', '</w>') lexicographically. Round 3:
    # ('est', END) 9. Round 4: 'l','o' = 5+2 = 7.
    merges = train_bpe(word_freqs(toy_df), num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_early_stop_and_zero_merges(spark, toy_df):
    freqs = word_freqs(toy_df)
    assert train_bpe(freqs, 0) == []
    # a huge budget stops when no pair occurs twice
    merges = train_bpe(freqs, 10_000)
    assert len(merges) < 60
    # fully-merged high-frequency words become single symbols
    assert _encode_word("newest", {p: i for i, p in enumerate(merges)}) \
        == ["newest" + END]


def test_encode_matches_driver_reference(spark, toy_df):
    merges = train_bpe(word_freqs(toy_df), 6)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r.bpe_tokens
           for r in bpe_encode(toy_df, merges).collect()}
    for i, t in TOY:
        want = []
        for w in re.findall(r"[A-Za-z0-9]+", t.lower()):
            want.extend(_encode_word(w, ranks))
        assert out[i] == want
    # round-trip: stripping END and joining reconstructs the words
    for i, t in TOY:
        joined = "".join(out[i]).replace(END, "")
        assert joined == "".join(re.findall(r"[A-Za-z0-9]+", t.lower()))


def test_unseen_words_fall_back_to_chars(spark, toy_df):
    merges = train_bpe(word_freqs(toy_df), 4)
    df = toy_df.sparkSession.createDataFrame(
        [(9, "zq lowest")], "doc_id long, text string")
    out = bpe_encode(df, merges).collect()[0].bpe_tokens
    # 'zq' shares no merge: pure chars + END; 'lowest' reuses both the
    # 'lo' and 'est</w>' merges learned from other words
    assert out[:3] == ["z", "q", END]
    assert "lo" in out and ("est" + END) in out


def test_token_count_and_empty(spark, toy_df):
    merges = train_bpe(word_freqs(toy_df), 4)
    df = toy_df.sparkSession.createDataFrame(
        [(1, "low low"), (2, ""), (3, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.bpe_n_tokens
           for r in bpe_token_count(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    assert got == {1: 2 * len(_encode_word("low", ranks)), 2: 0, 3: 0}


def test_max_words_cap_is_deterministic(spark):
    # cap keeps the (cnt desc, word asc) top rows: a low-frequency word
    # outside the cap contributes no pairs
    rows = [(1, "aaa " * 50 + "bbb " * 50 + "rare")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m_all = train_bpe(word_freqs(df), 2, max_words=3)
    m_cap = train_bpe(word_freqs(df), 2, max_words=2)
    assert m_all != [] and m_cap != []
    ranks = {p: i for i, p in enumerate(m_cap)}
    assert _encode_word("rare", ranks)[0] == "r"  # never merged

    with pytest.raises(ValueError):
        train_bpe(word_freqs(df), -1)
    with pytest.raises(ValueError):
        train_bpe(word_freqs(df), 1, max_words=0)
