"""BPE tokenizer: hand-computed merge sequence on the classic corpus,
round-trip property, memoized distributed encode == driver encode."""

import re

import pytest
from pyspark.sql import functions as F

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


def _ref_viterbi(word, logp, unk):
    """Independent DP mirror (forward enumeration over all split
    points, explicit tie rule: longer last piece wins)."""
    n = len(word)
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(j - 1, -1, -1):
            piece = word[i:j]
            lp = logp.get(piece, unk if j - i == 1 else None)
            if lp is None:
                continue
            s = best[i] + lp
            if s > best[j] or (s == best[j] and i < back[j]):
                best[j], back[j] = s, i
    out, j = [], n
    while j > 0:
        out.append(word[back[j]:j])
        j = back[j]
    return out[::-1]


def test_unigram_train_and_encode(spark):
    from data_crawler_spark.operators.tokenizer import (train_unigram,
                                                        unigram_encode,
                                                        word_freqs)
    docs = spark.createDataFrame(
        [("low low low lower lowest newest newest widest",)], "text string")
    freqs = word_freqs(docs)
    vocab = train_unigram(freqs, vocab_size=15, seed_max_piece_len=5)
    pieces = [p for p, _ in vocab]
    assert len(pieces) == len(set(pieces))
    assert len(pieces) <= 15
    # every training char survives
    chars = set("lowerstnwid")
    assert chars <= {p for p in pieces if len(p) == 1}
    # log-probs normalized-ish and sorted desc
    import math
    assert abs(sum(math.exp(lp) for _, lp in vocab) - 1.0) < 1e-6
    lps = [lp for _, lp in vocab]
    assert lps == sorted(lps, reverse=True)

    enc = unigram_encode(docs, vocab).collect()[0]["unigram_tokens"]
    # round trip: concatenating pieces rebuilds the words
    assert "".join(enc) == "lowlowlowlowerlowestnewestnewestwidest"
    # frequent whole word becomes a single piece
    assert "low" in pieces
    logp = dict(vocab)
    unk = min(logp.values()) - 10.0
    # matches the independent mirror word-by-word
    out = []
    for w in "low low low lower lowest newest newest widest".split():
        out.extend(_ref_viterbi(w, logp, unk))
    assert enc == out


def test_unigram_unseen_chars_and_determinism(spark):
    from data_crawler_spark.operators.tokenizer import (train_unigram,
                                                        unigram_encode,
                                                        word_freqs)
    train = spark.createDataFrame(
        [("the cat sat on the mat the cat",)], "text string")
    vocab = train_unigram(word_freqs(train), vocab_size=12)
    # unseen chars segment as single-char pieces, coverage total
    probe = spark.createDataFrame([("cat zyx",)], "text string")
    toks = unigram_encode(probe, vocab).collect()[0]["unigram_tokens"]
    assert "".join(toks) == "catzyx"
    assert all(len(t) == 1 for t in toks if set(t) & set("zyx"))

    # training is a function of the freqs alone, not partition layout
    v2 = train_unigram(word_freqs(train.repartition(6)), vocab_size=12)
    assert v2 == vocab

    # distributed encode == driver-side viterbi on a bigger corpus
    docs = spark.createDataFrame(
        [(f"the cat sat {i} times on the mat",) for i in range(20)],
        "text string").repartition(5)
    got = unigram_encode(docs, vocab).collect()
    import re

    from data_crawler_spark.operators.text import WORD_RE
    from data_crawler_spark.operators.tokenizer import _viterbi
    logp = dict(vocab)
    unk = min(logp.values()) - 10.0
    wre = re.compile(WORD_RE)
    for r in got:
        want = []
        for w in wre.findall(r["text"].lower()):
            want.extend(_viterbi(w, logp, unk))
        assert r["unigram_tokens"] == want


def test_unigram_vocab_size_validation(spark):
    import pytest as _pytest

    from data_crawler_spark.operators.tokenizer import (train_unigram,
                                                        word_freqs)
    docs = spark.createDataFrame([("a b",)], "text string")
    with _pytest.raises(ValueError):
        train_unigram(word_freqs(docs), vocab_size=0)
    # empty corpus
    empty = spark.createDataFrame([], "text string")
    assert train_unigram(word_freqs(empty), vocab_size=5) == []


def test_viterbi_matches_exhaustive_enumeration():
    """Seeded fuzz: for short words, enumerate EVERY segmentation and
    pick the max-score one under the documented tie rule (longer last
    piece = smaller final split point, applied at every suffix);
    _viterbi must agree exactly."""
    import itertools
    import random

    from data_crawler_spark.operators.tokenizer import _viterbi

    rng = random.Random(42)

    def best_by_enumeration(word, logp, unk):
        def score(parts):
            s = 0.0
            for p in parts:
                lp = logp.get(p)
                if lp is None:
                    if len(p) != 1:
                        return None
                    lp = unk
                s += lp
            return s

        n = len(word)
        best = None
        # iterate cut masks so that for equal scores the DP's choice
        # (greedy-longest from the right) wins: generate candidates,
        # tie-break by the reversed cut tuple ascending
        for mask in itertools.product([0, 1], repeat=n - 1):
            cuts = [i + 1 for i, b in enumerate(mask) if b]
            parts, prev = [], 0
            for c in cuts + [n]:
                parts.append(word[prev:c])
                prev = c
            sc = score(parts)
            if sc is None:
                continue
            # DP tie rule: maximize score; then at each suffix prefer
            # the longer last piece == lexicographically SMALLER
            # reversed cut sequence
            key = (sc, tuple(-c for c in reversed(cuts)))
            if best is None or key > best[0]:
                best = (key, parts)
        return best[1]

    for trial in range(40):
        alpha = "ab" if trial % 2 else "abc"
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        pieces = {word[i:j] for i in range(len(word))
                  for j in range(i + 1, min(len(word), i + 4) + 1)}
        vocab = {p for p in pieces if rng.random() < 0.5}
        vocab |= set(alpha) if rng.random() < 0.7 else set()
        # dyadic grid (1/64ths) so float addition is EXACT: the DP
        # compares prefix sums, the mirror whole-segmentation sums,
        # and with inexact probs two equal-score paths can differ by
        # an ulp at an intermediate prefix yet round to equal at the
        # final sum — a tie for one side but not the other
        logp = {p: round(rng.uniform(-5.0, -0.5) * 64) / 64.0
                for p in vocab}
        unk = -12.0
        got = _viterbi(word, logp, unk)
        want = best_by_enumeration(word, logp, unk)
        assert "".join(got) == word
        assert got == want, (word, sorted(logp.items()), got, want)


def test_pack_token_sequences_exact_and_invariant(spark):
    from data_crawler_spark.operators.tokenizer import (
        pack_token_sequences)
    docs = [(f"d{i:02d}", [f"t{i}_{j}" for j in range(n)])
            for i, n in enumerate([3, 7, 1, 12, 0, 5])]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<string>")

    # python mirror: concat in id order with eos, cut into L windows
    stream = []
    for d, toks in sorted(docs):
        if toks or True:  # eos makes every doc at least 1 token
            stream.extend(toks + ["</s>"])
    L = 5
    want = {i: stream[i * L:(i + 1) * L]
            for i in range((len(stream) + L - 1) // L)}

    got = {r["seq_id"]: list(r["tokens"])
           for r in pack_token_sequences(df, L, eos="</s>").collect()}
    assert got == want
    rows = {r["seq_id"]: (r["n_tokens"], r["n_docs"]) for r in
            pack_token_sequences(df, L, eos="</s>").collect()}
    assert all(n == len(want[s]) for s, (n, _) in rows.items())

    # partitioning invariance
    re = {r["seq_id"]: list(r["tokens"])
          for r in pack_token_sequences(df.repartition(7), L, eos="</s>",
                                        num_partitions=3).collect()}
    assert re == got

    # drop_last removes only the short tail
    full = pack_token_sequences(df, L, eos="</s>", drop_last=True)
    assert {r["seq_id"] for r in full.collect()} == {
        s for s, t in want.items() if len(t) == L}

    # no eos: zero-token docs vanish, others concatenate raw
    stream2 = []
    for d, toks in sorted(docs):
        stream2.extend(toks)
    want2 = {i: stream2[i * L:(i + 1) * L]
             for i in range((len(stream2) + L - 1) // L)}
    got2 = {r["seq_id"]: list(r["tokens"])
            for r in pack_token_sequences(df, L).collect()}
    assert got2 == want2

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_token_sequences(df, 0)


# ---------------------------------------------------- byte-level BPE

def test_bytes_to_unicode_bijection():
    from data_crawler_spark.operators.tokenizer import _bytes_to_unicode

    table = _bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    assert table[ord("a")] == "a" and table[32] == "Ġ" and table[10] == "Ċ"


def test_byte_pretokenize_native_matches_regex_module(spark):
    import regex

    from data_crawler_spark.operators.tokenizer import BYTE_PRETOKEN_RE

    texts = [
        "Hello world",
        "it's can't we'll I'd you're I've I'm",
        "  two  spaces\tand\nnewline ",
        "price: $1,234.56!!",
        "café naïve 東京 2026",
        "emoji 😀 end",
        "trailing spaces   ",
        "",
        # Unicode whitespace: Java \s is ASCII-only, so the pattern
        # spells the regex-module \s set explicitly — these pin it
        "a\u00a0b nbsp\u00a0\u00a0run",      # &nbsp; everywhere in HTML
        "thin\u2009space\u2028ls\u3000ideo",
        "mix \u00a0\u2007 after-ascii-space\u00a0",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.g for r in df.select(
        F.regexp_extract_all("text", F.lit(BYTE_PRETOKEN_RE), 0)
        .alias("g")).collect()]
    pre = regex.compile(BYTE_PRETOKEN_RE)
    for t, g in zip(texts, got):
        assert g == pre.findall(t), repr(t)
        assert "".join(g) == t, repr(t)     # pretokens partition the text


def test_train_byte_bpe_hand_computed(spark):
    from data_crawler_spark.operators.tokenizer import (
        byte_word_freqs,
        train_byte_bpe,
    )

    # pretokens: "aa"×1, "Ġaa"×1, "Ġb"×1 -> pair (a,a) count 2 merges,
    # then every remaining pair is unique -> early stop
    df = spark.createDataFrame([("aa aa b",)], "text string")
    merges = train_byte_bpe(byte_word_freqs(df), num_merges=10)
    assert merges == [("a", "a")]


def test_byte_bpe_roundtrip_and_distributed_encode(spark):
    from data_crawler_spark.operators.tokenizer import (
        byte_bpe_decode,
        byte_bpe_encode,
        byte_word_freqs,
        train_byte_bpe,
    )

    corpus = [
        "the cat sat on the mat",
        "The Cat SAT!  On  the mat...",
        "thé cät 😀 sat\n\ttabbed",
        "numbers 123 and 456, it's fine",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)],
                               "doc_id int, text string")
    merges = train_byte_bpe(byte_word_freqs(df), num_merges=30)
    assert merges                       # learned something
    enc = {r.doc_id: r.bpe_tokens
           for r in byte_bpe_encode(df, merges).collect()}
    for i, t in enumerate(corpus):
        # losslessness: case, runs of whitespace, unicode, emoji
        assert byte_bpe_decode(enc[i]) == t, repr(t)
    # merges actually compress vs raw byte symbols
    raw = {r.doc_id: r.bpe_tokens
           for r in byte_bpe_encode(df, []).collect()}
    assert sum(map(len, enc.values())) < sum(map(len, raw.values()))
    for i, t in enumerate(corpus):
        assert byte_bpe_decode(raw[i]) == t
    with pytest.raises(ValueError):
        train_byte_bpe(byte_word_freqs(df), num_merges=-1)


def test_byte_pretokenize_engine_agreement_codepoint_sweep(spark):
    """Pin the Java-regex / regex-module agreement of BYTE_PRETOKEN_RE
    across the whole BMP: for every non-surrogate codepoint c, the
    native pretokenization of f"a {c}b" must equal the module's. This
    is the invariant byte-BPE training (native pass) and encoding
    (Arrow UDF) both lean on — a \\s-class divergence (e.g. NBSP) would
    train merges on pretokens encode-time never produces. Codepoints
    whose \\p{L}/\\p{N} CATEGORY differs between the engines (Java 17
    ships Unicode 13; the regex module a newer table — e.g. U+0870..
    Arabic Ext-B landed in Unicode 14) are excluded but counted: that
    skew must stay tiny and must never include a whitespace char."""
    import regex

    from data_crawler_spark.operators.tokenizer import BYTE_PRETOKEN_RE

    pre = regex.compile(BYTE_PRETOKEN_RE)
    cps = [c for c in range(0x10000) if not 0xD800 <= c <= 0xDFFF]
    df = spark.createDataFrame(
        [(c, f"a {chr(c)}b") for c in cps], "cp int, text string")
    got = df.select(
        "cp", "text",
        F.regexp_extract_all("text", F.lit(BYTE_PRETOKEN_RE), 0)
        .alias("g"),
        F.substring("text", 3, 1).rlike(r"^[\p{L}\p{N}]$")
        .alias("java_ln")).collect()
    ln = regex.compile(r"^[\p{L}\p{N}]$")
    skew = [r.cp for r in got if r.java_ln != bool(ln.match(chr(r.cp)))]
    assert len(skew) < 500, f"category skew exploded: {len(skew)}"
    assert not any(regex.match(r"\s", chr(c)) for c in skew)
    skew_set = set(skew)
    bad = [(r.text, r.g, pre.findall(r.text)) for r in got
           if r.cp not in skew_set and r.g != pre.findall(r.text)]
    assert not bad, f"{len(bad)} disagreeing codepoints, first: {bad[:5]!r}"


# ---------------------------------------------------------------------------
# encoding_stats (tokenizer data-card numbers)
# ---------------------------------------------------------------------------

def test_encoding_stats_mirror(spark):
    from data_crawler_spark.operators.tokenizer import encoding_stats

    rows = [
        ("en", "hello wide world", ["hel", "lo", " wide", " world"]),
        ("en", "naïve café", ["na", "ïve", " ca", "fé"]),
        ("de", "donau dampf schiff", ["don", "au", " dampf", " schi",
                                      "ff"]),
        ("de", "", []),
        ("xx", None, None),
    ]
    df = spark.createDataFrame(
        rows, "lang string, text string, tokens array<string>")

    def exp(subset):
        n_tok = sum(len(t) if t else 0 for _, _, t in subset)
        n_bytes = sum(len(x.encode("utf-8")) if x else 0
                      for _, x, _ in subset)
        n_words = sum(len(x.split()) if x else 0 for _, x, _ in subset)
        return (len(subset), n_tok, n_bytes, n_words,
                round(n_bytes / n_tok, 4) if n_tok else None,
                round(n_tok / n_words, 4) if n_words else None)

    g = encoding_stats(df).first()
    assert (g["n_docs"], g["n_tokens"], g["n_bytes"], g["n_words"],
            g["bytes_per_token"], g["fertility"]) == exp(rows)

    per = {r["lang"]: r for r in
           encoding_stats(df, group_cols=("lang",)).collect()}
    for lang in ("en", "de", "xx"):
        sub = [r for r in rows if r[0] == lang]
        r = per[lang]
        assert (r["n_docs"], r["n_tokens"], r["n_bytes"], r["n_words"],
                r["bytes_per_token"], r["fertility"]) == exp(sub), lang
    assert per["xx"]["bytes_per_token"] is None
    assert per["xx"]["fertility"] is None
