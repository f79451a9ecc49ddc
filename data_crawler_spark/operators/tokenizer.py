"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016) — the vocabulary-building step of a training-data pipeline,
split along the line real tokenizer trainers use at corpus scale:

* the CORPUS-SCALE part — counting word frequencies over 100 TB of
  text — is one Spark explode + map-side-partial groupBy
  (``word_freqs``); every shuffle row is (word, partial count);
* the merge loop runs DRIVER-SIDE over the collected top-``max_words``
  (word, count) table (``train_bpe``) — the table is vocabulary-sized
  (bounded by the cap, collected ordered so the cut is deterministic),
  which is exactly how production BPE trainers work: they never
  stream the corpus through the merge loop, they iterate over the
  compact word-frequency dictionary;
* ENCODING goes back to scale (``bpe_encode``): one Arrow-batched
  pandas UDF per document with the merge table shipped in the UDF
  closure (≤ a few hundred KB at 32k merges) and a per-batch
  word→tokens memo, so each distinct word in a batch is encoded once.

Training spec (mirrored by the hand-computed and pure-Python checks in
tests/test_tokenizer.py): a word is a WORD_RE token of the lowered
text; its initial symbol sequence is its characters plus a final
``</w>`` marker; each round counts adjacent symbol pairs weighted by
word frequency and merges the (count desc, pair lexicographic asc)
maximum — the deterministic tie-break — stopping early when no pair
occurs twice. Encoding replays merges by rank (merge the present pair
with the lowest rank, all its occurrences left-to-right, repeat),
which reproduces the training-time segmentation exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.text import WORD_RE, tokens_col

END = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-scale pass of BPE
    training, on THE shared token stream (text.tokens_col). Explode +
    groupBy with map-side partial aggregation; the heaviest key is the
    corpus's most frequent word, which is exactly the key partial agg
    collapses best."""
    toks = tokens_col(F.col(text_col))
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + cnt
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]
                ) -> tuple[str, ...]:
    out, i, joined = [], 0, pair[0] + pair[1]
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _train_merges(freqs: DataFrame, num_merges: int, max_words: int,
                  to_symbols) -> list[tuple[str, str]]:
    """The ONE BPE merge loop (char- and byte-level trainers differ
    only in ``to_symbols``, a word's initial symbol tuple): bounded
    ordered collect ((cnt desc, word asc) so the cap cuts
    deterministically), then O(num_merges · vocab) pure Python —
    (count desc, pair asc) tie-break, <2 early stop."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    rows = (freqs.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_words).collect())
    vocab = {to_symbols(r.word): int(r.cnt) for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        # min over (-count, pair): max count, then the lexicographically
        # smallest pair — the deterministic tie-break
        best = min(((-c, p) for p, c in counts.items()), default=None)
        if best is None or -best[0] < 2:
            break
        pair = best[1]
        merges.append(pair)
        vocab = {_merge_word(s, pair): c for s, c in vocab.items()}
    return merges


def _replay_merges(syms: list[str],
                   ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode-time merge replay, shared by both tokenizers: merge the
    present pair with the lowest rank, all occurrences, repeat."""
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, pair = min(ranked)
        syms = list(_merge_word(tuple(syms), pair))
    return syms


def train_bpe(freqs: DataFrame, num_merges: int,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Run the BPE merge loop over the top-``max_words`` rows of a
    ``word_freqs`` frame and return the ranked merge list (see
    _train_merges for the shared driver-side shape)."""
    return _train_merges(freqs, num_merges, max_words,
                         lambda w: tuple(w) + (END,))


def _encode_word(word: str, ranks: dict[tuple[str, str], int]
                 ) -> list[str]:
    return _replay_merges(list(word) + [END], ranks)


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Append ``out_col``: the BPE token sequence of each document
    (WORD_RE words of the lowered text, each segmented by replaying
    ``merges`` in rank order). One Arrow-batched pandas UDF — the merge
    table rides the closure, a per-batch word→tokens memo encodes each
    distinct word once per batch, and nothing shuffles."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    import re
    word_re = re.compile(WORD_RE)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def doc(text):
            out: list[str] = []
            for w in word_re.findall((text or "").lower()):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return s.map(doc)

    return df.withColumn(out_col, _enc(F.col(text_col)))


def bpe_token_count(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    out_col: str = "bpe_n_tokens") -> DataFrame:
    """Token COUNT under a trained tokenizer — what a shard packer or
    mixture budgeter actually needs; same UDF shape, returns the size
    only so the token array never materializes in the output."""
    enc = bpe_encode(df, merges, text_col, "_bpe_toks")
    return (enc.withColumn(out_col, F.size(F.col("_bpe_toks"))
                           .cast("long"))
            .drop("_bpe_toks"))


# ---------------------------------------------------------------------------
# Unigram LM tokenizer (Kudo 2018, "Subword Regularization") — the
# SentencePiece-style sibling of BPE, split along the SAME line:
# word_freqs is the corpus-scale pass, training runs driver-side over
# the bounded (word, cnt) table, encoding goes back to scale as one
# Arrow UDF with Viterbi segmentation.
# ---------------------------------------------------------------------------

def _viterbi(word: str, logp: dict[str, float],
             unk_logp: float) -> list[str]:
    """Max-likelihood segmentation of ``word`` under piece log-probs.
    Deterministic tie-break: at each position prefer the LONGER last
    piece (smaller split point) on equal score. Characters absent from
    the vocab segment as single-char pieces at ``unk_logp``."""
    n = len(word)
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    max_len = max((len(p) for p in logp), default=1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None and j - i == 1:
                lp = unk_logp  # char fallback keeps coverage total
            if lp is None:
                continue
            score = best[i] + lp
            # strictly-greater keeps the SMALLEST i (longest piece)
            # among ties because i ascends
            if score > best[j]:
                best[j] = score
                back[j] = i
    out, j = [], n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def train_unigram(freqs: DataFrame, vocab_size: int,
                  max_words: int = 100_000,
                  seed_max_piece_len: int = 8,
                  seed_factor: int = 4,
                  n_em_iters: int = 2,
                  prune_frac: float = 0.25) -> list[tuple[str, float]]:
    """Train a unigram-LM vocabulary over a ``word_freqs`` frame:
    returns ``[(piece, logp)]`` with at most ``vocab_size`` pieces
    (single characters are never pruned, so an alphabet larger than
    ``vocab_size`` floors the result at the alphabet), log-probs
    normalized. The collect is the same bounded driver step as
    ``train_bpe`` (top-``max_words`` rows, (cnt desc, word asc) so the
    cap cuts deterministically).

    Spec (the Kudo 2018 recipe with the E-step HARD — Viterbi counts
    instead of forward-backward expectations — a documented
    simplification that keeps every number exactly reproducible by the
    pure-Python mirror in tests): seed the vocabulary with all word
    substrings up to ``seed_max_piece_len`` kept to the top
    ``seed_factor × vocab_size`` by occurrence mass (ties lexicographic
    asc; single characters ALWAYS kept — coverage must stay total);
    then alternate (a) ``n_em_iters`` rounds of segment-all-words /
    re-estimate piece probs from segmentation counts, (b) prune the
    lowest-mass ``prune_frac`` of multi-char pieces, until the vocab
    fits ``vocab_size``. Pieces that win no segmentations die at the
    next prune; single chars are never pruned."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    import math

    rows = (freqs.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_words).collect())
    words = [(r["word"], int(r["cnt"])) for r in rows]
    if not words:
        return []

    chars = {c for w, _ in words for c in w}
    # seed: substring occurrence mass (each occurrence weighted by the
    # word's count), capped to seed_factor * vocab_size multi-char
    # pieces by (mass desc, piece asc)
    mass: dict[str, float] = {}
    for w, cnt in words:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(L, i + seed_max_piece_len) + 1):
                p = w[i:j]
                mass[p] = mass.get(p, 0.0) + cnt
    multi = sorted((p for p in mass if len(p) > 1),
                   key=lambda p: (-mass[p], p))
    keep = max(0, seed_factor * vocab_size - len(chars))
    vocab = chars | set(multi[:keep])

    def normalize(counts: dict[str, float]) -> dict[str, float]:
        total = sum(counts.values())
        floor = 1e-10  # pieces with no wins keep a tiny mass
        return {p: math.log((counts.get(p, 0.0) + floor)
                            / (total + floor * len(vocab)))
                for p in vocab}

    # init probs from seed mass
    logp = normalize({p: mass.get(p, 1.0) for p in vocab})
    unk = min(logp.values()) - 10.0
    while True:
        for _ in range(n_em_iters):
            counts: dict[str, float] = {}
            for w, cnt in words:
                for piece in _viterbi(w, logp, unk):
                    counts[piece] = counts.get(piece, 0.0) + cnt
            logp = normalize(counts)
            unk = min(logp.values()) - 10.0
        n_multi = sum(1 for p in vocab if len(p) > 1)
        target_multi = max(0, vocab_size - len(chars))
        if n_multi <= target_multi:
            break
        # prune the lowest-mass multi-char pieces (never below target)
        n_drop = max(1, min(int(n_multi * prune_frac),
                            n_multi - target_multi))
        ranked = sorted((p for p in vocab if len(p) > 1),
                        key=lambda p: (logp[p], p))
        vocab -= set(ranked[:n_drop])
        logp = {p: lp for p, lp in logp.items() if p in vocab}

    # final renormalization over the surviving vocab
    logp = normalize({p: math.exp(lp) for p, lp in logp.items()})
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_encode(df: DataFrame, vocab: list[tuple[str, float]],
                   text_col: str = "text",
                   out_col: str = "unigram_tokens") -> DataFrame:
    """Append ``out_col``: each document's max-likelihood unigram-LM
    segmentation (WORD_RE words of the lowered text through Viterbi).
    Same scale shape as ``bpe_encode``: one Arrow-batched pandas UDF,
    vocab in the closure, per-batch word→pieces memo, zero shuffle.
    Characters unseen at training segment as single-char pieces (the
    unk fallback), so coverage is total."""
    import re
    word_re = re.compile(WORD_RE)
    logp = dict(vocab)
    unk = (min(logp.values()) - 10.0) if logp else -30.0

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def doc(text):
            out: list[str] = []
            for w in word_re.findall((text or "").lower()):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _viterbi(w, logp, unk)
                out.extend(got)
            return out

        return s.map(doc)

    return df.withColumn(out_col, _enc(F.col(text_col)))


def pack_token_sequences(df: DataFrame, seq_len: int,
                         tokens_col: str = "tokens",
                         id_col: str = "doc_id",
                         eos: str | None = None,
                         num_partitions: int | None = None,
                         drop_last: bool = False,
                         release_into: list | None = None) -> DataFrame:
    """Fixed-length SEQUENCE PACKING — the step that turns a cleaned,
    tokenized corpus into what an LM pretraining loader actually
    consumes: documents concatenated in a deterministic total order
    (``id_col`` ascending), ``eos`` appended per document when given,
    the stream cut into ``seq_len``-token rows. Returns ``(seq_id,
    tokens, n_tokens, n_docs)``; the final partial sequence is kept
    (``n_tokens < seq_len``) unless ``drop_last``.

    Distributed shape: the doc→offset assignment is the shared
    two-phase exclusive prefix sum (operators/prefix.py — P longs of
    driver traffic, no task holds more than ~1/P of the corpus); each
    doc then EXPLODES into only the sequences it overlaps (a doc of n
    tokens touches ⌈n/L⌉+1 sequences at most) carrying the exact token
    slice, and ONE groupBy(seq_id) reassembles slices with an
    array_sort on the in-sequence offset — deterministic under any
    partitioning (tested). Token arrays cross the shuffle exactly
    once, sliced to what each sequence needs.

    The prefix sum pins a boundary cache holding every doc's full
    token array — the largest frame in the pipeline. Pass
    ``release_into`` to receive it for ``unpersist()`` once the packed
    output is materialized (same contract as with_crawl_seq)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    from data_crawler_spark.operators.prefix import exclusive_prefix_sum

    spark = df.sparkSession
    if num_partitions is None:
        try:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            num_partitions = spark.sparkContext.defaultParallelism

    toks = (F.concat(F.col(tokens_col), F.array(F.lit(eos)))
            if eos is not None else F.col(tokens_col))
    base = (df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
            .withColumn("_n", F.size("_toks").cast("long"))
            .filter(F.col("_n") > 0))
    offs = exclusive_prefix_sum(base, [F.col("_id")], F.col("_n"),
                                "_off", num_partitions,
                                release_into=release_into)
    L = F.lit(int(seq_len)).cast("long")
    # integral div, not floor(double /): corpus-scale token offsets sit
    # near double's 2^53 integer limit (same rule as token_shard_ids)
    first = F.expr(f"_off div CAST({int(seq_len)} AS BIGINT)")
    last = F.expr(f"(_off + _n - 1) div CAST({int(seq_len)} AS BIGINT)")
    spans = offs.select(
        "_toks", "_off", "_n",
        F.explode(F.sequence(first, last)).alias("seq_id"))
    seq_start = F.col("seq_id") * L
    lo = F.greatest(seq_start - F.col("_off"), F.lit(0))       # in doc
    hi = F.least(F.col("_n"), seq_start + L - F.col("_off"))
    piece = F.slice("_toks", (lo + 1).cast("int"),
                    (hi - lo).cast("int"))
    off_in_seq = F.greatest(F.col("_off") - seq_start, F.lit(0))
    parts = spans.select(
        "seq_id",
        F.struct(off_in_seq.alias("o"), piece.alias("p")).alias("part"))
    out = (parts.groupBy("seq_id")
           .agg(F.flatten(F.transform(
                    F.array_sort(F.collect_list("part")),
                    lambda x: x["p"])).alias("tokens"),
                F.count("*").alias("n_docs"))
           .withColumn("n_tokens", F.size("tokens").cast("long"))
           .select("seq_id", "tokens", "n_tokens", "n_docs"))
    if drop_last:
        out = out.filter(F.col("n_tokens") == int(seq_len))
    return out


# ---------------------------------------------------------------------------
# Byte-level BPE (Radford et al. 2019, GPT-2) — the production variant:
# case- and whitespace-preserving, lossless on ANY byte sequence (no
# unknown tokens, ever), with the published byte↔printable-unicode
# bijection so merges operate on ordinary strings. Same corpus split as
# the char BPE above: the pretoken-frequency count is the one
# corpus-scale Spark pass (fully native — Java regex supports the
# \p{L}/\p{N} classes and the trailing-space lookahead), the merge loop
# runs driver-side on the bounded table, encoding is one Arrow UDF.
# ---------------------------------------------------------------------------

# GPT-2's pretokenizer: contractions, space-prefixed letter/number/
# punctuation runs, then whitespace (keeping the final space attached
# to the NEXT word via the trailing lookahead). Shared verbatim by the
# native corpus pass (Java regex) and the encode UDF / test mirror
# (the `regex` module — stdlib `re` lacks \p{L}). The published
# pattern's \s/\S are ENGINE-DEPENDENT — Java \s is ASCII-only while
# the regex module's is Unicode — so whitespace is spelled as the
# explicit Unicode set the regex module matches (codepoint-swept
# equality test pins the two engines' agreement): a corpus full of
# &nbsp; must pretokenize identically at train and encode time.
_WS = (r"\t\n\x0B\f\r \x85\xA0\u1680\u2000-\u200A"
       r"\u2028\u2029\u202F\u205F\u3000")
BYTE_PRETOKEN_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
                    r"| ?\p{L}+| ?\p{N}+| ?[^" + _WS + r"\p{L}\p{N}]+"
                    r"|[" + _WS + r"]+(?![^" + _WS + r"])"
                    r"|[" + _WS + r"]+")


def _bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→printable-char bijection: printable latin-1
    bytes map to themselves, the rest to U+0100.. in order (space →
    'Ġ', newline → 'Ċ', …)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = _bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _to_byte_symbols(pretoken: str) -> str:
    return "".join(_B2U[b] for b in pretoken.encode("utf-8"))


def byte_word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(pretoken, cnt) over the corpus under the GPT-2 pretokenizer —
    byte-level BPE's one corpus-scale pass, entirely native (the
    pretokens are RAW text here; the byte→unicode mapping happens on
    the bounded collected table and in the encode UDF, so the corpus
    never crosses a Python stage). Case/whitespace preserved — that is
    the point of the byte-level variant."""
    toks = F.regexp_extract_all(F.col(text_col),
                                F.lit(BYTE_PRETOKEN_RE), 0)
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count("*").alias("cnt")))


def train_byte_bpe(freqs: DataFrame, num_merges: int,
                   max_words: int = 100_000) -> list[tuple[str, str]]:
    """The BPE merge loop over byte-unicode symbol sequences (NO
    end-of-word marker — GPT-2 encodes word boundaries in the leading-
    space bytes instead). The loop IS _train_merges — only the initial
    symbol tuple differs from the char-level trainer."""
    return _train_merges(freqs, num_merges, max_words,
                         lambda w: tuple(_to_byte_symbols(w)))


def _encode_byte_word(mapped: str, ranks: dict[tuple[str, str], int]
                      ) -> list[str]:
    return _replay_merges(list(mapped), ranks)


def byte_bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    out_col: str = "bpe_tokens") -> DataFrame:
    """Append ``out_col``: the byte-level BPE token sequence of each
    document. One Arrow-batched pandas UDF (merge ranks + the byte
    table in the closure, per-batch pretoken memo); the pretokenizer
    is BYTE_PRETOKEN_RE via the `regex` module — the identical pattern
    the native corpus pass compiles in Java."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    import regex
    pre_re = regex.compile(BYTE_PRETOKEN_RE)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def doc(text):
            out: list[str] = []
            for w in pre_re.findall(text or ""):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_byte_word(
                        _to_byte_symbols(w), ranks)
                out.extend(got)
            return out

        return s.map(doc)

    return df.withColumn(out_col, _enc(F.col(text_col)))


def byte_bpe_decode(tokens: list[str]) -> str:
    """Inverse of the encode (driver-side helper): tokens → byte
    string → UTF-8 text. Byte-level BPE is lossless by construction —
    round-trips case, whitespace, and any unicode exactly."""
    data = bytes(_U2B[u] for t in tokens for u in t)
    return data.decode("utf-8")


def encoding_stats(df: DataFrame, tokens_col: str = "tokens",
                   text_col: str = "text",
                   group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Tokenizer-quality report over an ENCODED corpus (the dataset-
    card numbers a tokenizer choice is judged on): per group —
    ``n_docs, n_tokens, n_bytes, bytes_per_token`` (compression:
    UTF-8 bytes each token carries; higher = better for a byte-priced
    context window) and ``fertility`` (tokens per whitespace word,
    Ács' metric — multilingual tokenizers are compared on it; lower =
    fewer splits per word). One map-side-partial aggregation over the
    scan — O(groups) output, no join, no window. Null token arrays /
    texts count as empty."""
    from data_crawler_spark.operators.text import ws_split_col

    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.coalesce(F.size(tokens_col), F.lit(0))
    staged = df.select(
        *group_cols,
        toks.alias("_ntok"),
        F.octet_length(t).alias("_nbytes"),
        F.size(ws_split_col(t)).alias("_nwords"))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("_ntok").alias("n_tokens"),
        F.sum("_nbytes").alias("n_bytes"),
        F.sum("_nwords").alias("n_words"),
    ]
    out = (staged.groupBy(*group_cols).agg(*aggs) if group_cols
           else staged.agg(*aggs))
    return (out
            .withColumn("bytes_per_token",
                        F.when(F.col("n_tokens") > 0,
                               F.round(F.col("n_bytes")
                                       / F.col("n_tokens"), 4)))
            .withColumn("fertility",
                        F.when(F.col("n_words") > 0,
                               F.round(F.col("n_tokens")
                                       / F.col("n_words"), 4))))
