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


def train_bpe(freqs: DataFrame, num_merges: int,
              max_words: int = 100_000) -> list[tuple[str, str]]:
    """Run the BPE merge loop over the top-``max_words`` rows of a
    ``word_freqs`` frame and return the ranked merge list. The collect
    is the documented bounded driver step (vocabulary-sized, ordered
    (cnt desc, word asc) so the cap cuts deterministically); the loop
    itself is O(num_merges · vocab) pure Python on the compact dict —
    the same shape every production BPE trainer uses."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be >= 1, got {max_words}")
    rows = (freqs.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_words).collect())
    vocab = {tuple(r.word) + (END,): int(r.cnt) for r in rows}
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


def _encode_word(word: str, ranks: dict[tuple[str, str], int]
                 ) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, pair = min(ranked)
        syms = list(_merge_word(tuple(syms), pair))
    return syms


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
