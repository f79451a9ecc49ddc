"""Distributed hashed n-gram language model for perplexity-based
quality filtering — the CCNet recipe (Wenzek et al. 2020: score every
page with an LM trained on a clean reference corpus, bucket by
perplexity) with the LM itself replaced by the distributed-friendly
Stupid Backoff model (Brants et al. 2007 — "Large Language Models in
Machine Translation", the scheme built for exactly this trillion-token
count-table shape; KenLM's Kneser-Ney tables don't distribute as plain
counts).

The model IS a DataFrame: ``(k, h, cnt)`` rows — n-gram order,
xxhash64 of the space-joined gram, occurrence count — so training is
one explode + map-side-partial groupBy over the reference corpus and
scoring is two equi-joins against it. No driver-side model object,
no Python in the hot path, every shuffle row O(24 bytes).

Scoring spec (mirrored bit-for-bit by the pure-Python reference in
tests/test_lm.py):

* token stream = WORD_RE over lowered text — the same stream every
  other text operator matches on;
* at position i (0-based) the available order is kmax = min(n, i+1);
  the score backs off from kmax: for the LARGEST k ≤ kmax whose k-gram
  ending at i has a model count,
      S = alpha^(kmax-k) · cnt(gram_k) / ctx_k
  where ctx_k = cnt of the gram's (k-1)-token prefix (= the preceding
  context) and ctx_1 = N, the reference's total token count;
* if no order is seen, S = alpha^kmax / N (the unseen-unigram floor,
  backed off from kmax);
* doc log-prob = Σ log10 S; perplexity = 10^(−logprob / tokens);
  empty docs score null perplexity.

True counts guarantee ctx_k ≥ cnt(gram_k) (every gram occurrence
contains its prefix), so min_count pruning can never drop a surviving
gram's context and S ≤ alpha^(kmax-k) always; hash collisions only
inflate counts (the 2^-64-per-pair trade every hashed operator here
makes).

100 TB shape: the corpus is scanned ONCE; per token it emits ≤ n
compact (id, pos, k, gram-hash, ctx-hash) structs built doc-locally
over the bound token array (gram text never leaves the row). The model
joins are broadcast by default (a pruned hashed model is tens of MB;
pass hint=None past broadcast size and AQE picks shuffle hash joins),
after which the per-position argmax and the per-doc sum are two
map-side-partially-aggregated groupBys whose shuffle rows are ~24
bytes/token and ~24 bytes/doc-partial respectively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_crawler_spark.operators.text import bind_once, tokens_col


def _empty_ints() -> Column:
    # F.expr needs an active context, so build lazily per call site
    return F.expr("array()").cast("array<int>")


def _tokens(text_col: str) -> Column:
    # THE shared token stream (text.tokens_col) — the LM must segment
    # on exactly what shingles/spans/repetition rules segment on
    return tokens_col(F.col(text_col))


def _gram_hash(tv: Column, start1: Column, k) -> Column:
    """xxhash64 of the space-joined k tokens at 1-based ``start1``."""
    return F.xxhash64(F.concat_ws(" ", F.slice(tv, start1, k)))


def train_ngram_lm(ref_df: DataFrame, text_col: str = "text",
                   n: int = 3, min_count: int = 1
                   ) -> tuple[DataFrame, int]:
    """Count every k-gram (k = 1..n) of the reference corpus into the
    ``(k, h, cnt)`` model frame, pruned at ``min_count`` (prefix counts
    dominate gram counts, so pruning keeps the model closed under the
    backoff's context lookups). Returns ``(model, total_tokens)`` —
    the total is the single driver-side scalar the scorer needs.
    One explode feeds a map-side-partial groupBy; shuffle rows are
    (int, long, partial count) — the reference text never shuffles."""
    if n < 1:
        raise ValueError(f"model order must be >= 1, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = _tokens(text_col)

    def grams_for(tv: Column, k: int) -> Column:
        idx = F.when(F.size(tv) >= k, F.sequence(F.lit(1), F.size(tv) - k + 1)
                     ).otherwise(_empty_ints())
        return F.transform(
            idx, lambda s: F.struct(F.lit(k).alias("k"),
                                    _gram_hash(tv, s, k).alias("h")))

    entries = bind_once(
        toks, lambda tv: F.concat(*[grams_for(tv, k)
                                    for k in range(1, n + 1)]))
    model = (ref_df.select(F.explode(entries).alias("g"))
             .groupBy("g.k", "g.h").agg(F.count("*").alias("cnt")))
    if min_count > 1:
        model = model.filter(F.col("cnt") >= min_count)
    total = ref_df.select(F.sum(F.size(toks))).first()[0] or 0
    return model, int(total)


def lm_score(corpus: DataFrame, model: DataFrame, total_tokens: int,
             n: int = 3, id_col: str = "doc_id", text_col: str = "text",
             alpha: float = 0.4,
             hint: str | None = "broadcast") -> DataFrame:
    """Score every document against a trained model: appends
    ``lm_tokens`` (scored positions), ``lm_logprob`` (Σ log10 S) and
    ``lm_ppl`` (perplexity; null for empty docs). ``hint="broadcast"``
    (default) pins both model joins broadcast — pass None for a
    beyond-broadcast-size model and AQE chooses from measured sizes.

    The gram and context joins both read ``model``, so persist (or
    write out) the trained frame before scoring — an unpersisted model
    re-runs its counting sweep once per join. The final metric
    attach joins one 24-byte row per doc back on ``id_col``; at corpus
    scale that join shuffles the corpus, so select the metric columns
    off the result (Catalyst prunes the text read) when the full rows
    aren't needed."""
    if total_tokens <= 0:
        raise ValueError("total_tokens must be positive (empty reference)")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"backoff alpha must be in (0, 1], got {alpha}")
    toks = _tokens(text_col)

    # Per position i (0-based), per order k = 1..min(n, i+1): the
    # k-gram ending at i and its (k-1)-token prefix (the backoff
    # context). 1-based gram start = i - k + 2.
    def entries_of(tv: Column) -> Column:
        idx = F.when(F.size(tv) > 0, F.sequence(F.lit(0), F.size(tv) - 1)
                     ).otherwise(_empty_ints())
        return F.flatten(F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(n), i + 1)),
                lambda k: F.struct(
                    i.alias("pos"), k.alias("k"),
                    _gram_hash(tv, i - k + 2, k).alias("hg"),
                    F.when(k > 1, _gram_hash(tv, i - k + 2, k - 1))
                    .alias("hc")))))

    rows = (corpus
            .select(F.col(id_col), F.explode(bind_once(toks, entries_of))
                    .alias("e"))
            .select(id_col, "e.pos", "e.k", "e.hg", "e.hc"))

    mg = model.select(F.col("k"), F.col("h").alias("hg"),
                      F.col("cnt").alias("cnt_g"))
    mc = model.select((F.col("k") + 1).alias("k"), F.col("h").alias("hc"),
                      F.col("cnt").alias("cnt_c"))
    if hint == "broadcast":
        mg, mc = F.broadcast(mg), F.broadcast(mc)
    looked = (rows.join(mg, ["k", "hg"], "left")
              .join(mc, ["k", "hc"], "left"))

    kmax = F.least(F.lit(n), F.col("pos") + 1)
    ctx = F.when(F.col("k") == 1, F.lit(float(total_tokens))) \
           .otherwise(F.coalesce(F.col("cnt_c"), F.col("cnt_g"))
                      .cast("double"))
    log_s = (F.log10(F.col("cnt_g").cast("double") / ctx)
             + (kmax - F.col("k")).cast("double") * F.log10(F.lit(alpha)))
    # argmax over k of the seen orders; ties impossible (k is the key).
    # pos is a grouping key, so kmax is recomputable after the agg.
    per_pos = (looked
               .groupBy(id_col, "pos")
               .agg(F.max(F.when(F.col("cnt_g").isNotNull(),
                                 F.struct(F.col("k").alias("k"),
                                          log_s.alias("lp")))).alias("best")))
    unseen = (kmax.cast("double")
              * F.log10(F.lit(alpha)) - F.log10(F.lit(float(total_tokens))))
    logp = F.coalesce(F.col("best.lp"), unseen)
    per_doc = (per_pos.groupBy(id_col)
               .agg(F.count("*").alias("lm_tokens"),
                    F.sum(logp).alias("lm_logprob")))
    return (corpus.join(per_doc, id_col, "left")
            .withColumn("lm_tokens",
                        F.coalesce(F.col("lm_tokens"), F.lit(0)))
            .withColumn("lm_ppl",
                        F.when(F.col("lm_tokens") > 0,
                               F.pow(F.lit(10.0),
                                     -F.col("lm_logprob")
                                     / F.col("lm_tokens")))))


def perplexity_buckets(scored: DataFrame, ppl_col: str = "lm_ppl",
                       head_frac: float = 0.1, middle_frac: float = 0.4,
                       by: str | None = None,
                       exact: bool = False) -> DataFrame:
    """CCNet's head/middle/tail split: per group (``by`` — CCNet uses
    the language column; None = whole corpus), the lowest-perplexity
    ``head_frac`` of documents bucket to ``head``, the next
    ``middle_frac`` to ``middle``, the rest to ``tail``; null
    perplexities (empty docs) stay null. Thresholds come from one
    O(groups)-row aggregate (``percentile_approx`` by default — the
    bounded-memory sketch that's the only sane choice at 10^10 docs
    per language; ``exact=True`` switches to exact interpolated
    percentiles for oracle tests) broadcast-joined back, so the corpus
    itself is never sorted."""
    if not (0.0 <= head_frac and 0.0 <= middle_frac
            and head_frac + middle_frac <= 1.0):
        raise ValueError("head_frac/middle_frac must be >= 0 and sum <= 1")
    fn = "percentile" if exact else "percentile_approx"
    q = ppl_col.replace("`", "``")   # backtick-quote: names with
    thr = F.expr(f"{fn}(`{q}`, array({head_frac!r}, "  # spaces/dots
                 f"{head_frac + middle_frac!r}))")
    nonnull = scored.filter(F.col(ppl_col).isNotNull())
    bucket = (F.when(F.col(ppl_col).isNull(), F.lit(None).cast("string"))
              .when(F.col(ppl_col) <= F.col("_thr")[0], "head")
              .when(F.col(ppl_col) <= F.col("_thr")[1], "middle")
              .otherwise("tail"))
    if by is None:
        row = nonnull.agg(thr.alias("t")).first()
        t = row["t"] if row and row["t"] is not None else [None, None]
        if t[0] is None:   # no scoreable docs at all
            return scored.withColumn("ppl_bucket",
                                     F.lit(None).cast("string"))
        out = scored.withColumn(
            "_thr", F.array(F.lit(float(t[0])), F.lit(float(t[1]))))
    else:
        # null-safe key match: a null group (e.g. lang never detected)
        # is a real group with its own thresholds, and a plain equi-join
        # would silently bucket every null-group doc as tail
        thrs = (nonnull.groupBy(by).agg(thr.alias("_thr"))
                .withColumnRenamed(by, "_thr_key"))
        out = (scored.join(F.broadcast(thrs),
                           F.col(by).eqNullSafe(F.col("_thr_key")), "left")
               .drop("_thr_key"))
    return out.withColumn("ppl_bucket", bucket).drop("_thr")
