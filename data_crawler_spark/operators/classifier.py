"""Hashed bag-of-words document classification — multinomial Naive
Bayes, the distributed stand-in for the fastText-style linear
classifiers published pipelines gate on (CCNet's language/quality
models, the LLaMA "references-Wikipedia" quality classifier, GPT-3's
WebText-vs-CommonCrawl filter). fastText itself is an external binary;
multinomial NB over the SAME hashed n-gram feature space trains and
scores as plain DataFrame aggregations, so the whole model lifecycle
stays inside the engine and is exactly mirrorable in tests.

The feature space is ``sampling.hashed_ngram_counts`` (DSIR's hashed
unigram+bigram bag, xxhash64 mod n_buckets) — one feature extractor
shared by the importance sampler and the classifier.

Scale shape:
- train: the labeled set's features reduce to ≤ n_buckets × n_classes
  rows in one map-side-partial groupBy; the label join adds one
  exchange of (id, bucket, cnt) rows (never text). The returned model
  and class tables are broadcast-sized BY CONSTRUCTION.
- score: one broadcast join (corpus features x model) + one
  map-side-partial groupBy per doc — the corpus is scanned once and
  only (id, int, double) rows shuffle. Unseen-in-class buckets
  contribute the smoothing floor analytically (total_tokens x floor),
  so scoring never materializes the missing (bucket, class) pairs.

score(d, c) = log P(c) + T_d * floor_c
              + sum_{b in d, (b,c) in model} cnt_db * (logp_bc - floor_c)
where floor_c = log(alpha / (total_c + alpha * n_buckets)) and
logp_bc = log((cnt_bc + alpha) / (total_c + alpha * n_buckets)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_crawler_spark.operators.sampling import (hashed_ngram_counts,
                                                   uniform_hash_col)

__all__ = ["train_nb", "nb_score", "nb_predict", "nb_posterior",
           "pareto_quality_filter", "focused_priority"]


def train_nb(labeled: DataFrame, label_col: str = "label",
             id_col: str = "doc_id", text_col: str = "text",
             n_buckets: int = 10_000,
             ngram_sizes: tuple[int, ...] = (1, 2),
             alpha: float = 1.0) -> tuple[DataFrame, DataFrame]:
    """Labeled docs -> (model, classes).

    model:   (label, bucket, delta)  — delta = logp - floor, only for
             buckets SEEN in the class (≤ n_buckets x n_classes rows).
    classes: (label, log_prior, floor) — one row per class.

    Both frames are broadcast-sized; persist/localCheckpoint them when
    scoring repeatedly. alpha is the Laplace/Lidstone smoothing.
    Contract: one row per ``id_col`` (a duplicated id double-counts its
    features through the label join — dropDuplicates upstream)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    feats = hashed_ngram_counts(labeled, id_col, text_col, n_buckets,
                                ngram_sizes)
    by_class = (feats.join(labeled.select(id_col, label_col), id_col)
                .groupBy(label_col, "bucket")
                .agg(F.sum("cnt").alias("cnt")))
    totals = by_class.groupBy(label_col).agg(F.sum("cnt").alias("total"))
    denom = F.col("total") + F.lit(alpha) * F.lit(float(n_buckets))
    floor = F.log(F.lit(alpha) / denom)

    n_total = labeled.count()
    if n_total == 0:
        raise ValueError("train_nb: empty labeled set")
    priors = (labeled.groupBy(label_col)
              .agg(F.count("*").alias("n_docs"))
              .select(label_col,
                      F.log(F.col("n_docs") / F.lit(float(n_total)))
                      .alias("log_prior")))
    # priors-first with a LEFT join: a class whose docs yield zero
    # WORD_RE features (e.g. all-CJK text) must still exist in the
    # model — its total is 0 and every bucket scores the smoothing
    # floor log(alpha / (alpha * n_buckets)), not vanish silently
    safe_total = F.coalesce(F.col("total"), F.lit(0).cast("long"))
    safe_floor = F.log(
        F.lit(alpha) / (safe_total + F.lit(alpha) * F.lit(float(n_buckets))))
    classes = (priors.join(totals, label_col, "left")
               .select(label_col, safe_floor.alias("floor"), "log_prior"))
    model = (by_class.join(totals, label_col)
             .select(label_col, "bucket",
                     (F.log((F.col("cnt") + F.lit(alpha)) / denom)
                      - floor).alias("delta")))
    return model, classes


def nb_score(corpus: DataFrame, model: DataFrame, classes: DataFrame,
             id_col: str = "doc_id", text_col: str = "text",
             n_buckets: int = 10_000,
             ngram_sizes: tuple[int, ...] = (1, 2)) -> DataFrame:
    """Corpus -> (id, label, score): the per-class NB log joint for
    every document (feature extraction MUST match training:
    n_buckets/ngram_sizes are part of the model contract). Token-less
    docs score log_prior per class."""
    # the feature sweep feeds BOTH the scoring join and the per-doc
    # token totals — lazy localCheckpoint materializes it once on
    # first use (blocks free on GC), instead of re-tokenizing the
    # corpus per branch
    feats = hashed_ngram_counts(corpus, id_col, text_col, n_buckets,
                                ngram_sizes).localCheckpoint(eager=False)
    seen = (feats.join(F.broadcast(model), "bucket")
            .groupBy(id_col, "label")
            .agg(F.sum(F.col("cnt") * F.col("delta")).alias("seen_part")))
    base = (corpus.select(id_col)
            .join(feats.groupBy(id_col).agg(F.sum("cnt").alias("tok")),
                  id_col, "left")
            .crossJoin(F.broadcast(classes)))
    return (base.join(seen, [id_col, "label"], "left")
            .select(id_col, "label",
                    (F.col("log_prior")
                     + F.coalesce(F.col("tok"), F.lit(0)) * F.col("floor")
                     + F.coalesce(F.col("seen_part"), F.lit(0.0)))
                    .alias("score")))


def nb_predict(scores: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-class scores -> (id, label, score, margin): the argmax
    class per doc, ties broken (score DESC, label ASC) — a total
    order, deterministic under any partitioning. margin = winner
    minus runner-up (+inf for single-class models) — the confidence
    value pipelines threshold on."""
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (scores
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_next", F.lead("score").over(w))
            .where(F.col("_rn") == 1)
            .select(id_col, "label", "score",
                    F.coalesce(F.col("score") - F.col("_next"),
                               F.lit(float("inf"))).alias("margin")))


def nb_posterior(scores: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-class log joints -> (id, label, prob): the softmax over each
    document's class scores, log-sum-exp stabilized. Both window
    aggregates share ONE hash exchange on the id — no join, no
    groupBy; rows stay (id, label, double)."""
    w = Window.partitionBy(id_col)
    m = F.max("score").over(w)
    z = F.sum(F.exp(F.col("score") - m)).over(w)
    return scores.select(id_col, "label",
                         (F.exp(F.col("score") - m) / z).alias("prob"))


def pareto_quality_filter(corpus: DataFrame, model: DataFrame,
                          classes: DataFrame, positive_label: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          n_buckets: int = 10_000,
                          ngram_sizes: tuple[int, ...] = (1, 2),
                          pareto_shape: float = 9.0,
                          seed: int = 0) -> DataFrame:
    """The GPT-3 Appendix-A quality-classifier gate (Brown et al.
    2020): score every document with the trained classifier and keep
    it iff ``pareto(shape) > 1 - P(positive)`` — high-quality docs
    survive outright, low-quality docs survive with a heavy-tailed
    small probability, preserving tail diversity instead of a hard
    threshold.

    The Pareto draw is DETERMINISTIC in (id, seed): the Lomax inverse
    CDF ``(1-u)^(-1/shape) - 1`` over the same xxhash64-folded uniform
    the mixture sampler uses — partitioning-invariant and replayable.
    The keep-id set is corpus-scale, so the semi-join back carries no
    broadcast hint (AQE decides)."""
    if pareto_shape <= 0:
        raise ValueError(f"pareto_shape must be > 0, got {pareto_shape}")
    probs = (nb_posterior(
                 nb_score(corpus, model, classes, id_col, text_col,
                          n_buckets, ngram_sizes), id_col)
             .where(F.col("label") == positive_label))
    u = uniform_hash_col(F.col(id_col), seed)
    draw = F.pow(F.lit(1.0) - u, F.lit(-1.0 / pareto_shape)) - F.lit(1.0)
    keep = probs.where(draw > F.lit(1.0) - F.col("prob")).select(id_col)
    return corpus.join(keep, id_col, "left_semi")


def focused_priority(anchors: DataFrame, model: DataFrame,
                     classes: DataFrame, positive_label: str,
                     top_k: int = 3, n_buckets: int = 10_000,
                     ngram_sizes: tuple[int, ...] = (1, 2)) -> DataFrame:
    """Focused-crawl frontier prioritization (the shark-search family,
    Hersovici et al. 1998; classifier-guided crawling per Chakrabarti
    et al. 1999): score each candidate URL's ANCHOR TEXT with the
    trained topic/quality classifier and emit ``(target_url,
    priority)`` with priority = P(positive) — drop-in as
    ``schedule_per_host``'s priority column, so the frontier fetches
    on-topic pages first.

    Scale shape: anchor texts pool through ``anchor_summary``'s
    bounded top-k (a viral target's million inlinks reduce map-side;
    at most k strings concatenate per target), then one classifier
    scoring pass — broadcast model join, (id, label, double) shuffles
    only."""
    from data_crawler_spark.operators.anchors import anchor_summary

    docs = (anchor_summary(anchors, top_k)
            .select("target_url",
                    F.array_join("top_anchors", " ").alias("_atext")))
    scores = nb_score(docs, model, classes, "target_url", "_atext",
                      n_buckets, ngram_sizes)
    return (nb_posterior(scores, "target_url")
            .where(F.col("label") == positive_label)
            .select("target_url", F.col("prob").alias("priority")))
