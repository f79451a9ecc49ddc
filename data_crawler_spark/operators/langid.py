"""Trainable character-n-gram language identification — Cavnar &
Trenkle 1994 ("N-Gram-Based Text Categorization"), the rank-profile
method production langid stacks descend from. The engine's
``text.langid_col`` is the zero-setup heuristic tier (script ratios +
stopwords); this module is the data-driven tier: train per-language
n-gram rank profiles from any labeled sample (e.g. the corpus rows the
heuristic labels with high confidence) and classify by out-of-place
rank distance.

Spec (mirrored bit-for-bit by tests/test_langid.py):
- normalize: lowercase, collapse whitespace runs to one space, trim,
  then pad with ONE leading and trailing space; empty text → no grams.
- grams: every contiguous character n-gram, n = 1..n_max, of the
  padded text (the padding encodes word boundaries, per the paper).
- language profile: the ``top_k`` grams of the language's corpus by
  (count desc, gram asc), ranked 1..top_k.
- document profile: the same ranking over the single document.
- distance(doc, lang) = Σ over the doc profile of
  |rank_doc − rank_lang|, with grams absent from the language profile
  costing the maximum penalty ``top_k``; predicted language = argmin
  distance, ties to the lexicographically smallest language. Docs
  with no grams get a NULL prediction.

Scale shape: gram generation is doc-local native expressions (the
text column is bound ONCE — HOF lambdas re-evaluate referenced
subtrees per element); training is one explode into a map-side-partial
groupBy whose shuffle rows are (lang, gram≤n_max chars, cnt), capped
per language with the exact salted two-phase top-k (no language
funnels through one window task); the profile table is
``languages × top_k`` rows — broadcast-sized by construction — so
classification joins it to the per-doc gram rows without ever
shuffling the corpus text: every classify-side shuffle row is
O(24 bytes), and the per-doc ranking window is bounded by document
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_crawler_spark.operators.sampling import cap_per_group
from data_crawler_spark.operators.text import UNICODE_WS, bind_once

__all__ = ["char_ngrams_col", "train_language_profiles",
           "langid_classify"]


def char_ngrams_col(text, n_max: int = 3):
    """Array of all character 1..n_max-grams of the normalized, space-
    padded text (duplicates kept — counts matter)."""
    # UNICODE_WS, not \s: Java \s is ASCII-only, so NBSP-laden HTML
    # text would keep \xa0 as a gram character while the pure-Python
    # mirror (Unicode \s) collapses it to the boundary space
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(text), f"[{UNICODE_WS}]+", " "),
        "^ | $", "")
    padded = F.when(norm == "", None).otherwise(
        F.concat(F.lit(" "), norm, F.lit(" ")))

    def grams(t):
        ln = F.length(t)

        # NB: a default-arg lambda (``lambda i, n=n: ...``) introspects
        # as TWO-parameter, making transform feed the array INDEX into
        # n — the engine's recurring F.transform arity trap
        def gram_n(n):
            return (F.when(ln >= n,
                           F.transform(F.sequence(F.lit(1), ln - n + 1),
                                       lambda i: F.substr(t, i, F.lit(n))))
                    .otherwise(F.array().cast("array<string>")))

        return F.flatten(F.array(*[gram_n(n)
                                   for n in range(1, n_max + 1)]))

    return F.coalesce(bind_once(padded, grams),
                      F.array().cast("array<string>"))


def train_language_profiles(df: DataFrame, text_col: str = "text",
                            lang_col: str = "lang", top_k: int = 300,
                            n_max: int = 3) -> DataFrame:
    """Labeled sample → ``(lang, gram, rank)`` rank profiles,
    ``languages × top_k`` rows (broadcast-sized by construction)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = (df.filter(F.col(lang_col).isNotNull())
              .select(F.col(lang_col).alias("lang"),
                      F.explode(char_ngrams_col(F.col(text_col), n_max))
                      .alias("gram"))
              .groupBy("lang", "gram").agg(F.count("*").alias("cnt")))
    capped = cap_per_group(counts, "lang", top_k,
                           order_by=[F.desc("cnt")], id_col="gram")
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram"))
    return (capped.withColumn("rank", F.row_number().over(w))
            .select("lang", "gram", "rank"))


def langid_classify(df: DataFrame, profiles: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    top_k: int = 300, n_max: int = 3,
                    out_col: str = "lang_pred") -> DataFrame:
    """Classify every document against the trained profiles: the input
    frame plus ``(out_col, out_col_distance)``. ``top_k``/``n_max``
    must match training (top_k is also the missing-gram penalty)."""
    doc_counts = (df.select(F.col(id_col).alias("_id"),
                            F.explode(
                                char_ngrams_col(F.col(text_col), n_max))
                            .alias("gram"))
                  .groupBy("_id", "gram").agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("_id").orderBy(F.desc("cnt"), F.asc("gram"))
    # localCheckpoint: two branches (matched + doc_sizes) drain this
    # corpus-wide tokenize+shuffle sweep — same shape/fix as nb_score
    doc_prof = (doc_counts.withColumn("r_doc", F.row_number().over(w))
                .filter(F.col("r_doc") <= top_k)
                .select("_id", "gram", "r_doc")
                .localCheckpoint())

    prof = F.broadcast(profiles.select("lang", "gram",
                                       F.col("rank").alias("r_lang")))
    matched = (doc_prof.join(prof, "gram")
               .groupBy("_id", "lang")
               .agg(F.sum(F.abs(F.col("r_doc") - F.col("r_lang")))
                    .alias("_match_dist"),
                    F.count("*").alias("_n_matched")))

    doc_sizes = doc_prof.groupBy("_id").agg(F.count("*").alias("_n_doc"))
    langs = F.broadcast(profiles.select("lang").distinct())
    dist = (doc_sizes.crossJoin(langs)
            .join(matched, ["_id", "lang"], "left")
            .select("_id", "lang",
                    (F.coalesce("_match_dist", F.lit(0))
                     + (F.col("_n_doc")
                        - F.coalesce("_n_matched", F.lit(0)))
                     * F.lit(int(top_k))).alias("_dist")))
    best = (dist.groupBy("_id")
            .agg(F.min(F.struct(F.col("_dist"), F.col("lang")))
                 .alias("_best"))
            .select("_id", F.col("_best.lang").alias(out_col),
                    F.col("_best._dist").cast("long")
                    .alias(f"{out_col}_distance")))
    return (df.join(best, df[id_col] == best["_id"], "left")
            .drop("_id"))
