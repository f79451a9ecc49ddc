"""Corpus statistics — the dataset-card numbers every published
pipeline reports next to its filters (doc/token counts, length
distribution, quality-gate pass rates, duplication rate, per-group
breakdowns): one aggregation pass over the corpus, grouped or global.

Everything is native expressions + one map-side-partially-aggregated
groupBy; distribution columns use ``percentile_approx`` (the
bounded-memory sketch — the only sane quantile at 10^10 docs) and the
duplicate rate uses ``approx_count_distinct`` on the dd01 content hash
(exact distinct would be a second corpus-wide shuffle; the HLL rides
the same single pass). The output is O(groups) rows — a report, never
a corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_crawler_spark.operators.text import (fingerprint_col,
                                               token_count_col)

_QUANTILES = (0.5, 0.9, 0.99)


def corpus_stats(df: DataFrame, text_col: str = "text",
                 group_cols: tuple[str, ...] = (),
                 exact_distinct: bool = False) -> DataFrame:
    """One-pass corpus report, optionally per group (e.g. ``("lang",)``
    — the dataset-card breakdown): doc count, token totals and
    mean/median/p90/p99 tokens-per-doc, char totals, empty-doc count,
    and the exact-duplicate rate (1 − distinct content hashes / docs,
    the dd01 definition). ``exact_distinct=True`` swaps the HLL
    estimate for an exact count-distinct (adds a shuffle of the hash
    column; keep it for fixture-scale oracle checks). A null text is
    counted as an empty document (0 tokens/chars, the empty-string
    fingerprint) — otherwise it would inflate n_docs while escaping
    every other column."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = token_count_col(t)
    staged = df.select(*group_cols,
                       n_tok.alias("_nt"),
                       F.length(t).alias("_nc"),
                       fingerprint_col(t).alias("_fp"))
    distinct = (F.count_distinct(F.col("_fp")) if exact_distinct
                else F.approx_count_distinct(F.col("_fp")))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.sum("_nc").alias("total_chars"),
        F.round(F.avg("_nt"), 4).alias("mean_tokens"),
        *[F.expr(f"percentile_approx(_nt, {q!r})").alias(
            f"p{int(q * 100)}_tokens") for q in _QUANTILES],
        F.sum(F.when(F.col("_nt") == 0, 1).otherwise(0))
        .alias("n_empty_docs"),
        distinct.alias("distinct_contents"),
    ]
    out = (staged.groupBy(*group_cols).agg(*aggs) if group_cols
           else staged.agg(*aggs))
    # HLL over-estimates can exceed n_docs (~2% relative error) — a
    # dataset card must not publish a negative duplicate rate
    return out.withColumn(
        "dup_rate",
        F.greatest(
            F.lit(0.0),
            F.round(F.lit(1.0) - F.col("distinct_contents")
                    / F.col("n_docs"), 4)))


def gate_pass_rates(flagged: DataFrame,
                    rule_cols: tuple[str, ...],
                    group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Pass rate per quality rule over a frame that already carries
    boolean rule columns (gopher_rules / c4_rules / repetition
    outputs): one agg pass, O(groups) output — the 'how much does each
    filter remove' table of a dataset card."""
    missing = [c for c in rule_cols if c not in flagged.columns]
    if missing:
        raise ValueError(f"rule columns not in frame: {missing}")
    aggs = [F.count("*").alias("n_docs")]
    for c in rule_cols:
        aggs.append(F.round(
            F.avg(F.col(c).cast("double")), 4).alias(f"{c}_pass_rate"))
    return (flagged.groupBy(*group_cols).agg(*aggs) if group_cols
            else flagged.agg(*aggs))


def split_leakage(splits: DataFrame, pairs: DataFrame,
                  id_col: str = "doc_id",
                  split_col: str = "split",
                  id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Audit a train/val/test assignment against a near-duplicate pair
    list: returns the pairs whose two members landed in DIFFERENT
    splits — ``(id_a, id_b, split_a, split_b)``. Empty means the split
    is leakage-free at the given pair relation; that is the property
    ``hosts.domain_split`` claims by construction, and this op is the
    trust-but-verify check for it (run it over the minhash/semdedup
    pair output before publishing a benchmark split — eval
    contamination via near-dups is exactly how test leakage happens
    in practice).

    Scale shape: two equi-joins of the ~16-byte pair rows against the
    (id, split) projection — the pair list is the output of the
    near-dup pipeline (candidates only, corpus-sublinear) and the
    split frame is two small columns, so both joins are
    AQE-broadcastable; nothing corpus-sized shuffles."""
    s = splits.select(F.col(id_col).alias("_id"),
                      F.col(split_col).alias("_split"))
    # LEFT joins: a pair member missing from the split assignment is
    # an AUDIT FINDING (null split), not a row to silently drop — an
    # inner join would certify pairs it never actually checked
    out = (pairs
           .join(s.withColumnsRenamed(
               {"_id": id_a, "_split": "split_a"}), id_a, "left")
           .join(s.withColumnsRenamed(
               {"_id": id_b, "_split": "split_b"}), id_b, "left")
           .filter(~F.col("split_a").eqNullSafe(F.col("split_b"))
                   | F.col("split_a").isNull()))
    return out.select(id_a, id_b, "split_a", "split_b")


def threshold_curve(df: DataFrame, score_col: str,
                    n_bins: int = 100,
                    weight_col: str | None = None,
                    lo: float | None = None,
                    hi: float | None = None) -> DataFrame:
    """The filter-tradeoff curve a data card plots before anyone picks
    a threshold: for each candidate cutoff t, how many documents (and
    how much ``weight_col`` mass — tokens, bytes) survive
    ``score >= t``. Returns ``n_bins`` rows ``(threshold, n_docs,
    frac_docs, mass, frac_mass)`` where row t counts score >= t,
    thresholds are the ``n_bins`` left edges of an equal-width grid
    over [lo, hi) (bounds from one min/max pass when not given; scores
    above hi count toward every row, scores below lo toward none —
    with data-derived bounds nothing is outside).

    Scale shape: ONE map-side-partial groupBy over the corpus scan
    into <= n_bins partial rows, cumulated driver-side — O(n_bins)
    output, the gate_pass_rates pattern. Null scores are excluded
    (they'd survive no cutoff; count them with gate_pass_rates if the
    null rate matters)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    rows = df.where(s.isNotNull())
    if lo is None or hi is None:
        mm = rows.agg(F.min(s).alias("lo"), F.max(s).alias("hi")).first()
        # empty / all-null input: min/max come back null — fall to a
        # [0, 1) grid so the caller gets a zero curve, not a TypeError
        lo = (float(mm["lo"]) if mm["lo"] is not None else 0.0) \
            if lo is None else float(lo)
        hi = (float(mm["hi"]) if mm["hi"] is not None else 1.0) \
            if hi is None else float(hi)
    if not hi > lo:
        # degenerate range (constant scores / empty input): one bin
        # holding everything at threshold lo
        hi = lo + 1.0
    width = (hi - lo) / n_bins
    mass = (F.greatest(F.coalesce(F.col(weight_col).cast("double"),
                                  F.lit(0.0)), F.lit(0.0))
            if weight_col else F.lit(1.0))
    binned = (rows.groupBy(
        F.least(F.greatest(F.floor((s - F.lit(lo)) / F.lit(width)),
                           F.lit(-1)),
                F.lit(n_bins - 1)).cast("int").alias("bin"))
        .agg(F.count("*").alias("n"), F.sum(mass).alias("m"))
        .collect())
    n_by = {r["bin"]: int(r["n"]) for r in binned}
    m_by = {r["bin"]: float(r["m"]) for r in binned}
    total_n = sum(n_by.values())
    total_m = sum(m_by.values())
    out, cn, cm = [], 0, 0.0
    # suffix-cumulate from the top bin down: row for threshold t
    # counts every score in bins >= t's bin (bin -1 = below lo, never
    # counted)
    for b in range(n_bins - 1, -1, -1):
        cn += n_by.get(b, 0)
        cm += m_by.get(b, 0.0)
        out.append((lo + b * width, cn,
                    cn / total_n if total_n else 0.0,
                    cm, cm / total_m if total_m else 0.0))
    spark = df.sparkSession
    return spark.createDataFrame(
        list(reversed(out)),
        "threshold double, n_docs long, frac_docs double, "
        "mass double, frac_mass double")


def zipf_fit(df: DataFrame, text_col: str = "text",
             max_rank: int | None = 10000) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary — the
    dataset-card sanity diagnostic (natural-language corpora sit near
    slope −1; a slope far off flags boilerplate floods, templated spam,
    or tokenizer damage). One row: (slope, intercept, r2, n_terms,
    n_tokens), the least-squares fit of log(freq) on log(rank).

    Plan: ONE word_freqs pass (explode + map-side-partial groupBy),
    then — with ``max_rank`` set (the default, and the published
    regime for Zipf fits: the hapax tail is quantized and drags the
    fit) — a distributed top-k (TakeOrderedAndProject: each partition
    keeps its local top max_rank, never a full-vocab single-task
    sort), ranks assigned on the collected head. ``max_rank=None``
    ranks the WHOLE vocabulary through one global window — a
    vocabulary-sized total-order sort; fine for audits, not the
    default. The regression itself folds in one map-side-partial
    aggregate either way.
    """
    from data_crawler_spark.operators.tokenizer import word_freqs
    freqs = word_freqs(df, text_col)
    if max_rank is not None:
        head = freqs.orderBy(F.desc("cnt"), F.asc("word")).limit(max_rank)
        w = Window.orderBy(F.desc("cnt"), F.asc("word"))
        ranked = head.withColumn("rank", F.row_number().over(w))
    else:
        w = Window.orderBy(F.desc("cnt"), F.asc("word"))
        ranked = freqs.withColumn("rank", F.row_number().over(w))
    x, y = F.log(F.col("rank").cast("double")), F.log(F.col("cnt").cast("double"))
    ag = ranked.agg(
        F.count("*").alias("n"), F.sum("cnt").alias("n_tokens"),
        F.avg(x).alias("mx"), F.avg(y).alias("my"),
        F.covar_pop(x, y).alias("cxy"), F.var_pop(x).alias("vx"),
        F.var_pop(y).alias("vy"))
    slope = F.when(F.col("vx") > 0, F.col("cxy") / F.col("vx"))
    r2 = F.when((F.col("vx") > 0) & (F.col("vy") > 0),
                (F.col("cxy") * F.col("cxy")) / (F.col("vx") * F.col("vy")))
    return ag.select(
        slope.alias("slope"),
        (F.col("my") - slope * F.col("mx")).alias("intercept"),
        r2.alias("r2"),
        F.col("n").cast("long").alias("n_terms"),
        F.col("n_tokens").cast("long").alias("n_tokens"))


def vocab_growth(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n_points: int = 16,
                 lg_config_k: int = 14) -> DataFrame:
    """Heaps-law vocabulary growth curve: (point, n_tokens, vocab_est)
    at ``n_points`` nested corpus prefixes — the dataset-card
    diagnostic for vocabulary saturation (natural corpora grow
    V ≈ K·N^β with β≈0.5-0.8; a flat curve flags templated/duplicated
    text, a linear one flags noise/mis-tokenization).

    The "prefix" order is a deterministic random permutation — docs
    hash into ``n_points`` buckets by xxhash64(id), prefix k = buckets
    0..k — the canonical way to draw a growth curve (any fixed crawl
    order confounds growth with drift) and, at scale, the reason the
    plan has NO global sort: one explode pass collapses map-side into
    ≤ n_points (bucket, HLL-sketch, token-count) rows, a tiny
    bucket≤point expansion (n_points² rows) cumulates them with
    ``hll_union_agg``, all JVM DataSketches. Estimates are near-exact
    below ~2^lg_config_k distinct terms and ~2% beyond."""
    if n_points < 2:
        raise ValueError(f"n_points must be >= 2, got {n_points}")
    from data_crawler_spark.operators.text import tokens_col
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                    F.lit(n_points)).cast("int")
    words = (df.select(bucket.alias("bucket"),
                       F.explode(tokens_col(F.col(text_col))).alias("word")))
    per_bucket = (words.groupBy("bucket")
                  .agg(F.hll_sketch_agg("word", F.lit(lg_config_k)).alias("sk"),
                       F.count("*").alias("n_tokens")))
    points = (per_bucket
              .select("bucket", "sk", "n_tokens",
                      F.explode(F.sequence(F.col("bucket"),
                                           F.lit(n_points - 1))).alias("point"))
              .groupBy("point")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("vocab_est"),
                   F.sum("n_tokens").alias("n_tokens")))
    return points.select("point", F.col("n_tokens").cast("long"),
                         F.col("vocab_est").cast("long")).orderBy("point")
