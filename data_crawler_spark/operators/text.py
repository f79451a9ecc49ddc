"""Text-analysis operators for a training-data pipeline over the
``documents`` table (and, in the crawl engine, over extracted page
text): token counting, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is native ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) so each op has an exact DuckDB SQL mirror in
plans/fixture_queries.py — the driver's correctness harness checks
them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared with the DuckDB oracle SQL: RE2/Java-regex-compatible subset.
WORD_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[^A-Za-z0-9\s]"
CJK_RE = r"[一-鿿]"

# PII patterns (op txt05), ordered: each later pattern runs over the
# previous pattern's output, so the order must put the most specific
# shape first (an email contains word chars a later pattern must not
# re-match; the 12-19-digit card run must outrank the generic phone
# digits). All patterns are in the RE2 ∩ Java subset (no lookaround)
# so the Spark engine and the DuckDB oracle compile the SAME regex.
PII_PATTERNS: list[tuple[str, str]] = [
    # email before anything that could eat its local part
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4 before phone (dotted quads contain 1-3 digit runs)
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # 12-19 digit runs (card-ish) before phone
    (r"\b\d{12,19}\b", "<NUM>"),
    # NANP-ish phone: 555-123-4567 / 555.123.4567 / (555) 123-4567
    (r"(\(\d{3}\)[ ]?|\b\d{3}[-.])\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def pii_redact_col(text: Column) -> Column:
    """PII redaction (op txt05): mask emails, IPv4s, long digit runs,
    and phone numbers with typed placeholders — the standard scrub pass
    a training-data pipeline runs before publishing webtext. A chain of
    native ``regexp_replace`` calls (JVM-side, whole-stage codegen; one
    pass per pattern, no Python), mirrored verbatim in the DuckDB
    oracle (fixture_queries txt04_05) and pinned against a Python
    ``re`` reference in tests/test_text.py."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens_col(text: Column) -> Column:
    """Whitespace-ish tokenization (op txt01): regexp word extraction —
    the 'BPE-ish regex' baseline tokenizer."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def punct_ratio_col(text: Column) -> Column:
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column) -> Column:
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS_EN)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_len_col(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1]: long enough, low punctuation, some
    stopwords, sane word length — the classic webtext quality gates."""
    length_ok = F.least(F.length(text).cast("double") / 200.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col(text) * 5.0)
    stop_ok = F.least(stopword_ratio_col(text) * 5.0, F.lit(1.0))
    wl = mean_word_len_col(text)
    wl_ok = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((length_ok + punct_pen + stop_ok + wl_ok) / 4.0, 4)


def cjk_ratio_col(text: Column) -> Column:
    n = F.length(text)
    cjk = F.length(text) - F.length(F.regexp_replace(text, CJK_RE, ""))
    return F.when(n > 0, cjk.cast("double") / n).otherwise(F.lit(0.0))


def langid_col(text: Column) -> Column:
    """Deterministic n-gram/char-class language-ID heuristic (op txt03):
    CJK chars -> zh; else marker-stopword hits for es/de/fr; else en.
    (A heuristic spec, mirrored exactly in the DuckDB oracle — not a
    model; the fixture corpus is same-vocabulary word salad so the
    point is identical distributed/SQL evaluation, not accuracy.)"""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    es = (F.length(t) - F.length(F.regexp_replace(t, r" (el|la|los|de la|que|es) ", "")))
    de = (F.length(t) - F.length(F.regexp_replace(t, r" (der|die|das|und|ist|nicht) ", "")))
    fr = (F.length(t) - F.length(F.regexp_replace(t, r" (le|les|des|est|une|avec) ", "")))
    return (
        F.when(cjk_ratio_col(text) > 0.05, F.lit("zh"))
        .when((es > de) & (es > fr) & (es > 0), F.lit("es"))
        .when((de > es) & (de > fr) & (de > 0), F.lit("de"))
        .when((fr > es) & (fr > de) & (fr > 0), F.lit("fr"))
        .otherwise(F.lit("en"))
    )


def fingerprint_col(text: Column) -> Column:
    """op txt04: whitespace-normalized lowercase md5 content fingerprint
    (md5 because the DuckDB oracle must compute the identical value;
    xxhash64 fingerprints are used engine-internally — op 30)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def text_profile(df: DataFrame, text: str = "text") -> DataFrame:
    """One-pass profile: all text-analysis columns over a corpus."""
    t = F.col(text)
    return df.select(
        "*",
        token_count_col(t).alias("n_tokens"),
        F.round(punct_ratio_col(t), 4).alias("punct_ratio"),
        F.round(stopword_ratio_col(t), 4).alias("stopword_ratio"),
        quality_score_col(t).alias("quality"),
        langid_col(t).alias("lang_pred"),
        fingerprint_col(t).alias("fingerprint"),
    )


def remove_repeated_tokens(df: DataFrame, text: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition removal: keep each token's FIRST
    occurrence, preserving original order — the standard cleanup for
    boilerplate/keyword-stuffed web text in a training-data pipeline.
    Pure native expressions: split + array_distinct (which keeps
    first-occurrence order), no shuffle, no Python; mirrored in the
    DuckDB oracle by an explicit first-occurrence window (DuckDB's
    list_distinct does NOT preserve order)."""
    toks = F.split(F.trim(F.col(text)), r"\s+")
    uniq = F.array_distinct(toks)
    return (df.filter(F.length(F.trim(F.col(text))) > 0)
            .select(F.col(id_col),
                    F.array_join(uniq, " ").alias("clean_text"),
                    F.size(toks).cast("long").alias("n_tokens"),
                    F.size(uniq).cast("long").alias("n_unique")))
