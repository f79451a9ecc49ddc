"""Text-analysis operators for a training-data pipeline over the
``documents`` table (and, in the crawl engine, over extracted page
text): token counting, quality scoring, language-ID heuristic,
document fingerprinting.

Everything is native ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen). The core txt01-txt05 ops carry exact DuckDB SQL mirrors in
plans/fixture_queries.py (the driver's correctness harness checks them
value-for-value); the published-filter family (gopher/c4/repetition/
hygiene/shard ops) is pytest-tier against pure-Python references, the
registry sitting at the driver's 50-entry cap. Sole non-native op:
``unicode_normalize``, whose normalization tables exist only
Python-side — one Arrow-batched vectorized pandas UDF, the documented
seam.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Shared with the DuckDB oracle SQL: RE2/Java-regex-compatible subset.
WORD_RE = r"[A-Za-z0-9]+"

# Python str.split()/str.strip() whitespace, spelled EXPLICITLY: Java
# regex \s is ASCII-only and F.trim strips spaces only, so "word" and
# "line" semantics built on them silently diverge from the pure-Python
# mirrors the tests pin — and from real web text, where trailing
# newlines and NBSP are the norm (a doc ending in '\n' grew a phantom
# empty word that skewed every Gopher metric). Same lesson as the
# byte-BPE pretokenizer's _WS.
UNICODE_WS = (r"\t\n\x0B\f\r \x1C-\x1F\x85\xA0\u1680"
              r"\u2000-\u200A\u2028\u2029\u202F\u205F\u3000")


def ws_split_col(c: Column) -> Column:
    """Python ``str.split()`` as a native expression: split on Unicode
    whitespace runs, no empty tokens at either boundary."""
    return F.filter(F.split(c, f"[{UNICODE_WS}]+"), lambda w: w != "")


def ws_strip_col(c: Column) -> Column:
    """Python ``str.strip()`` as a native expression."""
    return F.regexp_replace(c, f"^[{UNICODE_WS}]+|[{UNICODE_WS}]+$", "")


def bind_once(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and hand it to ``body`` as a bound lambda
    variable. Higher-order functions are CodegenFallback: any subtree
    embedded in a lambda body re-evaluates per element (measured 45×
    on the shingle sweep — each window position re-tokenized the whole
    document). Binding via a one-element outer transform makes the
    inner lambda read a NamedLambdaVariable instead."""
    return F.transform(F.array(value), body)[0]


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


def clean_text_col(text: Column) -> Column:
    """Deterministic pre-dedup text hygiene as NATIVE expressions:
    strip C0/C1 control characters (newline/tab survive as separators
    first), remove zero-width code points (ZWSP/ZWNJ/ZWJ/BOM), collapse
    horizontal whitespace runs, trim. Pure map in whole-stage codegen —
    the cheap layer every published pipeline runs before hashing so
    invisible characters (or a CRLF-vs-LF source) can't split an
    otherwise-exact duplicate. CRLF / lone CR normalize to LF before
    the control strip so Windows line endings survive as newlines."""
    text = F.regexp_replace(text, "\r\n?", "\n")
    out = F.regexp_replace(text, "[\u200B\u200C\u200D\uFEFF]", "")
    out = F.regexp_replace(
        out, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x80-\x9F]", "")
    out = F.regexp_replace(out, r"[ \t]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    return F.trim(out)


def unicode_normalize(df: DataFrame, text_col: str = "text",
                      form: str = "NFKC",
                      out_col: str | None = None) -> DataFrame:
    """Unicode normalization (NFKC by default — full-width forms,
    ligatures, compatibility variants fold to canonical text, the
    standard step before tokenization/dedup so ``ﬁ`` and ``fi`` hash
    identically). Unicode normalization tables have no JVM-side Spark
    expression, so this is the documented Python seam: ONE Arrow-batched
    pandas UDF using pandas' vectorized ``Series.str.normalize`` — a
    pure map over the scan, no per-row Python round trips, no shuffle."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return df.withColumn(out_col or text_col, _norm(F.col(text_col)))


def compression_ratio(df: DataFrame, text_col: str = "text",
                      out_col: str = "compression_ratio",
                      level: int = 6) -> DataFrame:
    """zlib compression ratio (compressed bytes / raw UTF-8 bytes) —
    the Dolma/RedPajama-style repetitiveness signal: templated or
    machine-generated text compresses far below prose (boilerplate
    farms sit near 0.1; natural English near 0.3-0.5; random junk near
    1.0), so pipelines gate on a low-ratio floor next to the Gopher
    duplicate-line rules. zlib has no JVM-side Spark expression, so
    this is a documented Python seam: ONE Arrow-batched pandas UDF, a
    pure map over the scan, no shuffle. Empty/null text -> null (no
    ratio is defined), deterministic in (text, level)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None or pd.isna(t) or not t:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, level)) / len(raw)
        return s.map(one).astype("float64")

    return df.withColumn(out_col, _ratio(F.col(text_col)))


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


# Gopher-rule stopword presence list (Rae et al. 2021 §A.1.1: require
# >=2 of these 8 to appear — a cheap "is this running English prose"
# gate that kills tag soup and keyword lists).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Symbols whose density flags boilerplate/scraped junk: hash marks and
# ellipses (both the three-dot and the single-codepoint form).
_SYMBOL_RE = r"#|\.\.\.|…"
_BULLET_PREFIXES = ["•", "- ", "* "]


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A.1.1) —
    the standard rule-based webtext filter a training-data pipeline runs
    before dedup: word-count bounds, mean-word-length bounds, symbol
    density, bullet/ellipsis line fractions, alphabetic-word fraction,
    and stopword presence. Emits one row per input row with the measured
    metrics, one boolean per rule, and the conjunction ``gopher_keep``.

    Every metric is a native expression (split / filter / regexp_count /
    size) inside whole-stage codegen — no shuffle, no Python — so at
    100 TB this is a pure map over the corpus scan and Catalyst prunes
    the read down to ``text_col`` plus whatever the caller selects.
    Thresholds are the published ones; word = whitespace-delimited run
    (the paper's definition), unlike tokens_col's WORD_RE stream."""
    t = F.col(text_col)
    # Round 6: the word and line arrays are computed ONCE into staged
    # columns — this Project is CodegenFallback (higher-order
    # functions), and spelling the split in every metric re-ran it per
    # output column; the metrics below reference the cheap attributes.
    staged = df.select(
        "*",
        ws_split_col(t).alias("_g_ws"),   # Python str.split(): no phantom empties
        # ws_strip_col (Python str.strip()): F.trim strips only ASCII
        # spaces, so CRLF pages kept '\r' and tab-indented bullets were
        # never detected.
        F.filter(F.transform(F.split(t, "\n"),
                             lambda l: ws_strip_col(l)),
                 lambda l: F.length(l) > 0).alias("_g_lines"),
    )
    words = F.col("_g_ws")
    lines = F.col("_g_lines")
    n_words = F.size(words)
    total_len = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    mean_wl = F.when(n_words > 0,
                     total_len.cast("double") / n_words).otherwise(F.lit(0.0))
    sym_ratio = F.when(n_words > 0,
                       F.regexp_count(t, F.lit(_SYMBOL_RE)).cast("double")
                       / n_words).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    def _is_bullet(l):
        pred = F.lit(False)
        for p in _BULLET_PREFIXES:
            pred = pred | l.startswith(p)
        return pred

    bullet = F.size(F.filter(lines, _is_bullet))
    ellipsis = F.size(F.filter(
        lines, lambda l: l.endswith("...") | l.endswith("…")))
    bullet_frac = F.when(n_lines > 0,
                         bullet.cast("double") / n_lines).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(n_lines > 0, ellipsis.cast("double") / n_lines
                           ).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0,
                        alpha.cast("double") / n_words).otherwise(F.lit(0.0))
    # stop_hits: number of distinct stopwords present. Previously one
    # full-text regex scan PER stopword (rlike (^|\s)s(\s|$)); a
    # stopword matches that regex iff it appears as a token of
    # split(lowered, "\s+") — Java's \s both times, single-word
    # stopwords — so ONE split + one array_intersect computes the same
    # count (round 6; pinned against the regex form in tests).
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.split(F.lower(t), r"\s+")),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "rule_symbol_ratio": sym_ratio <= 0.1,
        "rule_bullet_lines": bullet_frac <= 0.9,
        "rule_ellipsis_lines": ellipsis_frac <= 0.3,
        "rule_alpha_words": alpha_frac >= 0.8,
        "rule_stopwords": stop_hits >= 2,
    }
    keep = F.lit(True)
    for expr in rules.values():
        keep = keep & expr
    return staged.select(
        *[F.col(c) for c in df.columns],
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("gopher_keep"),
    )


def c4_rules(df: DataFrame, text_col: str = "text",
             min_words_per_line: int = 5, min_sentences: int = 3,
             banned_words: tuple[str, ...] = ()) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, §2.2) — the third
    published webtext filter family next to gopher_rules and the
    repetition signals, with C4's distinctive LINE-level cleaning:

    line rules (drop the line, keep the doc):
      * keep only lines ending in a terminal punctuation mark
        (``. ! ? "``);
      * keep only lines with ≥ ``min_words_per_line`` whitespace-
        delimited words (the paper's 5);
      * drop lines containing the word "javascript" (case-insensitive).

    document rules (drop the whole page, tested on the ORIGINAL text
    except the sentence count):
      * ≥ ``min_sentences`` sentences after line cleaning — counted as
        terminal-punctuation marks ``[.!?]`` in the cleaned text (the
        paper used an English sentence splitter; this deterministic
        proxy is the documented deviation);
      * no "lorem ipsum";
      * no curly brace ``{`` (code);
      * no token from ``banned_words`` (the paper's dirty-word page
        filter — the list is caller-supplied, compared on lowered
        WORD_RE tokens).

    Emits ``c4_text`` (the line-cleaned text), ``c4_n_lines_kept`` /
    ``c4_n_sentences``, one boolean per document rule, and the
    conjunction ``c4_keep``. Like gopher_rules this is all native
    expressions in whole-stage codegen — a pure map over the corpus
    scan, no shuffle, no Python."""
    t = F.col(text_col)
    lines = F.transform(F.split(t, "\n"), lambda l: ws_strip_col(l))

    def _line_ok(l):
        wc = F.size(ws_split_col(l))
        return (l.rlike('[.!?"]$') & (wc >= min_words_per_line)
                & ~F.lower(l).contains("javascript"))

    staged = df.select("*", F.filter(lines, _line_ok).alias("_c4_lines"))
    c4_text = F.array_join(F.col("_c4_lines"), "\n")
    n_sent = F.regexp_count(c4_text, F.lit(r"[.!?]"))
    low = F.lower(t)
    if banned_words:
        toks = F.regexp_extract_all(low, F.lit(WORD_RE), 0)
        no_banned = ~F.arrays_overlap(
            toks, F.array(*[F.lit(w.lower()) for w in banned_words]))
    else:
        no_banned = F.lit(True)
    rules = {
        "rule_min_sentences": n_sent >= min_sentences,
        "rule_no_lorem_ipsum": ~low.contains("lorem ipsum"),
        "rule_no_brace": ~t.contains("{"),
        "rule_no_banned_words": no_banned,
    }
    keep = F.lit(True)
    for expr in rules.values():
        keep = keep & expr
    return staged.select(
        *[F.col(c) for c in df.columns],
        c4_text.alias("c4_text"),
        F.size(F.col("_c4_lines")).alias("c4_n_lines_kept"),
        n_sent.alias("c4_n_sentences"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("c4_keep"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A.1.1, the MassiveText
    duplicate-line filters): fraction of non-empty lines that are
    duplicates of another line, and fraction of line characters living
    in duplicated lines. Emits dup_line_frac / dup_line_char_frac, the
    two rule booleans (≤0.30 and ≤0.20 — the published thresholds), and
    ``repetition_keep``.

    Native expressions only: the per-line occurrence count is an
    array-level filter inside whole-stage codegen — O(lines²) per doc
    on a doc-bounded array, zero exchange, no Python; the corpus is one
    map pass, same shape as gopher_rules."""
    t = F.col(text_col)
    # ws_strip_col: Python str.strip() semantics (see gopher_rules) —
    # CRLF docs must treat 'foo' and 'foo\r' as the same line.
    raw_lines = F.filter(F.transform(F.split(t, "\n"),
                                     lambda l: ws_strip_col(l)),
                         lambda l: F.length(l) > 0)
    # bind the line array once: HOFs are CodegenFallback, so the inner
    # occurrence-count filter referencing the unbound subtree would
    # re-split+trim the document per line (O(L) recomputes on top of
    # the inherent O(L²) comparisons)
    counted = F.transform(
        F.array(raw_lines),
        lambda lines: F.transform(
            lines,
            lambda l: F.struct(
                F.length(l).alias("len"),
                F.size(F.filter(lines, lambda x: x == l)).alias("cnt"))))[0]
    n_lines = F.size(raw_lines)
    dup_lines = F.size(F.filter(counted, lambda s: s["cnt"] > 1))
    total_chars = F.aggregate(counted, F.lit(0), lambda a, s: a + s["len"])
    dup_chars = F.aggregate(
        counted, F.lit(0),
        lambda a, s: a + F.when(s["cnt"] > 1, s["len"]).otherwise(0))
    dup_line_frac = F.when(n_lines > 0, dup_lines.cast("double") / n_lines
                           ).otherwise(F.lit(0.0))
    dup_char_frac = F.when(total_chars > 0,
                           dup_chars.cast("double") / total_chars
                           ).otherwise(F.lit(0.0))
    rule_lines = dup_line_frac <= 0.30
    rule_chars = dup_char_frac <= 0.20
    return df.select(
        "*",
        F.round(dup_line_frac, 4).alias("dup_line_frac"),
        F.round(dup_char_frac, 4).alias("dup_line_char_frac"),
        rule_lines.alias("rule_dup_lines"),
        rule_chars.alias("rule_dup_line_chars"),
        (rule_lines & rule_chars).alias("repetition_keep"),
    )


# MassiveText n-gram repetition thresholds (Rae et al. 2021 Table A1):
# a document is filtered when the fraction of characters in the most
# frequent n-gram (n=2..4) or in duplicated n-grams (n=5..10) exceeds
# the published bound.
MASSIVETEXT_TOP_NGRAM: tuple[tuple[int, float], ...] = (
    (2, 0.20), (3, 0.18), (4, 0.16))
MASSIVETEXT_DUP_NGRAM: tuple[tuple[int, float], ...] = (
    (5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10))


def ngram_repetition_signals(
        df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
        top_ngrams: tuple[tuple[int, float], ...] = MASSIVETEXT_TOP_NGRAM,
        dup_ngrams: tuple[tuple[int, float], ...] = MASSIVETEXT_DUP_NGRAM,
) -> DataFrame:
    """MassiveText n-gram repetition rules (Rae et al. 2021 Table A1) —
    the other half of the published repetition filter family
    (repetition_signals covers the duplicate-LINE rules): per document,
    the fraction of characters in the most frequent n-gram for each
    n in ``top_ngrams``, and the fraction of characters covered by
    duplicated n-grams for each n in ``dup_ngrams`` (overlapping
    occurrences count each character ONCE, per the paper). Emits one
    metric column + one rule boolean per n, plus the conjunction
    ``ngram_repetition_keep``.

    Exact spec (mirrored by the pure-Python reference in
    tests/test_text.py):
      * token stream = WORD_RE over lowered text — the same stream
        shingles/MinHash/span-dedup match on;
      * character accounting counts WORD characters only (separators
        excluded): doc_chars = Σ len(token);
      * top-n fraction = cnt* · chars* / doc_chars where (cnt*, chars*)
        maximizes (occurrence count, n-gram word chars) — overlapping
        occurrences each count, so the fraction can exceed 1.0 on
        pathological docs ("a a a a"), exactly as the published rule
        behaves; ties beyond (cnt, chars) don't affect the value;
      * dup-n fraction = Σ len(token at covered position) / doc_chars,
        a position being covered when ANY n-gram occurring ≥2 times in
        the doc spans it — a distinct position set, so chars are never
        double-counted;
      * docs with < n tokens (or no tokens) get fraction 0.0.

    100 TB shape: ONE pass over the corpus builds every n's window
    entries doc-locally (token array bound once; each entry is the
    compact struct (n, pos, xxhash64(n-gram), word_chars) — 8-byte key,
    never the n-gram text) and a single explode feeds a map-side
    partially-aggregated groupBy on (id, n, hash). Coverage explodes
    duplicate starts into position rows and joins token lengths on
    (id, pos). Every shuffle row is O(16-32 bytes); no stage holds more
    than one document's tokens in one value. n-grams are compared by
    xxhash64 — a 2^-64-per-pair collision can merge two distinct
    n-grams, the same trade duplicate_ngram_spans(by="hash") makes.
    """
    all_n = sorted({n for n, _ in top_ngrams} | {n for n, _ in dup_ngrams})
    if not all_n:
        raise ValueError("at least one (n, threshold) rule is required")
    if min(all_n) < 2:
        raise ValueError(f"n-gram sizes must be >= 2, got {min(all_n)}")
    top_ns = [n for n, _ in top_ngrams]
    dup_ns = [n for n, _ in dup_ngrams]

    t = F.col(text_col)
    toks = F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0)

    def entries_for(tv: Column, n: int) -> Column:
        idx = F.when(F.size(tv) >= n, F.sequence(F.lit(0), F.size(tv) - n)) \
               .otherwise(F.expr("array()").cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                i.alias("pos"),
                F.xxhash64(F.concat_ws(" ", F.slice(tv, i + 1, n)))
                .alias("h"),
                F.aggregate(F.slice(tv, i + 1, n), F.lit(0),
                            lambda a, w: a + F.length(w)).alias("chars"),
            ))

    entries = bind_once(
        toks, lambda tv: F.concat(*[entries_for(tv, n) for n in all_n]))
    rows = (df.select(F.col(id_col), F.explode(entries).alias("e"))
            .select(id_col, "e.n", "e.pos", "e.h", "e.chars"))

    # (id, pos) -> token length; doubles as the doc_chars denominator.
    tok_lens = (df.select(F.col(id_col),
                          F.posexplode(toks).alias("pos", "tok"))
                .select(id_col, "pos", F.length("tok").alias("tlen")))
    doc_chars = tok_lens.groupBy(id_col).agg(
        F.sum("tlen").alias("doc_chars"))

    # Per-doc, per-n, per-n-gram occurrence counts (map-side partials
    # collapse each partition's repeats before the exchange).
    g = rows.groupBy(id_col, "n", "h").agg(
        F.count("*").alias("cnt"), F.max("chars").alias("chars"))

    out = df
    if top_ns:
        top = (g.filter(F.col("n").isin(top_ns))
               .groupBy(id_col, "n")
               .agg(F.max(F.struct("cnt", "chars")).alias("m"))
               .select(id_col, "n",
                       (F.col("m.cnt") * F.col("m.chars")).alias("top_chars"))
               .join(doc_chars, id_col)
               .select(id_col, "n",
                       (F.col("top_chars").cast("double")
                        / F.col("doc_chars")).alias("frac"))
               .groupBy(id_col).pivot("n", top_ns).agg(F.first("frac")))
        out = out.join(
            top.select(F.col(id_col),
                       *[F.col(str(n)).alias(f"_top_{n}") for n in top_ns]),
            id_col, "left")
    if dup_ns:
        dup_keys = (g.filter(F.col("n").isin(dup_ns) & (F.col("cnt") >= 2))
                    .select(id_col, "n", "h"))
        starts = (rows.filter(F.col("n").isin(dup_ns))
                  .join(dup_keys, [id_col, "n", "h"], "left_semi"))
        covered = (starts
                   .select(F.col(id_col), F.col("n"),
                           F.explode(F.sequence(
                               F.col("pos"),
                               F.col("pos") + F.col("n") - 1)).alias("pos"))
                   .distinct())
        cov = (covered.join(tok_lens, [id_col, "pos"])
               .groupBy(id_col, "n").agg(F.sum("tlen").alias("cov_chars"))
               .join(doc_chars, id_col)
               .select(id_col, "n",
                       (F.col("cov_chars").cast("double")
                        / F.col("doc_chars")).alias("frac"))
               .groupBy(id_col).pivot("n", dup_ns).agg(F.first("frac")))
        out = out.join(
            cov.select(F.col(id_col),
                       *[F.col(str(n)).alias(f"_dup_{n}") for n in dup_ns]),
            id_col, "left")

    keep = F.lit(True)
    metric_cols, rule_cols = [], []
    for n, thr in top_ngrams:
        frac = F.coalesce(F.col(f"_top_{n}"), F.lit(0.0))
        rule = frac <= F.lit(thr)
        metric_cols.append(F.round(frac, 4).alias(f"top_{n}gram_char_frac"))
        rule_cols.append(rule.alias(f"rule_top_{n}gram"))
        keep = keep & rule
    for n, thr in dup_ngrams:
        frac = F.coalesce(F.col(f"_dup_{n}"), F.lit(0.0))
        rule = frac <= F.lit(thr)
        metric_cols.append(F.round(frac, 4).alias(f"dup_{n}gram_char_frac"))
        rule_cols.append(rule.alias(f"rule_dup_{n}gram"))
        keep = keep & rule
    return out.select(
        *[F.col(c) for c in df.columns], *metric_cols, *rule_cols,
        keep.alias("ngram_repetition_keep"))


def shard_by_token_budget(df: DataFrame, budget: int,
                          tokens_col: str = "n_tokens",
                          id_col: str = "doc_id",
                          num_partitions: int = 1,
                          release_into: list | None = None,
                          order_col: str | None = None,
                          group_col: str | None = None) -> DataFrame:
    """Pack documents into ~``budget``-token training shards: the write
    layout step of a training-data pipeline (fixed-size shards feed the
    data loader; a shard is a contiguous run of the deterministic doc
    order). Adds ``shard_id``: with E(d) = sum of tokens of all docs
    before d in (id_col) order, shard_id = floor(E / budget) — the
    offset-binning rule, a pure function of the exclusive prefix sum, so
    the assignment is identical for every partitioning. Each shard's
    token sum lands in budget ± one document.

    num_partitions == 1: one window cumsum over the total order — fine
    while the corpus fits one task's sort.

    num_partitions > 1 (the 100×-scale path): the shared two-phase
    distributed prefix sum (operators/prefix.exclusive_prefix_sum —
    P-long subtotal collect, streaming per-partition assignment over a
    boundary-pinning cache), then shard_id = excl // budget.
    No task ever holds more than ~1/P of the corpus. Callers should
    persist ``df`` — the range exchange scans it twice (boundary
    sketch + shuffle write) before the checkpoint serves the
    downstream jobs. Pass ``release_into`` to receive the prefix sum's
    boundary-pinning cache for ``unpersist()`` (with_crawl_seq's
    contract).

    ``order_col`` replaces the id order with (order_col, id) — pass
    ``sampling.shuffle_key_col`` output to pack shards in a seeded
    pseudo-random order (IID shards for training) instead of crawl-id
    runs; the id tie-break keeps the order total either way.

    ``group_col`` restarts the packing per group value (shard_id 0.. in
    each group): a split corpus must pack each split on its own — a
    global packing would leave every (split, shard) directory
    systematically under budget wherever the other splits' docs
    interleave. The two-phase path still runs ONE global prefix sum
    ordered (group, order, id); each group's in-group offsets are its
    global offsets minus the group's first offset — one O(groups)
    broadcast join, text never reshuffled."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = ([F.asc(group_col)] if group_col is not None else []) \
        + ([F.asc(order_col)] if order_col is not None else []) \
        + [F.asc(id_col)]
    if num_partitions <= 1:
        from pyspark.sql import Window
        base = (Window.partitionBy(group_col) if group_col is not None
                else Window)
        w = (base.orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, -1))
        excl = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
        return df.withColumn(
            "shard_id", F.floor(excl / F.lit(budget)).cast("long"))

    from .prefix import exclusive_prefix_sum

    out = exclusive_prefix_sum(df, order, F.col(tokens_col),
                               "_excl", num_partitions,
                               release_into=release_into)
    # integral div, not floor(double /): prefix sums at corpus scale
    # sit near double's 2^53 integer limit
    if group_col is None:
        return (out.withColumn(
            "shard_id", F.expr(f"_excl div CAST({int(budget)} AS BIGINT)"))
            .drop("_excl"))
    # group rows are contiguous in the global order, so a group's first
    # (minimum) global offset rebases its members to an in-group
    # exclusive sum; the agg shuffles only map-side-partial
    # (group, min) rows from the persisted prefix frame, never text.
    # Null-safe join: a null group is a legitimate group (asc sorts it
    # first, the window path partitions on it) — a plain equi-join
    # would silently drop every null-group row
    grp_base = (out.groupBy(group_col)
                .agg(F.min("_excl").alias("_base"))
                .withColumnRenamed(group_col, "_grp"))
    return (out.join(F.broadcast(grp_base),
                     F.col(group_col).eqNullSafe(F.col("_grp")))
            .withColumn("shard_id",
                        F.expr(f"(_excl - _base) div "
                               f"CAST({int(budget)} AS BIGINT)"))
            .drop("_excl", "_base", "_grp"))


def remove_repeated_tokens(df: DataFrame, text: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition removal: keep each token's FIRST
    occurrence, preserving original order — the standard cleanup for
    boilerplate/keyword-stuffed web text in a training-data pipeline.
    Pure native expressions: split + array_distinct (which keeps
    first-occurrence order), no shuffle, no Python; mirrored in the
    DuckDB oracle by an explicit first-occurrence window (DuckDB's
    list_distinct does NOT preserve order)."""
    toks = ws_split_col(F.col(text))
    uniq = F.array_distinct(toks)
    return (df.filter(F.size(toks) > 0)
            .select(F.col(id_col),
                    F.array_join(uniq, " ").alias("clean_text"),
                    F.size(toks).cast("long").alias("n_tokens"),
                    F.size(uniq).cast("long").alias("n_unique")))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_len: int = 256,
                    overlap: int = 32) -> DataFrame:
    """Split documents into overlapping token-window chunks —
    (id, chunk_id, token_start, n_tokens, chunk_text) — the
    retrieval / context-window prep seam (RAG corpora, long-doc eval
    sets, embedding inputs capped at a model's sequence length).

    Windows are whitespace tokens (``ws_split_col`` — punctuation
    preserved inside tokens, unlike the normalized WORD_RE stream),
    stride = chunk_len − overlap, and the last chunk is the partial
    remainder — chunks stop once one reaches the document's end, so a
    short suffix never re-emits as a pure subset of the previous
    window. A document shorter than ``chunk_len`` is one chunk; an
    empty/null document emits nothing.

    Doc-local native expressions end to end: tokenize once (the token
    array and chunk count are BOUND as lambda variables — HOFs are
    CodegenFallback, so an unbound subtree would re-split the document
    per chunk), build the chunk structs in one ``transform``,
    ``posexplode``. No shuffle, no Python."""
    if not 0 <= overlap < chunk_len:
        raise ValueError(
            f"need 0 <= overlap < chunk_len, got {overlap}/{chunk_len}")
    stride = chunk_len - overlap
    toks = ws_split_col(F.col(text_col))

    def chunks(t: Column) -> Column:
        n = F.size(t)
        n_chunks = F.when(
            n <= chunk_len, F.lit(1)
        ).otherwise((F.lit(1) + F.ceil((n - chunk_len) / F.lit(stride)))
                    .cast("int"))
        idx = F.when(n >= 1, F.sequence(F.lit(0), n_chunks - 1)) \
               .otherwise(F.expr("array()").cast("array<int>"))

        def mk(i: Column) -> Column:
            start = i * stride
            return F.struct(
                start.alias("token_start"),
                F.least(F.lit(chunk_len), n - start).alias("n_tokens"),
                F.concat_ws(" ", F.slice(t, start + 1, chunk_len))
                 .alias("chunk_text"))

        return F.transform(idx, mk)

    arr = bind_once(toks, chunks)
    return (df.select(F.col(id_col), F.posexplode(arr).alias("chunk_id", "c"))
            .select(id_col, "chunk_id", F.col("c.token_start"),
                    F.col("c.n_tokens"), F.col("c.chunk_text")))


def paragraph_langs(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n") -> DataFrame:
    """(id, pos, lang, n_chars) per non-empty paragraph — the
    paragraph-granular language signal (CCNet identifies language per
    paragraph, not per page: boilerplate-translated chrome and quoted
    snippets routinely disagree with the body). Pure map + posexplode,
    the same split rule as paragraph_dedup; language is the engine's
    deterministic langid_col heuristic (swap in the trainable
    operators/langid profiles upstream for a real model)."""
    import re as _re
    paras = F.split(F.col(text_col), _re.escape(sep))
    return (df.select(F.col(id_col), F.posexplode(paras).alias("pos", "para"))
            .filter(F.trim(F.col("para")) != "")
            .select(id_col, "pos", langid_col(F.col("para")).alias("lang"),
                    F.length("para").alias("n_chars")))


def lang_consistency(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n") -> DataFrame:
    """Per-document language-mix profile: (id, doc_lang, major_frac,
    n_langs, n_paras) — doc_lang is the char-mass majority paragraph
    language (deterministic tie-break: lang asc), major_frac its share
    of non-empty paragraph chars, n_langs the distinct paragraph
    languages. The code-switching gate multilingual pipelines apply
    before per-language routing: a page whose majority language holds
    <~0.7 of the mass is usually chrome+body disagreement or true
    mixed content, and routing it whole poisons both corpora.

    Shape: paragraph rows collapse map-side to O(docs × langs-per-doc)
    ≤ a few rows per doc; one per-id window picks the majority. Text
    never rides a shuffle — only (id, lang, chars) rows do."""
    per_lang = (paragraph_langs(df, id_col, text_col, sep)
                .groupBy(id_col, "lang")
                .agg(F.sum("n_chars").alias("chars"),
                     F.count("*").alias("paras")))
    w = Window.partitionBy(id_col).orderBy(F.desc("chars"), F.asc("lang"))
    tot = Window.partitionBy(id_col)
    return (per_lang
            .withColumn("r", F.row_number().over(w))
            .withColumn("total_chars", F.sum("chars").over(tot))
            .withColumn("n_langs", F.count("*").over(tot))
            .withColumn("n_paras", F.sum("paras").over(tot))
            .filter(F.col("r") == 1)
            .select(id_col, F.col("lang").alias("doc_lang"),
                    F.round(F.col("chars") / F.col("total_chars"), 6)
                    .alias("major_frac"),
                    F.col("n_langs").cast("int").alias("n_langs"),
                    F.col("n_paras").cast("int").alias("n_paras")))
