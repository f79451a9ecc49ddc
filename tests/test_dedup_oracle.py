"""Value-level bound checks for the rows-only dedup entries (dd03 /
dd04): DuckDB full-pairs oracles at fixture scale assert that every
emitted pair's VALUE is exact and that emitted pairs sit inside the
oracle's above-threshold pair set. Recall stays approximate by design
for MinHash LSH (the s-curve can miss borderline pairs — that tier is
covered by the planted-near-dup recall test in test_dedup.py); SimHash
blocking at hamming<=3 is pigeonhole-EXACT, so there the emitted set
must equal the oracle's."""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pandas as pd
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"
WORD_RE = "[A-Za-z0-9]+"


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    """Fixture documents + planted near-dups (one word perturbed), so
    the emitted pair sets are non-empty regardless of the generated
    corpus's natural duplicate rate."""
    pdf = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{DOCS}')").df()
    planted = []
    for i, row in pdf.head(8).iterrows():
        words = row["text"].split()
        if len(words) > 6:
            words[3] = "perturbed"
        planted.append({"doc_id": 10_000_000 + int(row["doc_id"]),
                        "text": " ".join(words)})
    return pd.concat([pdf, pd.DataFrame(planted)], ignore_index=True)


def test_dd03_minhash_pair_values_exact_vs_duckdb(spark, corpus):
    """(a) every emitted pair's jaccard equals the DuckDB full-pairs
    shingle-Jaccard for that pair; (b) emitted ⊆ oracle pairs above
    threshold."""
    from data_crawler_spark.operators.dedup import minhash_near_dups

    thr = 0.5
    docs = spark.createDataFrame(corpus)
    got = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_near_dups(docs, threshold=thr).collect()}
    assert got, "planted near-dups must surface at fixture scale"

    con = duckdb.connect()
    con.register("docs", corpus)
    oracle_rows = con.execute(f"""
        WITH t AS (
          SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS toks
          FROM docs
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS s
          FROM t WHERE len(toks) >= 3
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    """).fetchall()
    oracle = {(ida, idb): j for ida, idb, j in oracle_rows}

    for pair, jac in got.items():
        assert pair in oracle, pair
        # Spark rounds HALF_UP to 4 decimals
        want = float(Decimal(str(oracle[pair]))
                     .quantize(Decimal("0.0001"), ROUND_HALF_UP))
        assert abs(jac - want) <= 1e-9, (pair, jac, oracle[pair])
        assert oracle[pair] >= thr - 1e-9, (pair, oracle[pair])


def test_dd04_simhash_pairs_equal_duckdb_oracle(spark, corpus):
    """SimHash 16-bit-chunk blocking is EXACT at hamming<=3 (4 chunks,
    <=3 differing bits -> some chunk matches exactly), so dd04's
    emitted pair set must EQUAL the DuckDB all-pairs set within the
    threshold, with exact hamming values. Signature correctness itself
    is pinned byte-identical to the executable spec in test_dedup.py —
    this check hardens the blocking + verify stages."""
    from data_crawler_spark.operators.dedup import (simhash_near_dups,
                                                    simhash_signatures)

    max_h = 3
    docs = spark.createDataFrame(corpus)
    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_near_dups(docs, max_hamming=max_h).collect()}
    assert got, "planted near-dups must collide at fixture scale"

    sigs = simhash_signatures(docs).toPandas()
    con = duckdb.connect()
    con.register("sigs", sigs)
    oracle_rows = con.execute("""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sim, b.sim)) AS h
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    """).fetchall()
    oracle = {(x, y): h for x, y, h in oracle_rows}

    want = {p: h for p, h in oracle.items() if h <= max_h}
    assert got == want


# ---------------------------------------------------------------------------
# dd07: exact substring (cross-doc duplicate n-gram span) dedup
# ---------------------------------------------------------------------------

SPAN_ORACLE = f"""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS toks
               FROM docs),
    p AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i FROM t),
    g AS (SELECT doc_id, i,
                 STRING_AGG(w, ' ') OVER win AS ngram,
                 COUNT(*) OVER win AS wlen
          FROM p WINDOW win AS (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING))
"""


def test_dd07_span_detection_exact_vs_duckdb(spark, corpus):
    """String-keyed detection equals the DuckDB window oracle
    value-for-value; the hash path finds the same groups."""
    from data_crawler_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(corpus)
    got = {r.ngram: (r.n_docs, r.n_occ, r.first_doc)
           for r in duplicate_ngram_spans(docs, n=8, min_docs=2).collect()}
    assert got, "the corpus shares 8-gram spans across docs by construction"

    con = duckdb.connect()
    con.register("docs", corpus)
    oracle = {ng: (nd, no, fd) for ng, nd, no, fd in con.execute(
        SPAN_ORACLE + """
        SELECT ngram, COUNT(DISTINCT doc_id), COUNT(*), MIN(doc_id)
        FROM g WHERE wlen = 8 GROUP BY ngram HAVING COUNT(DISTINCT doc_id) >= 2
        """).fetchall()}
    assert got == oracle

    n_hash = duplicate_ngram_spans(docs, n=8, min_docs=2, by="hash").count()
    assert n_hash == len(oracle)


def test_remove_duplicate_spans_vs_duckdb(spark, corpus):
    """Span REMOVAL value check: per-doc clean_text / n_removed equal a
    DuckDB oracle that drops every position covered by a cross-doc
    duplicate 8-gram occurrence."""
    from data_crawler_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(corpus)
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
           for r in remove_duplicate_spans(docs, n=8, min_docs=2).collect()}

    con = duckdb.connect()
    con.register("docs", corpus)
    rows = con.execute(SPAN_ORACLE + """
        , dup AS (SELECT ngram FROM g WHERE wlen = 8
                  GROUP BY ngram HAVING COUNT(DISTINCT doc_id) >= 2),
        starts AS (SELECT doc_id, i FROM g
                   WHERE wlen = 8 AND ngram IN (SELECT ngram FROM dup)),
        cov AS (SELECT DISTINCT doc_id, i + j AS cp
                FROM starts, generate_series(0, 7) s(j))
        SELECT p.doc_id,
               COALESCE(STRING_AGG(p.w, ' ' ORDER BY p.i)
                        FILTER (WHERE cov.cp IS NULL), '') AS clean_text,
               COUNT(*) AS n_tokens,
               COUNT(cov.cp) AS n_removed
        FROM p LEFT JOIN cov ON p.doc_id = cov.doc_id AND p.i = cov.cp
        GROUP BY p.doc_id
    """).fetchall()
    oracle = {d: (ct, nt, nr) for d, ct, nt, nr in rows}
    assert got == oracle
    assert sum(nr for _, _, nr in got.values()) > 0


def test_remove_duplicate_spans_kills_all_original_dups(spark, corpus):
    """No n-gram that was duplicated across the ORIGINAL corpus
    survives anywhere in the cleaned corpus (removal can create new
    adjacencies — Lee et al.'s known artifact — but never preserve an
    original duplicate occurrence)."""
    from data_crawler_spark.operators.dedup import (duplicate_ngram_spans,
                                                    remove_duplicate_spans)
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(corpus)
    cleaned = (remove_duplicate_spans(docs, n=8, min_docs=2)
               .select("doc_id", F.col("clean_text").alias("text")))
    orig_dups = (duplicate_ngram_spans(docs, n=8, min_docs=2, by="hash")
                 .select("ngram_hash"))
    surviving = (duplicate_ngram_spans(cleaned, n=8, min_docs=1, by="hash")
                 .join(orig_dups, "ngram_hash", "left_semi"))
    assert surviving.count() == 0


# ---------------------------------------------------------------------------
# inc01: incremental cross-snapshot dedup
# ---------------------------------------------------------------------------


def test_inc01_pairs_exact_vs_duckdb(spark, corpus, tmp_path):
    """Value bound-check for the incremental index's banding + estimate
    stages, GIVEN the signatures (signature correctness is byte-pinned
    against the executable spec in test_dedup.py — same layering as the
    dd04 check): the second `add`'s emitted pair set must EQUAL the
    DuckDB set of pairs that (a) touch the delta, (b) collide in >=1
    band (band-hash equality == band-slice equality, xxhash64 is
    injective on these fixtures), and (c) carry round-4 signature-
    estimated jaccard >= threshold — with exact est values."""
    from data_crawler_spark.operators.dedup import IncrementalMinHashIndex

    thr = 0.5
    d1 = corpus[corpus.doc_id < 10_000_000]
    d2 = corpus[corpus.doc_id >= 10_000_000]
    idx = IncrementalMinHashIndex(spark, str(tmp_path), n_hashes=64,
                                  n_bands=16)
    idx.add(spark.createDataFrame(d1), threshold=thr).count()
    got = {(r.id_a, r.id_b): r.est_jaccard
           for r in idx.add(spark.createDataFrame(d2),
                            threshold=thr).collect()}
    assert got, "planted near-dups must pair with their originals"

    sigs = idx.signatures().toPandas()
    sigs["sig"] = sigs["sig"].map(list)
    con = duckdb.connect()
    con.register("sigs", sigs)
    rows = con.execute("""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          len(list_filter(range(64),
              i -> a.sig[CAST(i AS INT)+1] = b.sig[CAST(i AS INT)+1])) AS eq,
          len(list_filter(range(16), bb ->
              list_slice(a.sig, CAST(bb AS INT)*4+1, CAST(bb AS INT)*4+4)
            = list_slice(b.sig, CAST(bb AS INT)*4+1, CAST(bb AS INT)*4+4)
          )) > 0 AS collide
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    """).fetchall()
    delta2 = set(d2.doc_id)
    oracle = {}
    for id_a, id_b, eq, collide in rows:
        if not collide or (id_a not in delta2 and id_b not in delta2):
            continue
        est = float(Decimal(eq) / 64)  # k/64 is dyadic: round-4 is exact
        est = float(Decimal(str(est)).quantize(Decimal("0.0001"),
                                               ROUND_HALF_UP))
        if est >= thr:
            oracle[(id_a, id_b)] = est
    assert got == oracle
