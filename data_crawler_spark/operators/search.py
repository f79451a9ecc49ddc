"""Distributed full-text relevance scoring — BM25 over the corpus.

The text-side counterpart of the embedding ANN stack
(operators/similarity.py): given a query set, rank documents by
Okapi BM25 (Robertson & Walker; the Lucene-default scoring function).
Used in pipeline curation for retrieving benchmark-adjacent documents
(decontamination beyond exact n-gram match) and for building
retrieval supervision pairs from anchor/query logs.

Scale shape:
- ``term_postings`` is the classic postings build: explode tokens,
  reduce per (term, doc) with a map-side partial — ONE shuffle.
  doc_len is computed at explode time (the tokenizer runs twice per
  doc — CPU traded for not adding a doc_id exchange) and rides each
  posting as 8 denormalized bytes, so scoring never joins back to
  the corpus.
- ``bm25_topk`` prunes the postings to the query vocabulary FIRST
  (broadcast semi-join — at 100 TB this is the difference between
  touching the query terms' postings lists and touching the corpus),
  computes document frequency only for those terms, broadcasts the
  (query_id, term, idf) side, folds per (query, doc) with map-side
  partial sums, and ranks per query through one window. The wide
  text column never appears past the postings build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_crawler_spark.operators.text import token_count_col, tokens_col

__all__ = ["term_postings", "bm25_topk", "positional_postings",
           "phrase_matches", "tfidf_top_terms", "SearchIndex"]


def term_postings(corpus: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Corpus -> postings ``(term, doc_id, tf, doc_len)``."""
    toks = corpus.select(
        F.col(id_col).alias("doc_id"),
        token_count_col(F.col(text_col)).alias("doc_len"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    return (toks.groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"),
                 F.min("doc_len").alias("doc_len")))


def positional_postings(corpus: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Corpus -> positional postings ``(term, doc_id, pos)`` — one row
    per token occurrence, ``pos`` the 0-based token index. The
    phrase-query building block (and the shape a positional inverted
    index serializes from). Pure explode: no shuffle is added here;
    consumers aggregate on their own keys."""
    return corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )


def phrase_matches(corpus: DataFrame, phrases: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   query_id_col: str = "query_id",
                   phrase_col: str = "phrase") -> DataFrame:
    """Exact token-phrase search: ``(query_id, doc_id, n_matches,
    first_pos)`` — one row per document containing each query phrase
    as CONSECUTIVE tokens (tokens_col tokenization on both sides),
    n_matches the occurrence count, first_pos the earliest start.
    Several phrase rows per query id fold as OR (duplicates ignored).

    Diagonal-anchor formulation: phrase term i at document position p
    votes for anchor ``p - i``; an anchor where all m offsets voted is
    a match. The corpus side is pruned to the phrase vocabulary by a
    BROADCAST join before any aggregation, so at 100 TB the shuffle
    carries only (query, doc, anchor, offset) rows for documents
    containing phrase terms — never the corpus. Empty phrases are
    rejected; a one-term phrase degenerates to term lookup."""
    pdf = phrases.select(F.col(query_id_col).alias("query_id"),
                         tokens_col(F.col(phrase_col)).alias("_toks"))
    if pdf.filter(F.col("_toks").isNull()
                  | (F.size("_toks") == 0)).limit(1).count():
        raise ValueError("phrase_matches: phrase with no tokens")
    # votes are keyed per PHRASE (token-array hash), not per query id:
    # two same-length phrases under one query would otherwise
    # cross-vote anchors (false matches), and a duplicated phrase row
    # would double every offset vote so n_offsets == m never holds
    pdf = pdf.dropDuplicates(["query_id", "_toks"])
    q = pdf.select(
        "query_id",
        F.xxhash64("_toks").alias("_ph"),
        F.posexplode("_toks").alias("offset", "term"),
        F.size("_toks").alias("m"))

    hits = (positional_postings(corpus, id_col, text_col)
            .join(F.broadcast(q), "term")
            .select("query_id", "_ph", "doc_id", "m",
                    (F.col("pos") - F.col("offset")).alias("anchor"),
                    "offset"))
    anchors = (hits.groupBy("query_id", "_ph", "doc_id", "anchor", "m")
               # a position can vote the same offset only once, so
               # count(*) == countDistinct(offset) — keep the cheap one
               .agg(F.count("*").alias("n_offsets"))
               .where((F.col("n_offsets") == F.col("m"))
                      & (F.col("anchor") >= 0)))
    # multi-phrase queries fold as OR: every (phrase, anchor) match
    # counts once, first_pos the earliest across the query's phrases
    return (anchors.groupBy("query_id", "doc_id")
            .agg(F.count("*").alias("n_matches"),
                 F.min("anchor").alias("first_pos")))


def bm25_topk(corpus: DataFrame, queries: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id",
              query_col: str = "query",
              k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(query_id, doc_id, score, rank) — top-k BM25 matches per query.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (the Lucene form — always
    positive, so common-term queries cannot produce negative
    contributions). N counts ALL corpus docs (token-less ones too).
    Ties break (score DESC, doc_id ASC) — a total order, deterministic
    under any partitioning. Documents matching no query term are
    absent (score 0 by definition)."""
    consts = corpus.agg(
        F.count("*").alias("n_docs"),
        F.avg(token_count_col(F.col(text_col))).alias("avg_len"),
    ).first()
    n_docs, avg_len = consts["n_docs"], consts["avg_len"]
    if not n_docs or not avg_len:
        raise ValueError("bm25_topk: empty corpus (no tokens)")

    q_terms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens_col(F.col(query_col))))
        .alias("term"))

    # prune the corpus-side work to the query vocabulary before
    # anything else touches it; both the df aggregate and the scoring
    # join read the pruned postings, so materialize them ONCE
    # (localCheckpoint — without it the corpus would tokenize twice)
    hit = term_postings(corpus, id_col, text_col).join(
        F.broadcast(q_terms.select("term").distinct()), "term",
        "left_semi").localCheckpoint()
    return _bm25_rank(hit, q_terms, n_docs, avg_len, k, k1, b)


def _bm25_rank(hit: DataFrame, q_terms: DataFrame, n_docs: int,
               avg_len: float, k: int, k1: float, b: float) -> DataFrame:
    """Score + rank over query-vocabulary-pruned postings ``hit``
    ((term, doc_id, tf, doc_len), unique per (term, doc)) — the shared
    back half of ``bm25_topk`` and ``SearchIndex.topk``."""
    # postings are unique per (term, doc): df = row count per term
    df_by_term = hit.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df")
                              + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    q_idf = (q_terms.join(df_by_term, "term", "inner")
             .select("query_id", "term", idf.alias("idf")))

    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len")
                            / F.lit(float(avg_len))))
    scored = (hit.join(F.broadcast(q_idf), "term", "inner")
              .groupBy("query_id", "doc_id")
              .agg(F.sum(F.col("idf") * tf_norm).alias("score")))

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def tfidf_top_terms(corpus: DataFrame, k: int = 10,
                    id_col: str = "doc_id",
                    text_col: str = "text",
                    min_df: int = 1) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms: ``(doc_id, term, tfidf,
    rank)`` — the classic keyword/topicality profile (corpus audits,
    dataset cards, cheap topic labels next to the embedding
    clusters). ``tfidf = (tf / doc_len) · ln((N+1)/(df+1))`` — the
    smoothed idf, never negative, exact (mirrored in tests).
    ``min_df`` drops hapax noise before ranking.

    Scale shape: one postings pass (term_postings' map-side-partial
    groupBy), ONE O(vocab)-row df aggregate joined back on the term
    key, and a per-doc window over ≤ the doc's distinct terms. N is
    the one scalar driver action. Nothing corpus-sized is collected
    or broadcast — at 100 TB both joins are plain keyed shuffles AQE
    can re-plan."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_docs = corpus.select(id_col).distinct().count()
    if n_docs == 0:
        id_dt = corpus.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"doc_id {id_dt}, term string, tfidf double, rank int")
    post = term_postings(corpus, id_col, text_col)
    df_tbl = (post.groupBy("term")
              .agg(F.count("*").alias("df"))
              .filter(F.col("df") >= min_df))
    scored = (post.join(df_tbl, "term")
              .withColumn(
                  "tfidf",
                  F.round((F.col("tf") / F.col("doc_len"))
                          * F.log((F.lit(float(n_docs) + 1.0))
                                  / (F.col("df") + F.lit(1.0))), 9)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"),
                                             F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "tfidf", "rank"))


class SearchIndex:
    """Persistent BM25 index: build ONCE over the corpus (the postings
    pass — the only stage that reads text), commit the postings and
    corpus stats as snapshot tables, and answer any number of later
    query batches by scanning ONLY the query terms' postings rows.
    The AnnIndex serving shape applied to full-text search: rebuilding
    postings per query batch re-tokenizes the corpus; an index
    amortizes it to once per corpus version, and ``add()`` keeps day-2
    deltas O(delta).

    Layout under ``state_dir``: ``{name}_postings`` ((term, doc_id,
    tf, doc_len) — versioned, crash-safe, time-travelable) and
    ``{name}_stats`` (one JSON meta row). The stats commit is the
    ATOMIC pointer swap: its row pins the postings VERSION it was
    computed against and readers open exactly that version, so a
    crash between the postings write and the stats write (build or
    add) leaves the old stats+old-postings pairing fully consistent —
    never new postings scored with stale document counts."""

    _STATS_DDL = "kind string, s string"

    def __init__(self, spark, state_dir, name: str = "bm25"):
        """Open an EXISTING index (see ``SearchIndex.build``)."""
        import json as _json

        from pyspark.sql.types import _parse_datatype_string

        from data_crawler_spark.plans.snapshots import SnapshotTable

        self.spark = spark
        self._stats = SnapshotTable(
            spark, state_dir, f"{name}_stats",
            _parse_datatype_string(self._STATS_DDL))
        rows = self._stats.read().collect()
        meta_s = next((r.s for r in rows if r.kind == "meta"), None)
        if meta_s is None:
            raise ValueError(
                f"no committed search index under {state_dir}/{name}_stats"
                f" — build one with SearchIndex.build(...)")
        meta = _json.loads(meta_s)
        self.id_col, self.text_col = meta["id_col"], meta["text_col"]
        self.n_docs, self.total_len = meta["n_docs"], meta["total_len"]
        self._postings_version = meta["postings_version"]
        self._postings = SnapshotTable(
            spark, state_dir, f"{name}_postings",
            _parse_datatype_string(meta["postings_ddl"]))
        self._state_dir, self._name = state_dir, name

    # -- construction -----------------------------------------------------

    @classmethod
    def build(cls, spark, state_dir, corpus: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              name: str = "bm25") -> "SearchIndex":
        """One postings pass over ``corpus`` + one stats aggregate,
        both committed; returns the opened index."""
        from pyspark.sql.types import _parse_datatype_string

        from data_crawler_spark.plans.snapshots import SnapshotTable

        id_dt = corpus.schema[id_col].dataType.simpleString()
        ddl = f"term string, doc_id {id_dt}, tf bigint, doc_len bigint"
        postings_tbl = SnapshotTable(spark, state_dir, f"{name}_postings",
                                     _parse_datatype_string(ddl))
        p = term_postings(corpus, id_col, text_col).select(
            "term", "doc_id", F.col("tf").cast("long"),
            F.col("doc_len").cast("long"))
        v = postings_tbl.write(p, mode="overwrite")
        consts = corpus.agg(
            F.count("*").alias("n"),
            F.sum(token_count_col(F.col(text_col))).alias("tl")).first()
        cls._commit_stats(spark, state_dir, name, {
            "id_col": id_col, "text_col": text_col,
            "n_docs": int(consts["n"]), "total_len": int(consts["tl"] or 0),
            "postings_version": v, "postings_ddl": ddl})
        return cls(spark, state_dir, name)

    @classmethod
    def _commit_stats(cls, spark, state_dir, name, meta: dict) -> None:
        import json as _json

        from pyspark.sql.types import _parse_datatype_string

        from data_crawler_spark.plans.snapshots import SnapshotTable

        tbl = SnapshotTable(spark, state_dir, f"{name}_stats",
                            _parse_datatype_string(cls._STATS_DDL))
        tbl.write(spark.createDataFrame([("meta", _json.dumps(meta))],
                                        cls._STATS_DDL), mode="overwrite")

    def add(self, delta: DataFrame) -> None:
        """Index a day-2 delta: O(delta) postings append + stats
        update. Re-adding an already-indexed doc id raises — duplicate
        postings rows would double-count tf and df silently (the
        IncrementalMinHashIndex guard). The id check scans only the
        column-pruned doc_id column of the committed postings."""
        ids = F.broadcast(delta.select(F.col(self.id_col).alias("doc_id"))
                          .distinct())
        dup = (self._postings.read(self._postings_version)
               .join(ids, "doc_id", "left_semi").limit(1).count())
        if dup:
            raise ValueError("SearchIndex.add: delta contains doc ids "
                             "already indexed")
        p = term_postings(delta, self.id_col, self.text_col).select(
            "term", "doc_id", F.col("tf").cast("long"),
            F.col("doc_len").cast("long"))
        v = self._postings.write(p, mode="append")
        consts = delta.agg(
            F.count("*").alias("n"),
            F.sum(token_count_col(F.col(self.text_col))).alias("tl")).first()
        self.n_docs += int(consts["n"])
        self.total_len += int(consts["tl"] or 0)
        self._postings_version = v
        self._commit_stats(self.spark, self._state_dir, self._name, {
            "id_col": self.id_col, "text_col": self.text_col,
            "n_docs": self.n_docs, "total_len": self.total_len,
            "postings_version": v,
            "postings_ddl": ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in self._postings.schema.fields)})

    # -- queries ----------------------------------------------------------

    def topk(self, queries: DataFrame, k: int = 10,
             query_id_col: str = "query_id", query_col: str = "query",
             k1: float = 1.2, b: float = 0.75) -> DataFrame:
        """(query_id, doc_id, score, rank) — identical semantics and
        values to ``bm25_topk`` over the indexed corpus, but the plan
        reads the committed postings (pruned to the query vocabulary
        by a broadcast semi-join) instead of re-tokenizing text."""
        if not self.n_docs or not self.total_len:
            raise ValueError("SearchIndex.topk: empty index")
        q_terms = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(tokens_col(F.col(query_col))))
            .alias("term"))
        hit = (self._postings.read(self._postings_version)
               .join(F.broadcast(q_terms.select("term").distinct()),
                     "term", "left_semi").localCheckpoint())
        avg_len = self.total_len / self.n_docs
        return _bm25_rank(hit, q_terms, self.n_docs, avg_len, k, k1, b)


def mine_hard_negatives(corpus: DataFrame, pairs: DataFrame,
                        n_neg: int = 4, depth: int = 50,
                        id_col: str = "doc_id", text_col: str = "text",
                        query_id_col: str = "query_id",
                        query_col: str = "query",
                        pos_id_col: str = "pos_doc_id",
                        index: "SearchIndex | None" = None) -> DataFrame:
    """BM25 hard negatives for retrieval training pairs (the DPR /
    sentence-transformers recipe: the best negatives are documents the
    lexical ranker scores HIGH that are not labeled positive): given
    ``pairs`` (query_id, query, pos_doc_id — multiple positives per
    query fold naturally), return (query_id, doc_id, score, neg_rank)
    — the top ``n_neg`` BM25 hits per query AFTER removing every
    labeled positive, re-ranked 1..n_neg.

    ``depth`` is the BM25 pool mined per query before positives are
    removed — it must exceed n_neg + the max positives per query or a
    heavily-labeled query comes back short. Pass ``index=`` (a built
    SearchIndex) to mine from committed postings instead of
    re-tokenizing the corpus. Scale shape: everything after the BM25
    stage runs on O(queries × depth) rows — one anti-join against the
    positive labels, one per-query window."""
    if n_neg < 1 or depth < n_neg:
        raise ValueError(f"need 1 <= n_neg <= depth, got {n_neg}/{depth}")
    queries = pairs.select(F.col(query_id_col).alias("query_id"),
                           F.col(query_col).alias("query")).distinct()
    if index is not None:
        pool = index.topk(queries, k=depth)
    else:
        pool = bm25_topk(corpus, queries, id_col=id_col, text_col=text_col,
                         k=depth)
    pos = pairs.select(F.col(query_id_col).alias("query_id"),
                       F.col(pos_id_col).alias("doc_id"))
    neg = pool.join(pos, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (neg.withColumn("neg_rank", F.row_number().over(w))
            .where(F.col("neg_rank") <= n_neg)
            .select("query_id", "doc_id", "score", "neg_rank"))
