"""data_crawler_spark — a from-scratch PySpark-native crawl-analytics engine.

Re-expresses the capabilities characterized for yura102318/Data_Crawler
(reference snapshot at /root/reference: README.md:1-2 only — the repo
contains no implementation code, see SURVEY.md §0) as an idiomatic
Spark DataFrame program: a distributed URL frontier + politeness
scheduler + vectorized page extractor over Common-Crawl-style page
tables, plus the training-data-pipeline operator family (dedup,
similarity search, text analysis, multimodal plumbing).

Design rules (SURVEY.md §4.3, BASELINE.json:15):
- pyspark.sql DataFrames + pandas/Arrow UDFs only; no RDDs, no
  per-row Python UDFs.
- Every ordering ends in a total-order tie-breaker.
- All state lives in versioned tables (resumable), never in executor
  memory.
"""

__version__ = "0.1.0"
