"""Spark-facing vectorized UDFs (scalar pandas UDFs, Arrow-batched).

Each UDF is a thin wrapper over the shared executable-spec functions in
functions/canonicalize.py and functions/extract.py — the SAME code the
single-node oracle runs, which is what makes the byte-identity and
exact-set obligations (BASELINE.json:2,14,15) hold by construction.
SURVEY.md §2 ops 05, 42, 43.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from data_crawler_spark.functions.canonicalize import canonicalize_series
from data_crawler_spark.functions.extract import (
    extract_links_series,
    extract_text_series,
    extract_title_series,
)


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


@pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    return extract_title_series(html)


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return extract_links_series(html)
