"""Fixed, explicit schemas (never inferred — SURVEY.md §1.2).

``PAGES`` is fixed verbatim by BASELINE.json:15; the state-table
schemas are fixed for the resume/equivalence tests (FIXTURES.md §B.4).
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

FRONTIER = StructType([
    StructField("url", StringType(), False),
    StructField("url_hash", LongType(), False),
    StructField("host", StringType(), True),
    StructField("depth", IntegerType(), False),
    StructField("priority", DoubleType(), False),
    StructField("discovered_round", IntegerType(), False),
    StructField("parent_url", StringType(), True),
])

SEEN = StructType([
    StructField("url_hash", LongType(), False),
    StructField("url", StringType(), False),
    StructField("first_round", IntegerType(), False),
])

SCHEDULED = StructType([
    StructField("round", IntegerType(), False),
    # long: a round's seq is bounded by Σ host budgets, which exceeds
    # int32 at the 10^10-URL design point; the two-phase sequencer
    # (operators/scheduler.py) emits int64 natively
    StructField("seq", LongType(), False),
    StructField("url", StringType(), False),
    StructField("url_hash", LongType(), False),
    StructField("host", StringType(), True),
    StructField("depth", IntegerType(), False),
    StructField("priority", DoubleType(), False),
    StructField("rn", IntegerType(), False),
])

EXTRACTED = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("n_chars", LongType(), True),
    StructField("round", IntegerType(), False),
])

# typed race-event records mined per round from fetched pages
# (operators/structured.py race_event_records — the reference's actual
# payload, /root/reference/README.md:2): schema.org SportsEvent JSON-LD
# fields + the parsed results-table aggregate
EVENTS = StructType([
    StructField("url", StringType(), False),
    StructField("round", IntegerType(), False),
    StructField("event_name", StringType(), True),
    StructField("start_date", StringType(), True),
    StructField("location_name", StringType(), True),
    StructField("distance_km", DoubleType(), True),
    StructField("n_finishers", LongType(), True),
    StructField("winner", StringType(), True),
    StructField("winner_time_s", LongType(), True),
])

BLOOM = StructType([
    StructField("bucket", IntegerType(), False),
    StructField("m_bits", LongType(), False),
    StructField("k", IntegerType(), False),
    StructField("n_items", LongType(), False),
    StructField("bitmap", ArrayType(LongType(), False), False),
])

LINEAGE = StructType([
    StructField("round", IntegerType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("metric", StringType(), False),
    StructField("value", LongType(), False),
])
