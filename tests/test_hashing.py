"""op 30: pure-Python XXH64(seed 42) is bit-exact with Spark's xxhash64
builtin — this is what lets the single-node oracle share dedup keys
with the engine."""

import numpy as np
from pyspark.sql import functions as F

from data_crawler_spark.functions.hashing import (
    bloom_positions_np,
    xxhash64_str,
)

CASES = [
    "", "a", "abc", "abcd", "abcdefg", "abcdefgh",
    "https://example.com/", "https://host3.example.com/sec7/p3.html",
    "x" * 31, "y" * 32, "z" * 33, "w" * 100, "日本語のテキスト", "ü" * 40,
]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in CASES:
        assert got[s] == xxhash64_str(s), s


def test_bloom_positions_shape_and_range():
    h = np.array([xxhash64_str(f"u{i}") for i in range(100)], dtype=np.int64)
    pos = bloom_positions_np(h, k=7, m_bits=1 << 20)
    assert pos.shape == (100, 7)
    assert pos.max() < (1 << 20)
    # deterministic
    pos2 = bloom_positions_np(h, k=7, m_bits=1 << 20)
    assert (pos == pos2).all()
