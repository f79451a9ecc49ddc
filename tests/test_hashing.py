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


def test_xxhash64_long_np_matches_spark(spark):
    """The numpy XXH64-of-long (bloom position scheme) must be bit-exact
    with Spark's builtin, including two-column chaining."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_crawler_spark.functions.hashing import xxhash64_long_np

    rng = np.random.default_rng(11)
    vals = rng.integers(-(2**63), 2**63 - 1, size=500, dtype=np.int64)
    js = rng.integers(0, 16, size=500, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(v), int(j)) for v, j in zip(vals, js)], "v long, j long")
    got = df.select(F.xxhash64("v").alias("h1"),
                    F.xxhash64("v", "j").alias("h2")).collect()
    base = xxhash64_long_np(vals, 42).astype(np.int64)
    chained = xxhash64_long_np(js, base).astype(np.int64)
    for r, b, c in zip(got, base, chained):
        assert r.h1 == b and r.h2 == c
