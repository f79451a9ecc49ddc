"""XXH64 (seed 42) — bit-exact with Spark SQL's ``xxhash64`` builtin.

Spark's ``xxhash64(col)`` hashes the UTF-8 bytes of a string with the
standard XXH64 algorithm at seed 42 (verified against Spark 4.1.2 in
tests/test_hashing.py). Having the same hash in pure Python lets the
single-node oracle crawler (oracle/crawler.py) share partition/dedup
keys with the distributed engine (SURVEY.md §2 op 30).

Also provides the splitmix64 mixer used to derive the k bloom-filter
bit positions from a single xxhash64 key (SURVEY.md §2 op 31), in both
scalar-int and numpy-vectorized forms.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_bytes(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64

        def _round(v: int, off: int) -> int:
            k = int.from_bytes(data[off:off + 8], "little")
            return (_rotl((v + k * _P2) & _M64, 31) * _P1) & _M64

        while i + 32 <= n:
            v1 = _round(v1, i)
            v2 = _round(v2, i + 8)
            v3 = _round(v3, i + 16)
            v4 = _round(v4, i + 24)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = (h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h = (h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64)) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h = (h ^ ((k * _P1) & _M64)) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (h ^ ((data[i] * _P5) & _M64)) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h = (h ^ (h >> 33)) & _M64
    h = (h * _P2) & _M64
    h = (h ^ (h >> 29)) & _M64
    h = (h * _P3) & _M64
    h = (h ^ (h >> 32)) & _M64
    return h


def to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed int64, identical to Spark SQL ``xxhash64(s)`` for strings."""
    return to_signed64(xxhash64_bytes(s.encode("utf-8"), seed))


# ---------------------------------------------------------------------------
# splitmix64 — used to expand one 64-bit key into k bloom bit positions,
# and as the counter-based generator for deterministic fixtures
# (SURVEY.md §4.3: "counter-based hashing, not RNG state").
# ---------------------------------------------------------------------------

def splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def splitmix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array (wrapping arithmetic)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x.copy()
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def xxhash64_long_np(vals: np.ndarray | int, seeds: np.ndarray | int) -> np.ndarray:
    """Vectorized XXH64 of an int64 value — bit-exact with how Spark's
    ``xxhash64`` hashes one LongType column (XXH64.hashLong): the
    8-byte tail path of standard XXH64. ``vals``/``seeds`` broadcast
    against each other, so a chained multi-column hash is
    ``xxhash64_long_np(b, xxhash64_long_np(a, 42))`` ==
    Spark ``xxhash64(a, b)`` (parity-tested in tests/test_hashing.py).
    """
    k = np.asarray(vals, dtype=np.int64).astype(np.uint64)
    seed = np.asarray(seeds, dtype=np.int64).astype(np.uint64)

    def rotl(x: np.ndarray, r: int) -> np.ndarray:
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    with np.errstate(over="ignore"):
        h = seed + np.uint64(_P5) + np.uint64(8)
        h = h ^ (rotl(k * np.uint64(_P2), 31) * np.uint64(_P1))
        h = rotl(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        h ^= h >> np.uint64(33)
        h *= np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
    return h


def bloom_positions_np(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) array of bit positions for each 64-bit key.

    pos_j = xxhash64(key, j) & (m-1) — i.e. Spark's chained two-column
    xxhash64, maskable because m is a power of two (masking a signed
    two's-complement long and an unsigned one agree). Chosen over the
    classic splitmix double-hashing so the JVM-native probe
    (operators/bloom.py probe_native) can compute identical positions
    with the ``xxhash64`` builtin — ANSI mode forbids the wrapping
    multiplies splitmix would need in Catalyst expressions.
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    h = np.asarray(hashes, dtype=np.int64)
    base = xxhash64_long_np(h, SPARK_XXHASH64_SEED)
    out = np.empty((len(h), k), dtype=np.uint64)
    mask = np.uint64(m_bits - 1)
    for j in range(k):
        out[:, j] = xxhash64_long_np(j, base) & mask
    return out
