"""Spark-compatible Murmur3 hashing, driver-side.

Reimplements Spark's ``hash()`` (Murmur3_x86_32, seed 42) for strings
so the query path can compute a term's parquet bucket without running
a Spark job per query. Matches org.apache.spark.unsafe.hash
.Murmur3_x86_32.hashUnsafeBytes semantics, including Spark's
nonstandard tail handling (each trailing byte is sign-extended and
mixed as a full word). Verified against F.hash in tests.
"""

from __future__ import annotations

_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _M


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Signed 32-bit Murmur3 exactly as Spark's hash() computes it."""
    h1 = seed & _M
    n = len(data)
    i = 0
    while i + 4 <= n:
        word = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
        i += 4
    while i < n:
        b = data[i]
        if b >= 0x80:  # Java bytes are signed; sign-extend
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _M))
        i += 1
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — identical to the build's bucket col."""
    h = murmur3_32(term.encode("utf-8"))
    return ((h % n_buckets) + n_buckets) % n_buckets
