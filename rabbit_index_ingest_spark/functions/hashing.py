"""Driver-side twin of Spark's ``xxhash64`` (XXH64, seed=42).

Spark partitions the dictionary/postings tables by
``pmod(xxhash64(term), N_TERM_BUCKETS)``. At query time the planner needs
the buckets of a handful of query terms — computing them with a Spark job
would cost a full scheduler round-trip per query, so this module evaluates
the same public XXH64 algorithm (seed 42, the constant Spark uses for the
``xxhash64`` SQL function) in pure Python. Parity with the JVM expression
is asserted in tests/test_hashing.py over random strings.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK64


def xxhash64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of ``data`` → signed 64-bit int (matching Spark's LongType)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * P1) + P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = ((_rotl(h, 23) * P2) + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """Python twin of build.term_bucket_expr: pmod(xxhash64(term), N)."""
    return xxhash64(term.encode("utf-8")) % n_buckets


def xxhash64_long(value: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Twin of Spark's ``xxhash64`` over one LongType column (8-byte LE)."""
    return xxhash64(int(value).to_bytes(8, "little", signed=True), seed)


def xxhash64_int(value: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Twin of Spark's ``xxhash64`` over one IntegerType column (4-byte LE)."""
    return xxhash64(int(value).to_bytes(4, "little", signed=True), seed)


def xxhash64_long_with_int_salt(key: int, salt: int) -> int:
    """Twin of ``F.xxhash64(F.col(long_key), F.lit(int_salt))``: Spark folds
    multi-column xxhash64 left-to-right, each column hashed with the running
    value as seed (empirically verified against the JVM expression in
    tests/test_hashing.py)."""
    return xxhash64_int(salt, xxhash64_long(key))
