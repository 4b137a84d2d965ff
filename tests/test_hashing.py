"""Python xxhash64 twin must agree bit-for-bit with Spark's JVM expression."""

from pyspark.sql import functions as F

from rabbit_index_ingest_spark.functions.hashing import term_bucket, xxhash64
from rabbit_index_ingest_spark.index.build import N_TERM_BUCKETS, term_bucket_expr


def test_xxhash64_matches_spark(spark):
    import random

    rng = random.Random(42)
    strings = [
        "", "a", "ab", "abc", "abcd", "abcde", "12345678", "123456789",
        "the quick brown fox jumps over the lazy dog — and then some more",
        "café 東京 😀", "x" * 31, "y" * 32, "z" * 33, "w" * 100,
    ] + ["".join(rng.choices("abcdefghij0123456789", k=rng.randint(0, 80))) for _ in range(60)]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i int, s string")
    got = {
        r["i"]: (r["h"], r["b"])
        for r in df.select(
            "i",
            F.xxhash64("s").alias("h"),
            term_bucket_expr(F.col("s")).alias("b"),
        ).collect()
    }
    for i, s in enumerate(strings):
        assert got[i][0] == xxhash64(s.encode("utf-8")), repr(s)
        assert got[i][1] == term_bucket(s, N_TERM_BUCKETS), repr(s)


def test_long_and_chained_xxhash64_parity(spark):
    """The long-column and (long, int-literal) chained twins — used by the
    k-means trainer's deterministic sampling/init (train_centroids_local)
    — must match the JVM expression over edge-case and random longs."""
    import random

    from rabbit_index_ingest_spark.functions.hashing import (
        xxhash64_long,
        xxhash64_long_with_int_salt,
    )

    rng = random.Random(7)
    vals = [0, 1, -1, 42, -42, 2**31, -(2**31), 2**63 - 1, -(2**63)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(50)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: (r["h"], r["hc"])
        for r in df.select(
            "v",
            F.xxhash64("v").alias("h"),
            F.xxhash64("v", F.lit(42)).alias("hc"),
        ).collect()
    }
    for v in vals:
        assert got[v][0] == xxhash64_long(v), v
        assert got[v][1] == xxhash64_long_with_int_salt(v, 42), v
