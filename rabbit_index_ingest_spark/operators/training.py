"""Training-data pipeline operators: deterministic sampling, corpus
n-gram statistics, and sequence packing (context-window binning).

These are the ops a 100 TB pretraining pipeline runs between dedup and
tokenization (beyond the reference's scope — the reference,
rabbit_indexer/, stops at index ingest):

* ``stratified_sample`` — reproducible per-stratum downsampling with NO
  shuffle and NO RNG state: membership is a pure hash predicate on the
  row key, so the same row is kept in every rerun, on every engine, at
  any partitioning (the property ``df.sample`` does NOT have — its
  output depends on partition layout).
* ``ngram_counts`` — corpus n-gram frequencies (LM data analysis /
  contamination screens): one JVM tokenize + one explode + ONE
  map-side-combined groupBy.
* ``pack_sequences`` — assign docs to fixed-token-budget bins in a
  deterministic global order (sequence packing for context windows).
  The global running sum is the classic DISTRIBUTED prefix-sum: range
  partition → per-partition totals (tiny) → broadcast offsets →
  partition-local cumulative sums. No single-partition window anywhere,
  so the op scales to any corpus the shuffle can range-partition.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import tokens_expr

# at most one live pack_sequences cache per driver thread (see
# pack_sequences; the pattern is dedup._GROUPS_CACHE's)
_PACK_CACHE = threading.local()

# sampling hashes the first 8 md5 hex chars — 16^8 buckets; md5 is the
# one keyed hash Spark and DuckDB both evaluate identically, and the
# LEXICOGRAPHIC compare of the hex prefix against a rate threshold is
# engine-neutral (no integer conversion needed)
_HEX_SPACE = 16 ** 8


def _rate_threshold(rate: float) -> str:
    """Rate ∈ [0, 1] → 8-hex-char threshold: keep iff hash_prefix < thr
    (lexicographic compare; Spark and DuckDB both emit lowercase hex)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g" * 8  # 'g' > 'f': every hash qualifies
    return format(int(rate * _HEX_SPACE), "08x")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 42,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``substr(md5(key || '-' || salt), 1, 8) < threshold(stratum rate)``.

    ``rates`` maps stratum value → keep-rate; rows in unlisted strata
    (or with a NULL stratum) use ``default_rate``. Rows with a NULL
    ``key_col`` are DROPPED (contract, round-6 ADVICE: concat_ws skips
    NULLs, so all NULL-key rows would otherwise hash identically and be
    kept/dropped as one block, diverging from the SQL twin whose
    ``key || '-salt'`` is NULL and never below the threshold). The
    predicate is a pure column expression — Catalyst pushes it into the
    scan, nothing shuffles, and membership is independent of
    partitioning and rerun (unlike ``DataFrame.sample``/``sampleBy``,
    whose output moves with the partition layout). The effective rate
    converges to the nominal one at 1/16^8 granularity (md5 is uniform
    on the 8-hex prefix)."""
    thr_expr = F.lit(_rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr_expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_rate_threshold(rate))
        ).otherwise(thr_expr)
    h = F.substring(
        F.md5(F.concat_ws("-", F.col(key_col).cast("string"),
                          F.lit(str(salt)))), 1, 8
    )
    return df.where(F.col(key_col).isNotNull() & (h < thr_expr))


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
    analyzer: str = "simple",
) -> DataFrame:
    """Top-``k`` corpus ``n``-grams by occurrence count (count desc,
    ngram asc — a total order). One JVM tokenize (whole-stage codegen),
    one explode, ONE map-side-combined groupBy; bucket selection is a
    TakeOrdered over the aggregated frame — the same one-wide-shuffle
    shape as the inverted-index build's dictionary rollup."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokens_expr(text_col, analyzer)
    # guard short docs: Spark's sequence(1, stop) DESCENDS when stop < 1
    # (emitting slice start 0), so a doc with fewer than n tokens must
    # yield an empty gram array, which explode then drops
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("ngram"))
        .limit(k)
    )


def pack_sequences(
    spark: SparkSession,
    df: DataFrame,
    key_col: str,
    len_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Sequence packing: assign each doc to a context-window bin under a
    token ``budget``, in deterministic ``key_col`` order — the
    concatenate-then-chunk model: a doc goes to the bin where its FIRST
    token lands, ``bin = floor(running_offset / budget)`` with
    ``running_offset`` the sum of all PRIOR docs' lengths in key order.
    Returns ``(key, <len>, bin)``.

    Scale shape — the distributed prefix sum, never a global-order
    window (which Spark executes on ONE task): range-repartition by key
    (the only shuffle), per-partition length totals (one tiny agg),
    driver-side exclusive prefix over the ≤ thousands of partition
    totals, broadcast the offsets back, and a partition-LOCAL window
    computes each doc's global running offset."""
    from pyspark.sql.window import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(len_col).cast("long").alias("len"),
    ).where(F.col("len").isNotNull())  # round-6 ADVICE: a NULL length
    # would poison the per-partition total (sum → NULL → TypeError) while
    # silently contributing 0 to every later doc's offset — drop up front
    if partitions is not None:
        base = base.repartitionByRange(partitions, "key")
    else:
        base = base.repartitionByRange("key")
    part = base.withColumn("_pid", F.spark_partition_id())
    # the persist is LOAD-BEARING: the range partitioner samples, so an
    # evicted+recomputed frame could land rows in different partitions
    # between the totals job and the output join. Cache hygiene follows
    # dedup._GROUPS_CACHE: at most ONE live pack cache per driver thread
    # — entering a new call unpersists the same thread's previous frame
    # (round-6 ADVICE: repeated calls leaked executor cache forever).
    mine = getattr(_PACK_CACHE, "frames", None)
    if mine is None:
        mine = _PACK_CACHE.frames = []
    while mine:
        mine.pop().unpersist()
    part = part.persist()
    mine.append(part)
    totals = (
        part.groupBy("_pid").agg(F.sum("len").alias("_tot")).collect()
    )
    offs, acc = {}, 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += int(r["_tot"] or 0)
    off_df = F.broadcast(
        spark.createDataFrame(
            [(p, o) for p, o in offs.items()] or [(0, 0)],
            "_pid int, _off long",
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prior = F.coalesce(F.sum("len").over(w), F.lit(0))
    out = (
        part.join(off_df, "_pid", "left")
        .select(
            F.col("key").alias(key_col),
            "len",
            F.floor(
                (F.coalesce(F.col("_off"), F.lit(0)) + local_prior)
                / F.lit(int(budget))
            ).cast("long").alias("bin"),
        )
    )
    return out
