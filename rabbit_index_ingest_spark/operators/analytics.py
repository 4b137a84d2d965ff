"""Time-bucket analytics (ES ``date_histogram`` analogue).

The reference's users run date histograms over their ES indices
(Kibana's default visualization); the engine owns the semantics natively
over any timestamped DataFrame — the batch twin of
``streaming/ingest.py``'s watermarked window counts.

Scale shape: ONE aggregation (groupBy on the truncated bucket) plus one
tiny bounds row and a generated bucket spine for the zero-fill — the
spine is ``sequence(min, max, interval)`` exploded from a single row and
broadcast into the left join, so gap filling never shuffles the data
side again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ES calendar_interval units supported 1:1 by Spark's date_trunc
CALENDAR_UNITS = ("minute", "hour", "day", "week", "month", "quarter", "year")


def date_histogram(
    df: DataFrame,
    ts_col: str,
    calendar_interval: str | None = None,
    fixed_interval_s: int | None = None,
    min_doc_count: int = 0,
) -> DataFrame:
    """ES ``date_histogram``: bucket rows by time and count per bucket.

    * ``calendar_interval`` — one of ``CALENDAR_UNITS`` (ES
      ``calendar_interval: day`` etc.): bucket = ``date_trunc(unit, ts)``.
    * ``fixed_interval_s`` — ES ``fixed_interval`` in seconds: bucket =
      ``floor(epoch / n) * n`` as a timestamp.
    * ``min_doc_count=0`` (the ES default): empty buckets BETWEEN the
      first and last populated bucket are returned zero-filled — the
      spine comes from ``sequence(min_bucket, max_bucket, interval)``;
      raise it to 1 to drop gaps (ES parity).
    * Null timestamps are excluded (ES: missing field).

    Returns ``(bucket timestamp, doc_count long)`` ordered by bucket.
    """
    if (calendar_interval is None) == (fixed_interval_s is None):
        raise ValueError(
            "exactly one of calendar_interval / fixed_interval_s required"
        )
    if calendar_interval is not None:
        if calendar_interval not in CALENDAR_UNITS:
            raise ValueError(
                f"calendar_interval must be one of {CALENDAR_UNITS}, "
                f"got {calendar_interval!r}"
            )
        bucket = F.date_trunc(calendar_interval, F.col(ts_col))
        step = F.expr(f"INTERVAL 1 {calendar_interval}")
    else:
        n = int(fixed_interval_s)
        if n <= 0:
            raise ValueError(f"fixed_interval_s must be > 0, got {n}")
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(ts_col)) / n) * n
        )
        step = F.expr(f"INTERVAL {n} SECONDS")
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("doc_count"))
    )
    if min_doc_count >= 1:
        return counts.where(F.col("doc_count") >= min_doc_count).orderBy(
            "bucket"
        )
    spine = (
        counts.agg(
            F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
        )
        .where(F.col("_lo").isNotNull())
        .select(
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(
                "bucket"
            )
        )
    )
    return (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
        .orderBy("bucket")
    )
