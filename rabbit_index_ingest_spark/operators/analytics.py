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
    time_zone: str | None = None,
) -> DataFrame:
    """ES ``date_histogram``: bucket rows by time and count per bucket.

    * ``calendar_interval`` — one of ``CALENDAR_UNITS`` (ES
      ``calendar_interval: day`` etc.): bucket = ``date_trunc(unit, ts)``.
      ``quarter`` truncates to quarter starts and steps the zero-fill
      spine by 3 months (Spark intervals have no quarter unit;
      ``date_trunc('quarter')`` buckets are month-aligned so the spine
      stays on quarter starts).
    * ``fixed_interval_s`` — ES ``fixed_interval`` in seconds: bucket =
      ``floor(epoch / n) * n`` as a timestamp.
    * ``min_doc_count=0`` (the ES default): empty buckets BETWEEN the
      first and last populated bucket are returned zero-filled — the
      spine comes from ``sequence(min_bucket, max_bucket, interval)``;
      raise it to 1 to drop gaps (ES parity).
    * ``time_zone`` (ES ``time_zone``, calendar intervals only): bucket
      boundaries fall on the named zone's local calendar — timestamps
      convert to zone wall-clock, truncate, spine-step (calendar
      arithmetic on wall-clock, so DST transitions keep day/month
      boundaries correct), and the returned bucket keys convert back to
      UTC instants (what ES returns as epoch keys). A wall-clock bucket
      made ambiguous/nonexistent by a DST jump resolves the way Spark's
      ``to_utc_timestamp`` does (deterministic). Fixed intervals stay
      epoch-aligned (documented deviation: ES shifts those too).
    * Null timestamps are excluded (ES: missing field).

    Returns ``(bucket timestamp, doc_count long)`` ordered by bucket.
    """
    if (calendar_interval is None) == (fixed_interval_s is None):
        raise ValueError(
            "exactly one of calendar_interval / fixed_interval_s required"
        )
    ts = F.col(ts_col)
    to_local = bool(time_zone) and calendar_interval is not None
    if to_local:
        ts = F.from_utc_timestamp(ts, time_zone)
    if calendar_interval is not None:
        if calendar_interval not in CALENDAR_UNITS:
            raise ValueError(
                f"calendar_interval must be one of {CALENDAR_UNITS}, "
                f"got {calendar_interval!r}"
            )
        bucket = F.date_trunc(calendar_interval, ts)
        step = F.expr(
            "INTERVAL 3 MONTH"
            if calendar_interval == "quarter"
            else f"INTERVAL 1 {calendar_interval}"
        )
    else:
        n = int(fixed_interval_s)
        if n <= 0:
            raise ValueError(f"fixed_interval_s must be > 0, got {n}")
        bucket = F.timestamp_seconds(
            F.floor(F.unix_timestamp(ts) / n) * n
        )
        step = F.expr(f"INTERVAL {n} SECONDS")
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("doc_count"))
    )

    def _finish(res: DataFrame) -> DataFrame:
        if to_local:  # back to UTC instants only at the very end
            res = res.select(
                F.to_utc_timestamp("bucket", time_zone).alias("bucket"),
                "doc_count",
            )
        return res.orderBy("bucket")

    if min_doc_count >= 1:
        return _finish(counts.where(F.col("doc_count") >= min_doc_count))
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
    return _finish(
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization (the training-data / clickstream staple;
    the batch twin of a Structured-Streaming session window): events of
    one user belong to the same session while consecutive gaps are
    ≤ ``gap_s`` seconds; a longer gap starts a new session. Adds
    ``session_idx`` (1-based per user, in time order).

    Scale shape: ONE shuffle — ``Window.partitionBy(user)`` — then two
    window functions (lag diff → new-session flag, running sum → session
    index); no self-joins, no iteration, and a user's events are exactly
    one partition's worth of state. Determinism: equal-timestamp events
    always share a session (their gap is 0), so the output is
    tie-order-free even though lag's order among ties isn't;
    ``tiebreak_col`` (e.g. an event id) makes the window order total for
    plan-stability purists. Null timestamps are dropped (no time, no
    session)."""
    from pyspark.sql import Window

    if gap_s <= 0:
        raise ValueError(f"gap_s must be > 0, got {gap_s}")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    # exact integer-microsecond gap arithmetic (unix_micros; NTZ inputs
    # cast through TIMESTAMP under the pinned-UTC session) — float
    # epoch-seconds would round and could disagree with the integer
    # oracle exactly at the gap boundary; unix_timestamp would TRUNCATE
    # to whole seconds, worse
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    new_session = F.when(
        prev.isNull()
        | (us(F.col(ts_col)) - us(prev) > F.lit(int(gap_s) * 1_000_000)),
        1,
    ).otherwise(0)
    return (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("session_idx", F.sum(new_session).over(w).cast("long"))
    )


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One row per (user, session): event count + start/end timestamps —
    ``sessionize`` plus ONE aggregation (same single shuffle key, so AQE
    keeps it co-partitioned)."""
    s = sessionize(df, user_col, ts_col, gap_s, tiebreak_col)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .orderBy(user_col, "session_idx")
    )
