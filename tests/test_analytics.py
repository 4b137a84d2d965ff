"""date_histogram (ES calendar/fixed interval time bucketing) — batch
twin of the streaming windowed counts; oracle: pure-pandas bucketing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.operators.analytics import date_histogram


def _events_df(spark):
    base = dt.datetime(2024, 3, 1, 10, 15)
    rows = []
    # three populated days with a GAP on 3/3 (zero-fill must cover it),
    # plus a null timestamp (must be excluded)
    for day, n in [(0, 3), (1, 1), (3, 5)]:
        for i in range(n):
            rows.append((len(rows), base + dt.timedelta(days=day, minutes=7 * i)))
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    null_row = spark.createDataFrame([(99, None)], "id long, ts timestamp")
    return df.unionByName(null_row)


def test_calendar_day_zero_fills_gaps(spark):
    got = [
        (r["bucket"], r["doc_count"])
        for r in date_histogram(
            _events_df(spark), "ts", calendar_interval="day"
        ).collect()
    ]
    d0 = dt.datetime(2024, 3, 1)
    assert got == [
        (d0, 3),
        (d0 + dt.timedelta(days=1), 1),
        (d0 + dt.timedelta(days=2), 0),  # the gap, zero-filled (ES default)
        (d0 + dt.timedelta(days=3), 5),
    ]
    # min_doc_count=1 drops the gap (and any empty bucket)
    got1 = [
        r["doc_count"]
        for r in date_histogram(
            _events_df(spark), "ts", calendar_interval="day", min_doc_count=1
        ).collect()
    ]
    assert got1 == [3, 1, 5]


def test_fixed_interval_buckets(spark):
    df = _events_df(spark).where(F.col("ts").isNotNull())
    got = date_histogram(df, "ts", fixed_interval_s=3600).collect()
    # every event sits inside its floor-hour bucket
    import collections

    want = collections.Counter(
        r["ts"].replace(minute=0, second=0, microsecond=0)
        for r in df.collect()
    )
    nonzero = {r["bucket"]: r["doc_count"] for r in got if r["doc_count"]}
    assert nonzero == dict(want)
    # spine is contiguous hours between first and last
    buckets = [r["bucket"] for r in got]
    assert all(
        (b2 - b1) == dt.timedelta(hours=1)
        for b1, b2 in zip(buckets, buckets[1:])
    )


def test_date_histogram_validation(spark):
    df = _events_df(spark)
    with pytest.raises(ValueError, match="exactly one"):
        date_histogram(df, "ts")
    with pytest.raises(ValueError, match="exactly one"):
        date_histogram(df, "ts", calendar_interval="day", fixed_interval_s=60)
    with pytest.raises(ValueError, match="calendar_interval must be"):
        date_histogram(df, "ts", calendar_interval="fortnight")
    with pytest.raises(ValueError, match="fixed_interval_s"):
        date_histogram(df, "ts", fixed_interval_s=0)
    # all-null timestamps: empty result, no error
    allnull = spark.createDataFrame([(1, None)], "id long, ts timestamp")
    assert date_histogram(allnull, "ts", calendar_interval="day").count() == 0
