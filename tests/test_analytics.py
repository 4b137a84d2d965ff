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


def test_calendar_quarter(spark):
    """quarter: Spark has no INTERVAL quarter unit — the spine must step
    by 3 months and stay on quarter starts (round-4 advice item)."""
    rows = [
        (0, dt.datetime(2024, 1, 15)),
        (1, dt.datetime(2024, 2, 1)),
        # Q2 2024 empty — zero-filled
        (2, dt.datetime(2024, 8, 30)),
        (3, dt.datetime(2025, 1, 2)),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = [
        (r["bucket"], r["doc_count"])
        for r in date_histogram(df, "ts", calendar_interval="quarter").collect()
    ]
    assert got == [
        (dt.datetime(2024, 1, 1), 2),
        (dt.datetime(2024, 4, 1), 0),
        (dt.datetime(2024, 7, 1), 1),
        (dt.datetime(2024, 10, 1), 0),
        (dt.datetime(2025, 1, 1), 1),
    ]


def test_time_zone_buckets(spark):
    """ES time_zone: day boundaries fall on the named zone's local
    midnight; keys return as UTC instants of those local midnights."""
    rows = [
        # 02:00 UTC = 21:00 previous day in America/New_York (EST, UTC-5)
        (0, dt.datetime(2024, 1, 2, 2, 0)),
        (1, dt.datetime(2024, 1, 2, 12, 0)),  # same UTC day, NY same day
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = [
        (r["bucket"], r["doc_count"])
        for r in date_histogram(
            df, "ts", calendar_interval="day", time_zone="America/New_York"
        ).collect()
    ]
    # NY local days: Jan 1 (the 02:00 UTC event) and Jan 2; keys are the
    # local midnights expressed in UTC (+5h in January)
    assert got == [
        (dt.datetime(2024, 1, 1, 5, 0), 1),
        (dt.datetime(2024, 1, 2, 5, 0), 1),
    ]
    # UTC default: both land on Jan 2
    got_utc = [
        (r["bucket"], r["doc_count"])
        for r in date_histogram(df, "ts", calendar_interval="day").collect()
    ]
    assert got_utc == [(dt.datetime(2024, 1, 2), 2)]


def test_date_histogram_agg_composes_with_query(spark):
    """Searcher.date_histogram_agg buckets ONLY the query's match set
    (shared _matched_docs base with the other aggregations)."""
    import pandas as pd

    from rabbit_index_ingest_spark.index.build import build_index
    from rabbit_index_ingest_spark.index.query import Searcher

    texts = ["alpha beta", "alpha", "gamma delta", "alpha gamma"]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"{i:04d}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "text": texts,
        }
    )
    built = build_index(spark, spark.createDataFrame(pdf))
    s = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl
    )
    base = dt.datetime(2024, 3, 1)
    attrs = spark.createDataFrame(
        [(i, base + dt.timedelta(days=i)) for i in range(len(texts))],
        "doc_id long, ts timestamp",
    )
    got = [
        (r["bucket"], r["doc_count"])
        for r in s.date_histogram_agg(
            "alpha", attrs, "ts", calendar_interval="day"
        ).collect()
    ]
    # docs 0, 1, 3 match "alpha"; day 3/2 (doc 2) zero-fills
    assert got == [
        (base, 1),
        (base + dt.timedelta(days=1), 1),
        (base + dt.timedelta(days=2), 0),
        (base + dt.timedelta(days=3), 1),
    ]
    # absent term: empty frame with the contract schema
    empty = s.date_histogram_agg(
        "nosuchterm", attrs, "ts", calendar_interval="day"
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["bucket", "doc_count"]
    built.release()


def test_sessionize_gap_semantics(spark):
    """Hand-built timeline: gaps <= gap_s chain, longer gaps split; the
    boundary is EXCLUSIVE-above (diff == gap_s stays in-session); ties
    share a session; nulls drop; per-user independence."""
    from rabbit_index_ingest_spark.operators.analytics import (
        session_summary,
        sessionize,
    )

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # user 1: [0s, 60s, 120s] | gap 3601 | [3721s, 3721s tie]
        (1, 0, t0),
        (1, 1, t0 + dt.timedelta(seconds=60)),
        (1, 2, t0 + dt.timedelta(seconds=120)),
        (1, 3, t0 + dt.timedelta(seconds=120 + 3601)),
        (1, 4, t0 + dt.timedelta(seconds=120 + 3601)),  # tie
        # exactly gap_s later: same session (boundary is > gap_s)
        (1, 5, t0 + dt.timedelta(seconds=120 + 3601 + 3600)),
        # user 2: one event; plus a null-ts event that must vanish
        (2, 6, t0),
        (2, 7, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap_s=3600, tiebreak_col="event_id").collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 1}
    summ = session_summary(df, gap_s=3600, tiebreak_col="event_id").collect()
    assert [
        (r["user_id"], r["session_idx"], r["n_events"]) for r in summ
    ] == [(1, 1, 3), (1, 2, 3), (2, 1, 1)]
    with pytest.raises(ValueError, match="gap_s"):
        sessionize(df, gap_s=0)
