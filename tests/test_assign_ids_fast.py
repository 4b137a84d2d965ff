"""Focused tests for the presorted-input doc-id fast path (r7 build
optimization): when the input is partition-wise ordered by key, doc ids
are assigned from a shuffle-free probe; anything else must fall back to
the range shuffle — and BOTH paths must yield the same dense ids in
(k1, k2) order."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.datagen import transcripts_df
from rabbit_index_ingest_spark.index.build import (
    _presorted_partition_offsets,
    assign_doc_ids_with_count,
)


def _expected_ids(df, id_base=0):
    rows = df.select("conv_id", "turn_idx").collect()
    keys = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    return {k: id_base + i for i, k in enumerate(keys)}


def _got_ids(numbered):
    return {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in numbered.select("doc_id", "conv_id", "turn_idx").collect()
    }


def test_fast_path_fires_on_presorted_parquet(spark, tmp_path):
    path = str(tmp_path / "sorted_corpus")
    transcripts_df(spark, n_conv=40, partitions=4).write.parquet(path)
    df = spark.read.parquet(path).select("conv_id", "turn_idx", "text")
    probe = _presorted_partition_offsets(df, ("conv_id", "turn_idx"))
    assert probe is not None, "presorted parquet corpus must take the fast path"
    offsets, n_rows = probe
    assert n_rows == df.count()
    numbered, n, cache = assign_doc_ids_with_count(df)
    assert n == n_rows and cache is None
    assert _got_ids(numbered) == _expected_ids(df)


def test_fast_path_respects_id_base(spark, tmp_path):
    path = str(tmp_path / "sorted_corpus_base")
    transcripts_df(spark, n_conv=10, partitions=2).write.parquet(path)
    df = spark.read.parquet(path).select("conv_id", "turn_idx", "text")
    numbered, n, _ = assign_doc_ids_with_count(df, id_base=1000)
    assert _got_ids(numbered) == _expected_ids(df, id_base=1000)


def test_fallback_on_local_relation(spark):
    """createDataFrame sources (LocalRelation) MUST fall back: Catalyst
    folds spark_partition_id() driver-side there (every partition reports
    pid 0 — the bug this test pins), so ids would collide."""
    pdf = transcripts_pandas_sorted(60)
    df = spark.createDataFrame(pdf)
    assert _presorted_partition_offsets(df, ("conv_id", "turn_idx")) is None
    numbered, n, cache = assign_doc_ids_with_count(df)
    assert _got_ids(numbered) == _expected_ids(df)
    if cache is not None:
        cache.unpersist()


def transcripts_pandas_sorted(n_conv):
    from rabbit_index_ingest_spark.datagen import transcripts_pandas

    pdf = transcripts_pandas(n_conv=n_conv)[["conv_id", "turn_idx", "text"]]
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_fallback_on_shuffled_plan(spark):
    df = transcripts_df(spark, n_conv=20).select(
        "conv_id", "turn_idx", "text"
    ).repartition(4)  # Exchange in the plan → gate must refuse
    assert _presorted_partition_offsets(df, ("conv_id", "turn_idx")) is None
    numbered, n, cache = assign_doc_ids_with_count(df)
    assert cache is not None
    assert _got_ids(numbered) == _expected_ids(df)
    cache.unpersist()


def test_fallback_on_unsorted_partitions(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c2", "c1", "c3", "c0"],
            "turn_idx": [0, 0, 0, 0],
            "text": ["a", "b", "c", "d"],
        }
    )
    path = str(tmp_path / "unsorted")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert _presorted_partition_offsets(df, ("conv_id", "turn_idx")) is None
    numbered, n, cache = assign_doc_ids_with_count(df)
    assert _got_ids(numbered) == _expected_ids(df)
    if cache is not None:
        cache.unpersist()


def test_fallback_on_overlapping_partition_ranges(spark, tmp_path):
    # two sorted files with interleaving key ranges → disjointness check
    # must refuse (relative order of the two partitions is ambiguous)
    p1 = pd.DataFrame(
        {"conv_id": ["a", "c"], "turn_idx": [0, 0], "text": ["x", "y"]}
    )
    p2 = pd.DataFrame(
        {"conv_id": ["b", "d"], "turn_idx": [0, 0], "text": ["x", "y"]}
    )
    path = str(tmp_path / "overlap")
    spark.createDataFrame(p1).coalesce(1).write.parquet(path)
    spark.createDataFrame(p2).coalesce(1).write.mode("append").parquet(path)
    df = spark.read.parquet(path)
    if df.rdd.getNumPartitions() < 2:
        pytest.skip("files merged into one scan partition")
    assert _presorted_partition_offsets(df, ("conv_id", "turn_idx")) is None
    numbered, n, cache = assign_doc_ids_with_count(df)
    assert _got_ids(numbered) == _expected_ids(df)
    if cache is not None:
        cache.unpersist()


def test_fast_path_build_index_matches_oracle_tiebreak(spark, tmp_path):
    """build_index over a presorted parquet corpus must keep the doc_id ↔
    (conv_id, turn_idx) isomorphism the tie-break contract relies on."""
    from rabbit_index_ingest_spark.index.build import build_index

    path = str(tmp_path / "sorted_for_build")
    transcripts_df(spark, n_conv=30, partitions=3).write.parquet(path)
    df = spark.read.parquet(path)
    built = build_index(spark, df)
    rows = built.doc_stats.select("doc_id", "conv_id", "turn_idx").collect()
    by_id = sorted((r["doc_id"], (r["conv_id"], r["turn_idx"])) for r in rows)
    assert [k for _, k in by_id] == sorted(k for _, k in by_id)
    assert [i for i, _ in by_id] == list(range(len(by_id)))
    built.release()
