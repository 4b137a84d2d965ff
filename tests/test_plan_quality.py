"""Physical-plan assertions (SURVEY.md §4): the optimizations we claim must
be visible in `.explain` — partition pruning on the term bucket, column
pruning on the dictionary rollup, broadcast dimension joins, and a
single-shuffle postings build."""

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.datagen import transcripts_df
from rabbit_index_ingest_spark.index.build import build_index, dictionary_from_blocks
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.index.store import IndexStore


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "store")
    t = transcripts_df(spark, n_conv=30)
    IndexStore(spark, root).save(build_index(spark, t), segment=0)
    return IndexStore(spark, root).load()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_query_scan_is_bucket_partition_pruned(spark, stored):
    """The block-max query must only scan the storage partitions
    (bucket=NN) of the query terms — at 100 TB this is the difference
    between touching 1/64th of the postings and all of them."""
    s = Searcher(spark, stored.postings, stored.dictionary, stored.n_docs, stored.avgdl)
    plan = _plan(s.topk_blockmax("karo", 10))
    # partition filter on the parquet scan, not a post-scan filter
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters") :][:500]
    assert "bucket" in seg, seg


def test_dictionary_rollup_prunes_byte_columns(spark, stored):
    """dictionary_from_blocks must read ONLY metadata columns — the
    compressed doc/tf/dl byte columns (the bulk of the index) must not
    appear in the scan's ReadSchema."""
    plan = _plan(dictionary_from_blocks(stored.postings))
    read_schema = plan[plan.index("ReadSchema") :][:400]
    assert "doc_bytes" not in read_schema, read_schema
    assert "tf_bytes" not in read_schema, read_schema
    assert "dl_bytes" not in read_schema, read_schema
    assert "tf_sum" in read_schema


def test_idf_join_is_broadcast(spark, stored):
    """The DataFrame scorer joins postings to the (tiny) per-term idf
    table — must be a broadcast hash join, never a shuffle of postings."""
    s = Searcher(spark, stored.postings, stored.dictionary, stored.n_docs, stored.avgdl)
    plan = _plan(s.topk_dataframe("karo tenro", 10))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_build_has_single_wide_shuffle(spark):
    """The postings pipeline contains exactly ONE data-bearing exchange
    (the term/range repartition) besides the doc-id range partitioning —
    the tf groupBy stage was folded into the pack (run-length)."""
    t = transcripts_df(spark, n_conv=10)
    built = build_index(spark, t, persist_postings=False)
    plan = _plan(built.postings)
    # exactly one hash exchange (term/range repartition) and one range
    # exchange (doc-id assignment; its text appears twice because the
    # cached InMemoryRelation embeds its own build plan in the dump)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "hashpartitioning(term" in plan
    # and no aggregate operator in the postings path at all — tf counting
    # happens inside the pack stage (run-length), not a groupBy
    assert "HashAggregate" not in plan


def test_topk_is_take_ordered(spark, stored):
    """Global top-k must compile to TakeOrderedAndProject — a k-row merge,
    not a full sort."""
    s = Searcher(spark, stored.postings, stored.dictionary, stored.n_docs, stored.avgdl)
    plan = _plan(s.topk_blockmax("karo", 10))
    assert "TakeOrderedAndProject" in plan


def test_prefix_filter_pushed_to_scan(spark, tmp_path):
    """A5 prefix filter must reach the parquet scan as a pushed filter."""
    from rabbit_index_ingest_spark.operators.filters import (
        DENY_ALL_ALLOW_LISTED,
        apply_path_filter,
    )

    p = str(tmp_path / "paths")
    spark.createDataFrame(
        [("/a/b/c",), ("/x/y",)], "path string"
    ).write.parquet(p)
    df = apply_path_filter(spark.read.parquet(p), "path", ["/a/b"], DENY_ALL_ALLOW_LISTED)
    plan = _plan(df)
    pushed = plan[plan.index("PushedFilters") :][:300]
    assert "StringStartsWith" in pushed or "EqualTo" in pushed, pushed


def test_upsert_superseded_join_not_forced_broadcast(spark):
    """B7 at scale: the superseded-keys semi-join must NOT force-broadcast
    the new batch's keys — a bulk re-ingestion carries 10^8+ keys and a
    forced broadcast is a driver OOM. Small batches still broadcast via
    AQE; a large batch must degrade to a shuffled join (round-2 verdict
    item 2)."""
    from rabbit_index_ingest_spark.index.store import superseded_doc_ids

    doc_stats = spark.range(0, 3_000_000).select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        (F.col("id") % 5).cast("int").alias("turn_idx"),
        F.col("id").alias("doc_id"),
    )
    big_keys = spark.range(0, 3_000_000).select(
        F.concat(F.lit("c"), F.col("id")).alias("k1"),
        (F.col("id") % 5).cast("int").alias("k2"),
    )
    joined = superseded_doc_ids(doc_stats, big_keys)
    joined.count()  # materialize so AQE finalizes the plan
    plan = _plan(joined)
    assert "BroadcastHashJoin" not in plan, plan

    # and a tiny batch still broadcasts (AQE runtime decision, no hint)
    small_keys = spark.range(0, 100).select(
        F.concat(F.lit("c"), F.col("id")).alias("k1"),
        (F.col("id") % 5).cast("int").alias("k2"),
    )
    small = superseded_doc_ids(doc_stats, small_keys)
    small.count()
    assert "BroadcastHashJoin" in _plan(small)
