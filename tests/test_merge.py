"""Tiered segment merge (SURVEY B3 — the Lucene/ES merge-policy analogue
between per-upsert segments and compact()'s force-merge-to-one).

Invariants tested:
* a merge never changes the LIVE doc set — (doc_id, conv_id, turn_idx,
  text) rows are identical before/after (ids preserved end-to-end);
* both query paths agree post-merge;
* merging ALL segments purges every delete, so scores become exactly a
  fresh build over the live corpus (the strongest available oracle);
* the id-space high-water mark survives merging the newest segment, so a
  later upsert can't collide ids;
* maybe_merge folds the smallest segments down to the budget.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.datagen import transcripts_df
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.index.store import IndexStore

QUERIES = ["zephyr quantum lattice", "karo", "zephyr tenro"]


def _mk_store(spark, tmp_path, n_conv=30) -> tuple[IndexStore, object]:
    t = transcripts_df(spark, n_conv=n_conv)
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.save(build_index(spark, t), segment=0)
    # two upsert generations touching overlapping key ranges
    b1 = t.where(F.col("turn_idx") == 0).select(
        "conv_id", "turn_idx", F.concat(F.lit("karo v1 "), "text").alias("text")
    )
    store.upsert(b1)
    b2 = t.where((F.col("turn_idx") == 0) & F.col("conv_id").endswith("1")).select(
        "conv_id", "turn_idx", F.concat(F.lit("karo v2 "), "text").alias("text")
    )
    store.upsert(b2)
    return store, t


def _live_docs(store: IndexStore):
    L = store.load()
    docs = L.docs
    if L.deleted_df is not None:
        docs = docs.join(L.deleted_df.select("doc_id"), "doc_id", "left_anti")
    return sorted(
        (r["doc_id"], r["conv_id"], r["turn_idx"], r["text"])
        for r in docs.collect()
    )


def _searcher(spark, store: IndexStore) -> Searcher:
    L = store.load()
    return Searcher(
        spark, L.postings, L.dictionary, L.n_docs, L.avgdl, deleted_df=L.deleted_df
    )


def _topk(spark, store, q, fast=True, k=10):
    s = _searcher(spark, store)
    fn = s.topk_blockmax if fast else s.topk_dataframe
    rows = fn(q, k).join(
        store.load().doc_stats.select("doc_id", "conv_id", "turn_idx"), "doc_id"
    ).collect()
    return sorted(
        ((r["conv_id"], r["turn_idx"]), round(r["score"], 9)) for r in rows
    )


def test_merge_preserves_live_docs_and_query_agreement(spark, tmp_path):
    store, _ = _mk_store(spark, tmp_path)
    assert store.segments() == [0, 1, 2]
    live_before = _live_docs(store)

    new_seg = store.merge_segments([0, 1])
    assert new_seg == 3
    assert store.segments() == [2, 3]
    assert _live_docs(store) == live_before  # ids + content untouched

    for q in QUERIES:
        fast = _topk(spark, store, q, fast=True)
        ref = _topk(spark, store, q, fast=False)
        assert fast == ref, q


def test_merge_all_equals_fresh_build_over_live_corpus(spark, tmp_path):
    store, _ = _mk_store(spark, tmp_path)
    live = _live_docs(store)
    store.merge_segments(store.segments())
    assert len(store.segments()) == 1
    L = store.load()
    assert L.deleted_df is None  # merge purged every tombstone
    assert L.n_docs == len(live)

    # oracle: fresh dense-id build over the live corpus — scores must be
    # bit-comparable (same stats, same analyzer, same float64 discipline)
    fresh = build_index(
        spark,
        spark.createDataFrame(
            [(c, t, x) for _, c, t, x in live],
            "conv_id string, turn_idx int, text string",
        ),
    )
    s_fresh = Searcher(spark, fresh.postings, fresh.dictionary, fresh.n_docs, fresh.avgdl)
    for q in QUERIES:
        got = _topk(spark, store, q)
        want = sorted(
            ((r["conv_id"], r["turn_idx"]), round(r["score"], 9))
            for r in s_fresh.topk_blockmax(q, 10)
            .join(fresh.doc_stats.select("doc_id", "conv_id", "turn_idx"), "doc_id")
            .collect()
        )
        assert got == want, q
    fresh.release()


def test_merge_keeps_id_high_water_mark(spark, tmp_path):
    store, t = _mk_store(spark, tmp_path)
    hwm = store.load().next_doc_id
    # merge away the NEWEST segment too — the mark must survive in the
    # merged segment's stats row
    store.merge_segments(store.segments())
    assert store.load().next_doc_id == hwm
    # a further upsert allocates above the mark — no id collision
    b3 = t.where((F.col("turn_idx") == 1) & F.col("conv_id").endswith("2")).select(
        "conv_id", "turn_idx", F.concat(F.lit("karo v3 "), "text").alias("text")
    )
    store.upsert(b3)
    ids = store.load().docs.groupBy("doc_id").count().where("count > 1").count()
    assert ids == 0


def test_maybe_merge_policy(spark, tmp_path):
    store, t = _mk_store(spark, tmp_path)  # 3 segments
    assert store.maybe_merge(max_segments=3) == -1  # within budget: no-op
    assert store.segments() == [0, 1, 2]
    live_before = _live_docs(store)
    new_seg = store.maybe_merge(max_segments=2)
    assert new_seg == 3
    assert len(store.segments()) == 2
    # the BIG original segment 0 is... actually the largest; the two
    # smallest (the upsert segments) must be the ones folded
    assert 0 in store.segments()
    # THE resurrection regression (review finding): the folded upsert
    # segments' tombstone files point INTO the un-merged seg0 — dropping
    # them wholesale resurrected every superseded seg0 doc (74 live
    # became 84). The carried-forward tombstones must keep the live set
    # exactly invariant, including after compounding queries.
    assert _live_docs(store) == live_before
    for q in QUERIES:
        assert _topk(spark, store, q, fast=True) == _topk(spark, store, q, fast=False)


def test_merge_preserves_positionless_setting(spark, tmp_path):
    from rabbit_index_ingest_spark.datagen import transcripts_df

    t = transcripts_df(spark, n_conv=12)
    store = IndexStore(spark, str(tmp_path / "idx_np"))
    store.save(build_index(spark, t, positions=False), segment=0)
    b = t.where(F.col("turn_idx") == 0).select(
        "conv_id", "turn_idx", F.concat(F.lit("karo "), "text").alias("text")
    )
    # upsert builds its segment with the default (positions on) — the
    # merge must follow the index's dominant setting, sampled from blocks
    store.upsert(b)
    store.upsert(
        t.where(F.col("turn_idx") == 1).select(
            "conv_id", "turn_idx", F.concat(F.lit("karo2 "), "text").alias("text")
        )
    )
    live_before = _live_docs(store)
    store.merge_segments(store.segments())
    assert _live_docs(store) == live_before
    # NB: upsert segments carried positions, so the sampled-pos merge may
    # go either way depending on sample order — the contract under test
    # is just that a FULLY positionless index stays positionless:
    store2 = IndexStore(spark, str(tmp_path / "idx_np2"))
    store2.save(build_index(spark, t, positions=False), segment=0)
    store2.save(
        build_index(
            spark,
            b,
            id_base=store2.load().next_doc_id,
            positions=False,
        ),
        segment=1,
    )
    store2.merge_segments([0, 1])
    pos_bytes = store2.load().postings.select(
        F.max(F.octet_length("pos_bytes")).alias("m")
    ).collect()[0]["m"]
    assert pos_bytes == 0


def test_merge_rejects_bad_input(spark, tmp_path):
    store, _ = _mk_store(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown segments"):
        store.merge_segments([0, 99])
    with pytest.raises(ValueError, match=">= 2"):
        store.merge_segments([0])
