"""delete_by_query (ES _delete_by_query) — tombstone-by-match-set.

The reference deletes documents by routing DEPOSIT/REMOVE actions to ES
(queue_handler.py routes, index_updaters/base.py writes); ES-side users
also bulk-delete with _delete_by_query. The engine owns it natively: one
Searcher match-set decode flowing into one distributed tombstone write.
Also covers the cross-namespace segment allocator (_next_segment) — a
delete's tombstone file must never be clobbered by a later upsert/merge
that allocates the same segment id.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.analysis import py_tokenize
from rabbit_index_ingest_spark.datagen import transcripts_pandas
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.index.store import IndexStore


def _store(spark, tmp_path, n_conv=30):
    pdf = (
        transcripts_pandas(n_conv=n_conv)[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.save(build_index(spark, spark.createDataFrame(pdf)), segment=0)
    return pdf, store


def _searcher(spark, store):
    L = store.load()
    return L, Searcher(
        spark, L.postings, L.dictionary, L.n_docs, L.avgdl,
        deleted_df=L.deleted_df,
    )


def test_delete_by_query_removes_matches(spark, tmp_path):
    pdf, store = _store(spark, tmp_path)
    term = "zephyr"
    want_deleted = {
        i for i, t in enumerate(pdf["text"]) if term in py_tokenize(t)
    }
    assert want_deleted, "fixture needs matches"
    n = store.delete_by_query(term)
    assert n == len(want_deleted)
    assert store.tombstones() == want_deleted
    # the deleted docs never rank again, other docs keep their scores
    # (stats keep the deleted docs until merge — Lucene/ES semantics)
    L, s = _searcher(spark, store)
    assert L.n_docs == len(pdf)  # stats unshed
    assert s.topk_blockmax(term, 10_000_000).count() == 0
    # survivors of an unrelated query keep ranking ("zephyr quantum
    # lattice" is a seeded trigram, so pick a term with matches OUTSIDE
    # the deleted set)
    other = "karo"
    want_other = {
        i for i, t in enumerate(pdf["text"]) if other in py_tokenize(t)
    } - want_deleted
    assert want_other, "fixture needs survivors for the control query"
    rows = s.topk_blockmax(other, 10_000_000).collect()
    assert {r["doc_id"] for r in rows} == want_other
    # idempotent: matching docs are already dead -> zero NEW tombstones
    assert store.delete_by_query(term) == 0


def test_delete_by_query_modes(spark, tmp_path):
    pdf, store = _store(spark, tmp_path)
    toks = [py_tokenize(t) for t in pdf["text"]]
    want_and = {
        i for i, d in enumerate(toks)
        if "zephyr" in d and "quantum" in d
    }
    assert want_and
    n = store.delete_by_query("zephyr quantum", mode="and")
    assert n == len(want_and) and store.tombstones() == want_and
    # phrase mode deletes only consecutive occurrences (of the remainder)
    want_phrase = {
        i for i, d in enumerate(toks)
        if any(d[j : j + 2] == ["zephyr", "quantum"] for j in range(len(d)))
    }
    n2 = store.delete_by_query("zephyr quantum", mode="phrase")
    assert n2 == len(want_phrase - want_and)
    with pytest.raises(ValueError, match="mode"):
        store.delete_by_query("zephyr", mode="fuzzy")
    # absent term: no matches, no tombstone segment side effects
    assert store.delete_by_query("qzx_absent_term") == 0


def test_delete_then_upsert_allocator_no_clobber(spark, tmp_path):
    """A delete's tombstone file must survive a later upsert: the segment
    allocator spans the tombstone namespace (the naive data-segment-only
    allocator would hand the upsert the same id, whose overwrite-mode
    tombstone write resurrects the deleted docs)."""
    pdf, store = _store(spark, tmp_path)
    term = "zephyr"
    deleted = store.tombstones()
    n = store.delete_by_query(term)
    assert n > 0
    after_delete = store.tombstones()
    # upsert a batch that supersedes one OTHER (still-live) doc
    live_victim = next(
        i for i in range(len(pdf)) if i not in after_delete
    )
    batch = spark.createDataFrame(
        [(
            pdf["conv_id"][live_victim],
            int(pdf["turn_idx"][live_victim]),
            "completely new text karo",
        )],
        "conv_id string, turn_idx int, text string",
    )
    store.upsert(batch)
    # both tombstone populations coexist
    tombs = store.tombstones()
    assert after_delete <= tombs and live_victim in tombs
    # and the deleted docs stay gone through a real query
    _, s = _searcher(spark, store)
    assert s.topk_blockmax(term, 10_000_000).count() == 0


def test_delete_then_compact_purges(spark, tmp_path):
    pdf, store = _store(spark, tmp_path, n_conv=12)
    n = store.delete_by_query("zephyr")
    assert n > 0
    store.compact()
    L, s = _searcher(spark, store)
    assert L.deleted_df is None
    assert L.n_docs == len(pdf) - n  # stats shed on compact
    assert s.topk_blockmax("zephyr", 10_000_000).count() == 0
