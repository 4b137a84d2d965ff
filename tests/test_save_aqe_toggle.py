"""IndexStore.save runs its write jobs with AQE enabled and restores the
session's previous setting afterwards (store.py: the save is the
"coalesce on write" regime; the session default stays off for short
interactive queries — session.py).

Pins the conf contract, not the speed: the measured effect (save
~40-80% slower without AQE's write coalescing) lives in
tools/aqe_ab.py / OPTIMIZATION_r07.md.
"""

import tempfile

import pytest

from rabbit_index_ingest_spark.datagen import transcripts_df
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.store import IndexStore


@pytest.fixture(scope="module")
def built(spark):
    t = transcripts_df(spark, n_conv=40).persist()
    b = build_index(spark, t)
    yield b
    t.unpersist()


def _save(spark, built):
    store = IndexStore(spark, tempfile.mkdtemp(prefix="aqe_toggle_"))
    rel = built.release
    built.release = lambda: None  # keep caches for the sibling test
    try:
        store.save(built, segment=0)
    finally:
        built.release = rel
    return store


def test_save_restores_aqe_off(spark, built):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    store = _save(spark, built)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert store.load().n_docs == built.n_docs


def test_save_restores_aqe_on(spark, built):
    # a session that opted back in (SPARK_GRAFT_AQE=1) keeps its setting
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        store = _save(spark, built)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert store.load().n_docs == built.n_docs
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "false")


def test_save_restores_on_failure(spark, built):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    import dataclasses

    store = IndexStore(spark, tempfile.mkdtemp(prefix="aqe_toggle_"))
    broken = dataclasses.replace(built, n_docs=0)
    with pytest.raises(ValueError):
        store.save(broken, segment=0)  # refuses before the toggle
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
