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

from rabbit_index_ingest_spark.index.store import IndexStore, merge_into_sql


def test_merge_into_sql_shape():
    sql = merge_into_sql("lake.idx.docs", "updates", key_cols=("conv_id", "turn_idx"))
    u = sql.upper()
    assert "MERGE INTO LAKE.IDX.DOCS" in u
    assert "WHEN MATCHED THEN UPDATE SET *" in u
    assert "WHEN NOT MATCHED THEN INSERT *" in u
    assert "T.CONV_ID = S.CONV_ID" in u and "T.TURN_IDX = S.TURN_IDX" in u


def test_store_dispatches_to_iceberg_when_catalog_set(spark, tmp_path):
    store = IndexStore(spark, str(tmp_path / "idx"), iceberg_catalog="lake.ns")
    assert store._use_iceberg() is True
    assert store._iceberg_table("postings", 3) == "lake.ns.postings_seg00003"
    plain = IndexStore(spark, str(tmp_path / "idx2"))
    assert plain._use_iceberg() is False


@pytest.mark.skipif(
    not os.environ.get("SPARK_ICEBERG_CATALOG"),
    reason="no Iceberg jars/catalog in this sandbox; set SPARK_ICEBERG_CATALOG "
    "to a configured spark.sql.catalog.<name> to run the live write",
)
def test_iceberg_write_live(spark, tmp_path):
    from rabbit_index_ingest_spark.datagen import transcripts_df
    from rabbit_index_ingest_spark.index.build import build_index

    cat = os.environ["SPARK_ICEBERG_CATALOG"]
    store = IndexStore(spark, str(tmp_path / "idx"), iceberg_catalog=f"{cat}.riis_test")
    built = build_index(spark, transcripts_df(spark, n_conv=5))
    store.save(built, segment=0)
    assert spark.table(f"{cat}.riis_test.postings_seg00000").count() > 0
