"""Opt-in "standard" analyzer (UAX#29-leaning word joins): ES's standard
analyzer keeps word-internal apostrophes and periods ("can't", "3.14" are
single tokens — MidNumLet). The engine's "standard" analyzer pins that
join rule identically in all three engines (JVM regexp / pure Python /
DuckDB RE2) and persists the choice with the index so query analysis,
upsert and compact all follow it."""

from __future__ import annotations

import tempfile

import duckdb
import pandas as pd
import pytest

from rabbit_index_ingest_spark.analysis import (
    duckdb_tokens_sql,
    py_tokenize,
    tokens_expr,
)
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.index.store import IndexStore

BOUNDARY = [
    "Can't stop",
    "3.14 and 2.72",
    "état d'âme",
    "a.b.c...d",
    "'leading trailing'",
    "x''y",
    "don’t 東京 café",
    "3. 14",
    "a.1 1.a",
    "",
    "’’",
    "O'Neil's 99.9%",
    "v1.2.3-rc.1",
]


@pytest.mark.parametrize("analyzer", ["simple", "standard"])
def test_three_engine_parity(spark, analyzer):
    """JVM regexp == pure Python == DuckDB RE2 on every boundary case."""
    pdf = pd.DataFrame({"i": range(len(BOUNDARY)), "text": BOUNDARY})
    got_jvm = {
        r["i"]: list(r["toks"])
        for r in spark.createDataFrame(pdf)
        .select("i", tokens_expr("text", analyzer).alias("toks"))
        .collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(BOUNDARY):
        py = py_tokenize(s, analyzer)
        assert got_jvm[i] == py, (analyzer, s, got_jvm[i], py)
        lit = "'" + s.replace("'", "''") + "'"
        duck = con.execute(
            f"SELECT {duckdb_tokens_sql(lit, analyzer)} AS t"
        ).fetchone()[0]
        assert duck == py, (analyzer, s, duck, py)


def test_standard_join_semantics():
    assert py_tokenize("Can't stop", "standard") == ["can't", "stop"]
    assert py_tokenize("3.14", "standard") == ["3.14"]
    assert py_tokenize("Can't stop", "simple") == ["can", "t", "stop"]
    assert py_tokenize("3.14", "simple") == ["3", "14"]
    with pytest.raises(ValueError, match="analyzer"):
        py_tokenize("x", "english")
    with pytest.raises(ValueError, match="analyzer"):
        tokens_expr("text", "english")


def test_standard_index_end_to_end_and_persistence(spark):
    """Build with analyzer=standard, save, load — the loaded index knows
    its analyzer; queries analyze with it; upsert follows it."""
    rows = [
        ("c0", 0, "we can't stop the 3.14 release"),
        ("c0", 1, "cant stop anyway"),
        ("c1", 0, "pi is 3.14 and can't be 3"),
        ("c1", 1, "don't touch that dial"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    built = build_index(spark, df, analyzer="standard")
    root = tempfile.mkdtemp(prefix="idx_std_")
    store = IndexStore(spark, root)
    store.save(built)
    L = store.load()
    assert L.analyzer == "standard"
    s = Searcher(
        spark, L.postings, L.dictionary, L.n_docs, L.avgdl,
        deleted_df=L.deleted_df, analyzer=L.analyzer,
    )
    # "can't" is ONE indexed token: matches exactly the two can't docs
    got = {
        (r["doc_id"]) for r in s.topk_blockmax("can't", 10).collect()
    }
    keymap = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in L.doc_stats.collect()
    }
    assert got == {keymap[("c0", 0)], keymap[("c1", 0)]}
    # the bare fragment "can" matches NOTHING (no such token exists)
    assert s.topk_blockmax("can", 10).count() == 0
    # "3.14" is one token too — and "3" alone only hits the doc with a
    # bare 3
    assert {r["doc_id"] for r in s.topk_blockmax("3.14", 10).collect()} == {
        keymap[("c0", 0)], keymap[("c1", 0)]
    }
    assert {r["doc_id"] for r in s.topk_blockmax("3", 10).collect()} == {
        keymap[("c1", 0)]
    }
    # scores equal a simple-analyzer oracle over pre-joined tokens: the
    # dataframe twin shares the same tokens_expr so cross-check both paths
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_dataframe("can't stop", 10).collect()
    ]
    gotb = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_blockmax("can't stop", 10).collect()
    ]
    assert gotb == want and gotb
    # upsert FOLLOWS the persisted analyzer (no flag re-passed)
    batch = spark.createDataFrame(
        [("c2", 0, "you can't upsert... or can't you")],
        "conv_id string, turn_idx int, text string",
    )
    store.upsert(batch)
    L2 = store.load()
    assert L2.analyzer == "standard"
    s2 = Searcher(
        spark, L2.postings, L2.dictionary, L2.n_docs, L2.avgdl,
        deleted_df=L2.deleted_df, analyzer=L2.analyzer,
    )
    assert s2.topk_blockmax("can't", 10).count() == 3
    built.release()


def test_default_analyzer_unchanged(spark):
    """A default build still tokenizes exactly as before (simple) and
    loads as analyzer='simple'."""
    df = spark.createDataFrame(
        [("c0", 0, "can't 3.14")],
        "conv_id string, turn_idx int, text string",
    )
    built = build_index(spark, df)
    root = tempfile.mkdtemp(prefix="idx_simple_")
    store = IndexStore(spark, root)
    store.save(built)
    L = store.load()
    assert L.analyzer == "simple"
    s = Searcher(spark, L.postings, L.dictionary, L.n_docs, L.avgdl)
    assert s.topk_blockmax("can", 10).count() == 1  # split tokens
    assert s.topk_blockmax("can't", 10).count() == 1  # analyzed to can, t
    built.release()
