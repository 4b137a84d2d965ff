"""The analyzer contract: Spark JVM regexp ≡ pandas UDF ≡ pure Python ≡ DuckDB.

Upgrades the reference's encoding-edge-case tests
(/root/reference/tests/test_path_tools.py:117-125) into a three-engine
cross-check of the single tokenizer rule.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.analysis import (
    duckdb_tokens_sql,
    py_tokenize,
    tokenize_pandas_udf,
    tokens_expr,
)

CASES = [
    "Hello, World!",
    "the fast key ORDER sort table",
    "can't stop-won't_stop 3.14 x2",
    "café naïve 東京 résumé 😀 Ωmega",
    "",
    "   ",
    "!!!",
    "MiXeD CaSe 123abc ABC123",
    "tab\tsep\nnewline",
    "underscore_split keeps_parts",
]


def test_py_tokenize_golden():
    assert py_tokenize("Hello, World!") == ["hello", "world"]
    assert py_tokenize("can't stop-won't_stop") == [
        "can", "t", "stop", "won", "t", "stop",
    ]
    assert py_tokenize("") == []
    assert py_tokenize(None) == []
    assert py_tokenize("café 東京 😀") == ["café", "東京"]
    assert py_tokenize("underscore_split") == ["underscore", "split"]


@pytest.fixture(scope="module")
def spark_tokens(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, t string")
    jvm = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_expr("t").alias("toks")).collect()
    }
    udf = {
        r["i"]: r["toks"]
        for r in df.select("i", tokenize_pandas_udf(F.col("t")).alias("toks")).collect()
    }
    return jvm, udf


def test_three_engines_agree(spark_tokens):
    jvm, udf = spark_tokens
    con = duckdb.connect()
    for i, text in enumerate(CASES):
        expected = py_tokenize(text)
        assert jvm[i] == expected, f"JVM mismatch on {text!r}"
        assert udf[i] == expected, f"pandas UDF mismatch on {text!r}"
        duck = con.execute(
            f"select {duckdb_tokens_sql('?')}", [text]
        ).fetchone()[0]
        assert duck == expected, f"DuckDB mismatch on {text!r}"


def test_corpus_vocab_agree(spark):
    """All three engines agree on the generated transcript vocabulary."""
    from rabbit_index_ingest_spark.datagen import transcripts_pandas

    pdf = transcripts_pandas(n_conv=20)
    texts = pdf["text"].tolist()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    jvm = {r["i"]: r["toks"] for r in df.select("i", tokens_expr("t").alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert jvm[i] == py_tokenize(t)
