"""CLI surface smoke: build an index through the spark-submit entry and
drive the request-scoped subcommands (analyze, the three suggesters,
query) end-to-end, asserting on the printed JSON lines."""

import json

import pytest

from rabbit_index_ingest_spark.analysis import py_tokenize
from rabbit_index_ingest_spark.cli import main
from rabbit_index_ingest_spark.datagen import transcripts_pandas


@pytest.fixture(scope="module")
def cli_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    src = str(root / "corpus.parquet")
    idx = str(root / "index")
    pdf = transcripts_pandas(n_conv=25)[["conv_id", "turn_idx", "text"]]
    spark.createDataFrame(pdf).write.parquet(src)
    assert main(["build", "--input", src, "--index", idx]) == 0
    return idx


def _lines(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]


def test_cli_analyze(spark, cli_index, capsys):
    txt = "Hello can't 3.14 café"
    assert main(["analyze", "--index", cli_index, "--text", txt]) == 0
    rows = _lines(capsys)
    assert [r["token"] for r in rows] == py_tokenize(txt)
    for r in rows:
        assert txt[r["start_offset"]:r["end_offset"]].lower() == r["token"]


def test_cli_suggest_types(spark, cli_index, capsys):
    # term (default): a 1-edit misspelling of an indexed word
    assert main(["suggest", "--index", cli_index, "--q", "zephr"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["term"] == "zephyr" and rows[0]["distance"] == 1
    # completion: prefix autocomplete by df
    assert main(
        ["suggest", "--index", cli_index, "--q", "zep",
         "--type", "completion"]
    ) == 0
    rows = _lines(capsys)
    assert rows and all(r["term"].startswith("zep") for r in rows)
    # phrase: whole-phrase correction via the bigram LM
    assert main(
        ["suggest", "--index", cli_index, "--q", "zephr karo",
         "--type", "phrase", "--size", "3"]
    ) == 0
    rows = _lines(capsys)
    assert rows and all(
        "phrase" in r and isinstance(r["score"], float) for r in rows
    )
    assert any("zephyr" in r["phrase"] for r in rows)


def test_cli_query_roundtrip(spark, cli_index, capsys):
    assert main(
        ["query", "--index", cli_index, "--q", "zephyr karo", "-k", "5"]
    ) == 0
    rows = _lines(capsys)
    assert 0 < len(rows) <= 5
    assert all({"conv_id", "turn_idx", "score"} <= set(r) for r in rows)
    assert rows == sorted(rows, key=lambda r: -r["score"])
