"""Phrase-aware highlight spans (functions/spans.py) + char-level
phrase highlighting (functions/text.phrase_highlight_expr)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.analysis import py_tokenize
from rabbit_index_ingest_spark.functions.spans import (
    minimal_windows,
    phrase_spans,
)
from rabbit_index_ingest_spark.functions.text import phrase_highlight_expr


@pytest.mark.parametrize(
    "tokens,qterms,slop,want",
    [
        # exact phrase: one window per aligned start
        ("a b c a b".split(), ["a", "b"], 0, [(0, 1), (3, 4)]),
        # no match
        ("a c b".split(), ["a", "b"], 0, []),
        # transposition "b a" costs 2 (Lucene: slop=2 allows swap)
        ("b a".split(), ["a", "b"], 1, []),
        ("b a".split(), ["a", "b"], 2, [(0, 1)]),
        # one gap token
        ("a x b".split(), ["a", "b"], 0, []),
        ("a x b".split(), ["a", "b"], 1, [(0, 2)]),
        # repeated query term on a repeated-token run
        ("aa aa aa".split(), ["aa", "aa"], 0, [(0, 1), (1, 2)]),
        # two windows with distinct Ls: exact at 0, one-gap "a y b" at 5
        ("a b x x x a y b".split(), ["a", "b"], 1, [(0, 1), (5, 7)]),
        # far-apart occurrences exceed the budget
        ("a x x x x b".split(), ["a", "b"], 3, []),
    ],
)
def test_minimal_windows_golden(tokens, qterms, slop, want):
    assert minimal_windows(tokens, qterms, slop) == want


def test_minimal_windows_matches_exact_enumeration_randomized():
    """slop=0 ⇔ enumerate aligned starts — on random tiny-alphabet docs."""
    rng = random.Random(42)
    for _ in range(300):
        toks = [rng.choice("ab c d".split()) for _ in range(rng.randint(0, 12))]
        n = rng.randint(1, 3)
        q = [rng.choice("ab c d".split()) for _ in range(n)]
        want = [
            (p, p + n - 1)
            for p in range(len(toks) - n + 1)
            if toks[p : p + n] == q
        ]
        assert minimal_windows(toks, q, 0) == want, (toks, q)


def test_phrase_spans_jvm_path_equals_python_matcher(spark):
    rows = [
        (0, "Table hash! A table HASH map; tablehash is one token."),
        (1, "hash table (reversed) then table ... hash far apart"),
        (2, "no match here"),
        (3, "table hash table hash"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["w_start"], r["w_end"], r["snippet"])
        for r in phrase_spans(df, "table hash", slop=0).collect()
    )
    want = []
    for i, text in rows:
        toks = py_tokenize(text)
        for ws, we in minimal_windows(toks, ["table", "hash"], 0):
            want.append((i, ws, we, " ".join(toks[ws : we + 1])))
    assert got == sorted(want) and got
    # the JVM path is pure codegen — no Python stage in the plan
    plan = (
        phrase_spans(df, "table hash", slop=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan


@pytest.mark.parametrize("slop", [1, 2, 4])
def test_phrase_spans_sloppy_equals_python_matcher(spark, slop):
    rng = random.Random(slop)
    rows = []
    for i in range(60):
        rows.append(
            (i, " ".join(rng.choice(["ta", "ha", "x", "y"]) for _ in range(12)))
        )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["w_start"], r["w_end"], r["snippet"])
        for r in phrase_spans(df, "ta ha", slop=slop).collect()
    )
    want = []
    for i, text in rows:
        toks = py_tokenize(text)
        for ws, we in minimal_windows(toks, ["ta", "ha"], slop):
            want.append((i, ws, we, " ".join(toks[ws : we + 1])))
    assert got == sorted(want) and got


def test_phrase_spans_doc_set_agrees_with_sloppy_scorer(spark):
    """Cross-path check: docs with >= 1 span == docs the positional
    sloppy scorer matches (independent machinery: postings + block-max
    vs per-doc sweep)."""
    from rabbit_index_ingest_spark.datagen import transcripts_pandas
    from rabbit_index_ingest_spark.index.build import build_index
    from rabbit_index_ingest_spark.index.query import Searcher

    pdf = transcripts_pandas(n_conv=20)[["conv_id", "turn_idx", "text"]]
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    built = build_index(spark, df)
    s = Searcher(spark, built.postings, built.dictionary, built.n_docs, built.avgdl)
    phrase, slop = "kaka roka", 3
    scorer_docs = {
        r["doc_id"]
        for r in s.topk_phrase(phrase, 10_000, slop=slop).collect()
    }
    span_docs = {
        r["doc_id"]
        for r in phrase_spans(built.docs, phrase, slop=slop).collect()
    }
    assert span_docs == scorer_docs and span_docs
    built.release()


@pytest.mark.parametrize(
    "text,toks,want",
    [
        ("Table hash wins", ["table", "hash"], "<em>Table hash</em> wins"),
        ("a table-hash; ok", ["table", "hash"], "a <em>table-hash</em>; ok"),
        # full-token guard: no match inside larger tokens
        ("stable hashing", ["table", "hash"], "stable hashing"),
        ("tablehash", ["table", "hash"], "tablehash"),
        # consecutive occurrences (zero-width guards don't eat separators)
        ("table hash table hash", ["table", "hash"],
         "<em>table hash</em> <em>table hash</em>"),
        ("no phrase here", ["table", "hash"], "no phrase here"),
    ],
)
def test_phrase_highlight_expr_golden(spark, text, toks, want):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        phrase_highlight_expr("text", toks).alias("s")
    ).collect()[0]["s"]
    assert got == want


def test_phrase_highlight_expr_is_codegen(spark):
    df = spark.range(3).select(F.concat(F.lit("table hash "), "id").alias("text"))
    plan = (
        df.select(phrase_highlight_expr("text", ["table", "hash"]).alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    with pytest.raises(ValueError, match="non-empty"):
        phrase_highlight_expr("text", [])
