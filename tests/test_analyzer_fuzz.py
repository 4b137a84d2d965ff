"""Analyzer-contract fuzz: random unicode strings must tokenize identically
in pure Python, Spark JVM regex, and DuckDB RE2 — the property everything
else (scores, oracles) rests on."""

import random

import duckdb
import pytest

from rabbit_index_ingest_spark.analysis import (
    duckdb_tokens_sql,
    py_tokenize,
    tokens_expr,
)

ALPHABET = (
    "abcXYZ0123456789 \t\n.,;:!?()[]{}<>#@$%^&*-_+=/\\'\"`~|"
    "äöüßéèêñçøåÆŒ"          # latin extended
    "αβγδΩλπ"                # greek
    "аб вгд еж"              # cyrillic
    "中文漢字日本語ひらがなカタカナ"  # CJK
    "한국어조선말"             # hangul
    "العربية עברית"           # RTL
    "देवनागरी ०१२३"           # devanagari incl digits
    "😀🎉🚀❤️"                # emoji
    "ⅢⅣⅤ½¾"                 # Nl / No
    "​  "     # zero-width space, nbsp, line sep
)


def _random_strings(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        length = rng.randint(0, 60)
        out.append("".join(rng.choice(ALPHABET) for _ in range(length)))
    return out


def test_three_engine_fuzz(spark):
    cases = _random_strings(300)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i int, s string"
    )
    jvm = {
        r["i"]: r["toks"]
        for r in df.select("i", tokens_expr("s").alias("toks")).collect()
    }
    con = duckdb.connect()
    mismatches = []
    for i, s in enumerate(cases):
        expected = py_tokenize(s)
        if jvm[i] != expected:
            mismatches.append(("jvm", s, jvm[i], expected))
        duck = con.execute(f"select {duckdb_tokens_sql('?')}", [s]).fetchone()[0]
        if duck != expected:
            mismatches.append(("duckdb", s, duck, expected))
    assert not mismatches, mismatches[:5]
