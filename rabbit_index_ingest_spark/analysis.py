"""The analyzer contract — single source of truth for build, query, oracle.

The reference delegates text analysis to Elasticsearch 7.9.1's ``standard``
analyzer (Unicode word segmentation + lowercase); the reference repo itself
contains zero tokenization code (SURVEY.md §2.2 B1). We pin an explicit,
cross-engine-reproducible approximation:

    tokens(text) = extract all maximal runs of [\\p{L}\\p{N}] from lower(text)

This one rule is implemented three ways, and they are *provably identical*
(see tests/test_analysis.py which cross-checks all three):

1. ``tokens_expr`` — Spark Column expression (JVM ``regexp_extract_all``,
   whole-stage codegen; the hot-path used by the index build).
2. ``py_tokenize`` — pure Python (``[^\\W_]+``, which is exactly the set of
   Unicode categories L* ∪ N* that Python's ``str.isalnum`` defines, i.e.
   the same char class) — used by the in-repo BM25 oracle.
3. ``DUCKDB_TOKENS`` — DuckDB SQL fragment (RE2 ``[\\p{L}\\p{N}]+``) — used
   by the driver's DuckDB cross-check oracle_sql twins.

A vectorized pandas UDF (``tokenize_pandas_udf``) is also provided for
pipelines that are already inside Arrow (mapInPandas stages); prefer
``tokens_expr`` in DataFrame code — built-ins beat UDFs.

Reference parity notes: ES ``standard`` uses UAX#29 word-break which differs
from alnum-runs on a few boundary cases (e.g. ``can't`` → [can, t] in both;
``3.14`` → [3.14] in UAX#29 vs [3, 14] here). The contract is pinned here and
used consistently by engine, oracle and fixtures, which is what
rank-identical scoring requires.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Java regex (Spark JVM) — \p{L}\p{N} are Unicode-aware in Java by default.
JAVA_TOKEN_PATTERN = r"[\p{L}\p{N}]+"
# Python re equivalent: \w == isalnum() ∪ {_} == L* ∪ N* ∪ {_}; strip the _.
_PY_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# DuckDB (RE2) fragment: tokens of a text column expression.
DUCKDB_TOKENS = r"regexp_extract_all(lower({col}), '[\p{{L}}\p{{N}}]+')"


def tokens_expr(col: Column | str) -> Column:
    """Array-of-tokens Column — JVM regexp, stays in whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(JAVA_TOKEN_PATTERN), F.lit(0))


def doc_len_expr(col: Column | str) -> Column:
    """Token count (document length for BM25) as a Column."""
    return F.size(tokens_expr(col))


def py_tokenize(text: str | None) -> list[str]:
    """Pure-Python twin of tokens_expr — used by the oracle (oracle.py)."""
    if not text:
        return []
    return _PY_TOKEN_RE.findall(text.lower())


def duckdb_tokens_sql(col: str) -> str:
    """DuckDB SQL fragment producing the same token array."""
    return DUCKDB_TOKENS.format(col=col)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (Series[str] → Series[list[str]]).

    Batch-level (not per-row-Python-over-JVM) — each Arrow batch is processed
    with pandas' vectorized ``.str`` ops. Semantics identical to
    ``tokens_expr`` (same char class, see module docstring).
    """
    lowered = texts.fillna("").str.lower()
    return lowered.str.findall(_PY_TOKEN_RE)
