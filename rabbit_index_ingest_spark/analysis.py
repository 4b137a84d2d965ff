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
from alnum-runs on boundary cases — UAX#29's MidNumLet/MidNum rules KEEP
word-internal apostrophes and periods (``can't`` and ``3.14`` each stay ONE
token), while the simple analyzer splits them. The opt-in ``standard``
analyzer below pins that join rule identically in all three engines; the
default stays the simple rule. Either way the contract is pinned here and
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

# ---- "standard" analyzer (opt-in): UAX#29-leaning word joins ----------
#
# ES's standard analyzer (UAX#29 word break) KEEPS word-internal
# apostrophes and periods via the MidNumLet/MidNum rules: "can't" is ONE
# token "can't", "3.14" is ONE token "3.14" (the module docstring's
# historical [can, t] note described Lucene's classic tokenizer, not
# standard). The opt-in "standard" analyzer here joins alnum runs over a
# SINGLE ' ’ or . — the same contract in all three engines (the join
# characters are literals, so Java/PCRE leftmost-greedy and RE2 agree):
#
#     token = [\p{L}\p{N}]+ ( ['’.] [\p{L}\p{N}]+ )*
#
# Documented deviations from full UAX#29 (pinned, consistent across
# engine + oracle, which is what rank-identical scoring requires):
# letter.digit mixes join here but split in UAX#29 (WB6/WB12 class
# checks), and CJK still tokenizes as runs rather than per-character
# (UAX#29 emits one token per Han char).
ANALYZERS = ("simple", "standard")
JAVA_TOKEN_PATTERN_STANDARD = r"[\p{L}\p{N}]+(?:['’.][\p{L}\p{N}]+)*"
_PY_TOKEN_RE_STANDARD = re.compile(
    r"[^\W_]+(?:['’.][^\W_]+)*", re.UNICODE
)
DUCKDB_TOKENS_STANDARD = (
    r"regexp_extract_all(lower({col}),"
    r" '[\p{{L}}\p{{N}}]+(?:[''’.][\p{{L}}\p{{N}}]+)*')"
)


def _check_analyzer(analyzer: str) -> None:
    if analyzer not in ANALYZERS:
        raise ValueError(
            f"analyzer must be one of {ANALYZERS}, got {analyzer!r}"
        )


def tokens_expr(col: Column | str, analyzer: str = "simple") -> Column:
    """Array-of-tokens Column — JVM regexp, stays in whole-stage codegen."""
    _check_analyzer(analyzer)
    pat = (
        JAVA_TOKEN_PATTERN if analyzer == "simple"
        else JAVA_TOKEN_PATTERN_STANDARD
    )
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pat), F.lit(0))


def doc_len_expr(col: Column | str, analyzer: str = "simple") -> Column:
    """Token count (document length for BM25) as a Column."""
    return F.size(tokens_expr(col, analyzer))


def py_tokenize(text: str | None, analyzer: str = "simple") -> list[str]:
    """Pure-Python twin of tokens_expr — used by the oracle (oracle.py)."""
    _check_analyzer(analyzer)
    if not text:
        return []
    rex = _PY_TOKEN_RE if analyzer == "simple" else _PY_TOKEN_RE_STANDARD
    return rex.findall(text.lower())


def duckdb_tokens_sql(col: str, analyzer: str = "simple") -> str:
    """DuckDB SQL fragment producing the same token array. NB: the
    returned fragment is spliced into single-quoted SQL string context by
    callers — the standard pattern contains a doubled '' escape for the
    apostrophe, valid exactly there."""
    _check_analyzer(analyzer)
    tpl = DUCKDB_TOKENS if analyzer == "simple" else DUCKDB_TOKENS_STANDARD
    return tpl.format(col=col)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (Series[str] → Series[list[str]]).

    Batch-level (not per-row-Python-over-JVM) — each Arrow batch is processed
    with pandas' vectorized ``.str`` ops. Semantics identical to
    ``tokens_expr`` (same char class, see module docstring).
    """
    lowered = texts.fillna("").str.lower()
    return lowered.str.findall(_PY_TOKEN_RE)
