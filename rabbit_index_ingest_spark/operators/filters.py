"""Prefix allow/deny filter (reference A5 — PathFilter + DatasetNode trie).

The reference builds a trie over path components and tests membership
(path_tools.py:261-316): policy 1 = allow everything except listed subtrees,
policy 2 = deny everything except listed subtrees; any other policy raises
``ValueError`` (path_tools.py:283-288). Trie semantics (exact match OR
descendant, component-aligned — tests/test_path_tools.py:55-64, :139-151).

Spark-native: the trie collapses to a compiled disjunction of
component-aligned prefix predicates — a narrow filter Catalyst pushes to
the scan. For very large prefix lists, switch to a broadcast left-semi join
on the exploded path-prefix (same semantics, still no shuffle of the fact
side).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALLOW_ALL_DENY_LISTED = 1  # reference filter_policy=1
DENY_ALL_ALLOW_LISTED = 2  # reference filter_policy=2


def _subtree_match(col: Column, prefix: str) -> Column:
    """True iff col == prefix or col descends from prefix (component-aligned,
    like DatasetNode.search_name — '/a/bc' does NOT match prefix '/a/b')."""
    p = prefix.rstrip("/")
    return (col == p) | col.startswith(p + "/")


def path_filter_expr(col: Column | str, paths: list[str], filter_policy: int) -> Column:
    """Boolean 'allow' Column replicating PathFilter.allow_path."""
    c = F.col(col) if isinstance(col, str) else col
    if filter_policy not in (ALLOW_ALL_DENY_LISTED, DENY_ALL_ALLOW_LISTED):
        raise ValueError(f"Invalid filter policy: {filter_policy}")
    if not paths:
        return F.lit(filter_policy == ALLOW_ALL_DENY_LISTED)
    matched = reduce(lambda a, b: a | b, (_subtree_match(c, p) for p in paths))
    return ~matched if filter_policy == ALLOW_ALL_DENY_LISTED else matched


def apply_path_filter(
    df: DataFrame, path_col: str, paths: list[str], filter_policy: int
) -> DataFrame:
    """Filter rows by the allow/deny policy — applied *before* heavy work so
    Catalyst pushes it into the scan (reference applies PathFilter first for
    the same reason, SURVEY.md §4.1)."""
    return df.filter(path_filter_expr(path_col, paths, filter_policy))
