"""Path-derived metadata projection + content-derived doc id
(reference A11 + A12).

* ``generate_path_metadata`` (path_tools.py:125-179) computes
  depth/dir/type columns from the path string — pure column expressions
  here (the POSIX stat/symlink parts are a filesystem data dependency our
  table-native engine doesn't have, SURVEY.md §3.1).
* ``generate_id`` (path_tools.py:249-258) = SHA-1 hexdigest of the path —
  golden value asserted by the reference at tests/test_path_tools.py:127-134
  and re-asserted in our tests. Content-derived ids make writes idempotent
  upserts (the reference's ``doc_as_upsert`` contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sha1_id_expr(col: Column | str) -> Column:
    """SHA-1 hex doc id (reference PathTools.generate_id).

    The reference's ``.encode(errors='ignore')`` lossy-encode nuance only
    matters for invalid-UTF8 input; Spark strings are valid UTF-8 by
    construction so the built-in is exact (SURVEY.md A12)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha1(F.encode(c, "utf-8"))


def doc_key_expr(conv_id: Column | str, turn_idx: Column | str) -> Column:
    """Deterministic content-derived key for a transcript turn — the
    engine's analogue of the reference's path-SHA1 (same invariant:
    deterministic, content-addressed, idempotent)."""
    c1 = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    c2 = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.sha1(F.encode(F.concat_ws("#", c1, c2.cast("string")), "utf-8"))


def path_metadata(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Adds depth / dir / archive_path / type columns
    (reference generate_path_metadata core fields, path_tools.py:160-177).

    depth = number of components below root; dir = basename;
    type is decided by the caller's routing (dir vs file event class)."""
    c = F.col(path_col)
    parts = F.split(F.regexp_replace(c, "/$", ""), "/")
    return (
        df.withColumn("depth", F.size(parts) - F.lit(1))
        .withColumn("dir", F.element_at(parts, -1))
        .withColumn("archive_path", F.regexp_replace(c, "/$", ""))
    )
