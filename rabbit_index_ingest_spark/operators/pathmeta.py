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


def path_metadata_full(
    df: DataFrame,
    path_col: str = "path",
    link_target_col: str | None = None,
    is_dir_col: str | None = None,
    moles_dim: DataFrame | None = None,
    dim_key: str = "data_path",
    readme_col: str | None = None,
) -> DataFrame:
    """The COMPLETE reference document projection (path_tools.py:125-179;
    golden doc shape at tests/test_directory_updates.py:73-75): depth, dir,
    archive_path (with symlink ``..``-resolution), ``link``, ``type``, and
    — for directories with a matching catalogue record — the conditional
    MOLES enrichment columns title / url / record_type (plus optional
    ``readme`` passthrough, A13).

    The reference derives ``link``/``isdir``/readlink from POSIX stat
    calls — a filesystem data dependency with no analogue over a table, so
    they arrive as COLUMNS here (``link_target_col``: readlink target or
    null; ``is_dir_col``: boolean). The *resolution logic* is the
    reference's, as pure string transforms (path_tools.py:145-157):

    * target not starting with ``/datacentre`` or ``..`` → archive_path =
      target (absolute link);
    * target starting with ``..`` → count the ``../`` hops, strip leading
      ``.``/``/`` chars (python ``lstrip('./')``), resolve against the
      count-th parent of the path;
    * target starting with ``/datacentre`` → archive_path stays the path.

    MOLES enrichment (path_tools.py:170-177): broadcast left-join on the
    ``/``-normalized path; columns set only when the row is a dir AND the
    record has a non-empty title (``if record and record['title']``).
    """
    norm = F.regexp_replace(F.col(path_col), "/$", "")
    parts = F.split(norm, "/")
    out = (
        df.withColumn("depth", F.size(parts) - F.lit(1))
        .withColumn("dir", F.element_at(parts, -1))
    )

    if link_target_col is not None:
        target = F.col(link_target_col)
        is_link = target.isNotNull() & (target != F.lit(""))
        starts_dc = F.startswith(target, F.lit("/datacentre"))
        starts_dd = F.startswith(target, F.lit(".."))
        hops = (
            (F.length(target) - F.length(F.replace(target, F.lit("../"), F.lit(""))))
            / F.lit(3)
        ).cast("int")
        stripped = F.regexp_replace(target, r"^[./]+", "")
        # Path.parents[hops] == drop the last hops+1 components
        parent = F.array_join(
            F.slice(parts, 1, F.size(parts) - (hops + F.lit(1))), "/"
        )
        resolved = F.concat_ws("/", parent, stripped)
        out = out.withColumn("link", is_link).withColumn(
            "archive_path",
            F.when(is_link & ~starts_dc & ~starts_dd, target)
            .when(is_link & starts_dd, resolved)
            .otherwise(norm),
        )
    else:
        out = out.withColumn("link", F.lit(False)).withColumn("archive_path", norm)

    isdir = (
        F.col(is_dir_col) if is_dir_col is not None else F.lit(False)
    )
    out = out.withColumn("type", F.when(isdir, "dir").otherwise("file"))

    if moles_dim is not None:
        dim = moles_dim.select(
            F.regexp_replace(F.col(dim_key), "/$", "").alias("_dim_key"),
            F.col("title").alias("_m_title"),
            F.col("url").alias("_m_url"),
            F.col("record_type").alias("_m_rt"),
        )
        enrich = isdir & F.col("_m_title").isNotNull() & (F.col("_m_title") != "")
        out = (
            out.join(F.broadcast(dim), norm == F.col("_dim_key"), "left")
            .withColumn("title", F.when(enrich, F.col("_m_title")))
            .withColumn("url", F.when(enrich, F.col("_m_url")))
            .withColumn("record_type", F.when(enrich, F.col("_m_rt")))
            .drop("_dim_key", "_m_title", "_m_url", "_m_rt")
        )
    if readme_col is not None:
        out = out.withColumn(
            "readme", F.when(isdir, F.col(readme_col))
        )
    return out
