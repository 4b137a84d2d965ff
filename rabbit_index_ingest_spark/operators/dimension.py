"""Dimension (catalogue) build + broadcast lookup join (reference A6-A9).

The reference materializes a small catalogue dimension (the MOLES mapping)
once per process: paginated HTTP fetch → filter/project/dedup-by-key
(path_tools.py:23-52, :55-84), normalizes keys by stripping trailing
slashes (:87-101), caches it next to a prefix trie, and per-message does an
exact dict lookup (:181-200). That whole apparatus is, in Spark terms, a
**broadcast hash left-join against a key-normalized deduped dimension** —
the trie pre-check is a bloom-style existence test the join subsumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_dimension(
    raw: DataFrame,
    path_col: str = "data_path",
    uuid_col: str = "uuid",
    title_col: str = "title",
    state_col: str = "publicationState",
    url_prefix: str = "https://catalogue.example/uuid/",
) -> DataFrame:
    """Filter + project + dedup-by-key (reference process_observations,
    path_tools.py:23-52):

    * drop rows in 'working' state,
    * drop rows with a null key,
    * strip trailing '/' from the key (reference :46, :96-99),
    * project {title, url (prefix+uuid), record_type='Dataset'},
    * last-write-wins on duplicate keys (dict-overwrite in the reference →
      dropDuplicates on the normalized key here).
    """
    return (
        raw.filter(F.col(state_col).isNull() | (F.col(state_col) != "working"))
        .filter(F.col(path_col).isNotNull())
        .select(
            F.regexp_replace(F.col(path_col), "/+$", "").alias("data_path"),
            F.col(title_col).alias("title"),
            F.concat(F.lit(url_prefix), F.col(uuid_col)).alias("url"),
            F.lit("Dataset").alias("record_type"),
        )
        .dropDuplicates(["data_path"])
    )


def fetch_paginated(fetch_fn, url: str, accumulate=None) -> list:
    """Cursor-paginated fetch (reference A7 — generate_moles_mapping,
    path_tools.py:55-84): follow ``response["next"]`` until null,
    accumulating ``results``. Iterative rather than recursive (the
    reference recurses; a deep catalogue would blow Python's stack).

    ``fetch_fn(url) -> {"results": [...], "next": url|None}`` is injected —
    the engine has no live catalogue; tests use a fake. This runs on the
    driver (a small dimension) and feeds ``build_dimension`` →
    ``spark.createDataFrame`` → broadcast (SURVEY.md A7: never a
    distributed op)."""
    out = list(accumulate or [])
    next_url = url
    while next_url:
        resp = fetch_fn(next_url)
        out.extend(resp.get("results", []))
        next_url = resp.get("next")
    return out


def load_dimension_file(spark, path: str):
    """Dimension load from a JSON mapping file + trailing-slash key
    normalization (reference A8 — load_moles_mapping, path_tools.py:87-101).
    File shape: {data_path: {title, url, record_type}} → DataFrame."""
    import json

    with open(path) as f:
        mapping = json.load(f)
    rows = [
        (k.rstrip("/"), v.get("title"), v.get("url"), v.get("record_type"))
        for k, v in mapping.items()
    ]
    return spark.createDataFrame(
        rows, "data_path string, title string, url string, record_type string"
    ).dropDuplicates(["data_path"])


def lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_path_col: str = "path",
    dim_key_col: str = "data_path",
) -> DataFrame:
    """Broadcast hash LEFT join on the normalized key (reference
    get_moles_record_metadata, path_tools.py:181-200). The dimension is
    small by construction (a catalogue), so `F.broadcast` avoids shuffling
    the fact table entirely — the 100 TB-scale version of the reference's
    in-process dict."""
    facts_norm = facts.withColumn(
        "_k", F.regexp_replace(F.col(fact_path_col), "/+$", "")
    )
    dim_renamed = dim.withColumnRenamed(dim_key_col, "_k")
    return facts_norm.join(F.broadcast(dim_renamed), "_k", "left").drop("_k")
