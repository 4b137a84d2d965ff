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
