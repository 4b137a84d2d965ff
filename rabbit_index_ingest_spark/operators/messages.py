"""Message decode + routing (reference A2/A3/A4).

The reference consumes filesystem-event messages in two wire encodings and
routes them by action to one of two indices:

* JSON object, or legacy colon-delimited text — decoded by
  ``QueueHandler.decode_message`` (queue_handler.py:50-94): try JSON, on
  failure split on ':' positionally (fields 0-2 = datetime, 3 = filepath,
  4 = action, 5 = filesize, 6+ = message re-joined).
* DEPOSIT/REMOVE → files index; MKDIR/RMDIR/SYMLINK/00README → directories
  index (README.md:5-7).

Spark-native: a single narrow projection — ``from_json`` with a
``coalesce`` fallback onto a split-based extraction. Pure built-ins, fully
codegen'd; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

INGEST_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.StringType(), True),
        T.StructField("filepath", T.StringType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("filesize", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)

# Action routing (reference README.md:5-7)
FILE_ACTIONS = ["DEPOSIT", "REMOVE"]
DIRECTORY_ACTIONS = ["MKDIR", "RMDIR", "SYMLINK", "00README"]


def decode_message_expr(body: Column | str) -> Column:
    """Dual-format decode → struct(datetime, filepath, action, filesize,
    message). Mirrors queue_handler.py:50-94 field-for-field:
    colon-split positional fallback re-joins fields 0-2 into datetime and
    6+ into message."""
    c = F.col(body) if isinstance(body, str) else body
    as_json = F.from_json(c, INGEST_MESSAGE_SCHEMA)
    parts = F.split(F.trim(c), ":")  # reference strips before splitting
    legacy = F.struct(
        F.concat_ws(":", F.slice(parts, 1, 3)).alias("datetime"),
        F.element_at(parts, 4).alias("filepath"),
        F.element_at(parts, 5).alias("action"),
        F.element_at(parts, 6).alias("filesize"),
        F.concat_ws(":", F.slice(parts, 7, 2147483647 - 7)).alias("message"),
    )
    # from_json yields a struct of nulls (not NULL) on partial garbage; a
    # JSON payload always contains a filepath, so key the fallback on it.
    return F.when(as_json.isNotNull() & as_json["filepath"].isNotNull(), as_json).otherwise(legacy)


def decode_messages(df: DataFrame, body_col: str = "body") -> DataFrame:
    """body string → flattened IngestMessage columns (reference A3)."""
    return df.withColumn("_msg", decode_message_expr(body_col)).select(
        *[c for c in df.columns if c != "_msg"], "_msg.*"
    )


def route_actions(df: DataFrame, action_col: str = "action") -> tuple[DataFrame, DataFrame]:
    """Split the stream into (files, directories) by action (reference A4).

    One pass each; at write time prefer a single pass with
    ``partitionBy(action)`` when both sinks share a format.
    """
    files = df.filter(F.col(action_col).isin(FILE_ACTIONS))
    dirs = df.filter(F.col(action_col).isin(DIRECTORY_ACTIONS))
    return files, dirs
