"""Inverted-index build (SURVEY.md §2.2 B2-B4, §3.4 BUILD).

Pipeline (shuffles marked *):

  scan transcripts (column-pruned to conv_id, turn_idx, text)
    → assign dense doc_id            *repartitionByRange(conv_id, turn_idx)
    → tokenize (JVM regexp, codegen) — analysis.tokens_expr
    → doc_stats / corpus_stats       (side aggregation)
    → explode → tf per (term, doc)   *groupBy(term, doc_id) — high-cardinality
                                      key ⇒ no skew; partial agg map-side
    → pack blocks per (term, range)  *groupBy(term, range_id) applyInPandas —
                                      range_id = doc_id >> RANGE_BITS is the
                                      deterministic "salt": a hot term is
                                      split across ranges, bounding any one
                                      group to ≤ 2^RANGE_BITS postings
                                      (SURVEY.md §4.2 hot-term skew)

Blocks are *self-contained* (doc gaps + tf + dl, all varbyte): the query
path never joins doc_stats — at 10^12 docs that join would be the dominant
shuffle. Cost: ~1-2 bytes/posting extra vs Lucene's separate norms file.

Replaces: the reference's per-message dict build + ES bulk index
(rabbit_indexer/index_updaters/base.py:102-109 routing into
ceda_elasticsearch_tools bulk writes; tokenization/indexing itself lived in
Elasticsearch 7.9.1, which this module re-implements natively).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis import tokens_expr
from . import codec

# Docs per BMW scoring range; blocks never span a range boundary.
RANGE_BITS = 16

N_TERM_BUCKETS = 64  # storage partition count for term-pruned scans

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("range_id", T.LongType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("tf_bytes", T.BinaryType(), False),
        T.StructField("dl_bytes", T.BinaryType(), False),
        # Lucene-style *impacts*: the block's max tf and min dl give an
        # upper bound idf·tf_norm(max_tf, min_dl, avgdl) on any doc's
        # contribution that stays valid when avgdl/df drift under
        # incremental segment appends (B7) — unlike a precomputed score.
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("min_dl", T.LongType(), False),
    ]
)


@dataclass
class BuiltIndex:
    """The four index tables (SURVEY.md §1.2: replaces ceda-fbi/ceda-dirs)."""

    docs: DataFrame  # doc_id, conv_id, turn_idx  (+passthrough cols)
    doc_stats: DataFrame  # doc_id, conv_id, turn_idx, dl
    corpus_stats: DataFrame  # n_docs, avgdl, total_tokens
    dictionary: DataFrame  # term, df, cf, max_tf_norm, bucket
    postings: DataFrame  # BLOCKS_SCHEMA + bucket
    n_docs: int = 0
    avgdl: float = 0.0


def term_bucket_expr(col) -> F.Column:
    """Storage bucket for a term — enables partition-pruned query scans."""
    return F.pmod(F.xxhash64(col), F.lit(N_TERM_BUCKETS)).cast("int")


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    persist: bool = True,
    id_base: int = 0,
) -> DataFrame:
    """Dense, stable int64 doc_id in (conv_id, turn_idx) order.

    Two-pass zipWithIndex-on-DataFrame without a single-partition sort
    (SURVEY.md §4.2): range-partition on the key, count rows per partition
    (tiny job), then number rows per partition and add the broadcast prefix
    offset inside mapInPandas. The input is persisted between the two passes
    so both see identical partitioning. doc_id order is isomorphic to
    (conv_id, turn_idx) order — the engine's tie-break therefore matches the
    oracle's (score desc, conv_id asc, turn_idx asc).
    """
    spark = df.sparkSession
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(nparts, *key_cols).sortWithinPartitions(*key_cols)
    if persist:
        ranged = ranged.persist()
    counts = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    sizes = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = id_base
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    boffsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(df.schema.fields)
    )

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        base = boffsets.value.get(pid, 0)
        seen = 0
        for batch in batches:
            n = len(batch)
            batch = batch.copy()
            batch.insert(0, "doc_id", np.arange(base + seen, base + seen + n, dtype=np.int64))
            seen += n
            yield batch

    return ranged.mapInPandas(number, out_schema)


def _pack_group_fn(block_size: int):
    """applyInPandas packer for one (term, range_id) group."""

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, range_id = key
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        rows = []
        for b0 in range(0, len(ids), block_size):
            b1 = min(b0 + block_size, len(ids))
            rows.append(
                {
                    "term": term,
                    "range_id": int(range_id),
                    "block_id": b0 // block_size,
                    "first_doc": int(ids[b0]),
                    "last_doc": int(ids[b1 - 1]),
                    "n_docs": b1 - b0,
                    "doc_bytes": codec.varbyte_encode(codec.delta_encode(ids[b0:b1])),
                    "tf_bytes": codec.varbyte_encode(tfs[b0:b1].astype(np.uint64)),
                    "dl_bytes": codec.varbyte_encode(dls[b0:b1].astype(np.uint64)),
                    "max_tf": int(tfs[b0:b1].max()),
                    "min_dl": int(dls[b0:b1].min()),
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    return pack


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    id_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    block_size: int = codec.BLOCK_SIZE,
    range_bits: int = RANGE_BITS,
    id_base: int = 0,
) -> BuiltIndex:
    """Build all four index tables from a transcript DataFrame.

    ``id_base`` offsets doc_ids (segment appends start above the existing
    max doc_id, SURVEY.md B7).
    """
    docs = assign_doc_ids(
        transcripts.select(id_col, order_col, text_col),
        key_cols=(id_col, order_col),
        id_base=id_base,
    )

    toks = docs.select(
        "doc_id",
        F.col(id_col).alias("conv_id"),
        F.col(order_col).alias("turn_idx"),
        tokens_expr(text_col).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))

    doc_stats = toks.select("doc_id", "conv_id", "turn_idx", "dl")

    stats_row = doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"] or 0.0)
    corpus_stats = spark.createDataFrame(
        [(n_docs, avgdl, int(stats_row["total_tokens"] or 0))],
        "n_docs long, avgdl double, total_tokens long",
    )

    # tf per (term, doc). dl rides along in the grouping key — it is
    # functionally dependent on doc_id, so this costs nothing and saves the
    # doc_stats join that pack would otherwise need.
    tf = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )

    tf_ranged = tf.withColumn("range_id", F.shiftright("doc_id", range_bits))

    postings = (
        tf_ranged.groupBy("term", "range_id")
        .applyInPandas(_pack_group_fn(block_size), BLOCKS_SCHEMA)
        .withColumn("bucket", term_bucket_expr(F.col("term")))
    )

    dictionary = (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
            F.min("dl").alias("min_dl"),
        )
        .withColumn("bucket", term_bucket_expr(F.col("term")))
    )

    return BuiltIndex(
        docs=docs,
        doc_stats=doc_stats,
        corpus_stats=corpus_stats,
        dictionary=dictionary,
        postings=postings,
        n_docs=n_docs,
        avgdl=avgdl,
    )
