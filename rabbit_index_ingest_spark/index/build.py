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
        # block tf total — lets the dictionary be derived as a column-pruned
        # rollup of the blocks instead of a second tokenize+explode pass
        T.StructField("tf_sum", T.LongType(), False),
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
    df2, _ = assign_doc_ids_with_count(df, key_cols, num_partitions, persist, id_base)
    return df2


def assign_doc_ids_with_count(
    df: DataFrame,
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    persist: bool = True,
    id_base: int = 0,
) -> tuple[DataFrame, int]:
    """assign_doc_ids + the total row count (free — it is the final prefix
    offset), so callers don't need a separate count() job."""
    spark = df.sparkSession
    # partition count follows the shuffle-partitions conf (a data-size
    # knob), NOT the core count — the same job must produce the same
    # partitioning at any cluster size, and partitions must stay small
    # enough not to spill (size spark.sql.shuffle.partitions for the data)
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
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
    n_rows = acc - id_base
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

    return ranged.mapInPandas(number, out_schema), n_rows


_BLOCK_COLS = [f.name for f in BLOCKS_SCHEMA.fields]


def _pack_groups_frame(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Pack a frame holding ≥1 COMPLETE (term, range_id) groups of raw
    TOKEN OCCURRENCES, sorted by (term, range_id, doc_id).

    tf is computed here by run-length encoding the sorted doc_ids — this
    replaces a whole groupBy(term, doc) shuffle stage in the build (one
    shuffle instead of two)."""
    terms = pdf["term"].to_numpy()
    ranges = pdf["range_id"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    change = np.flatnonzero((terms[1:] != terms[:-1]) | (ranges[1:] != ranges[:-1])) + 1
    bounds = np.concatenate(([0], change, [len(pdf)]))
    rows: list[dict] = []
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        g_ids = ids[g0:g1]
        # run-length: occurrences of one doc are adjacent (sorted)
        starts = np.concatenate(
            ([0], np.flatnonzero(g_ids[1:] != g_ids[:-1]) + 1)
        )
        tfs = np.diff(np.concatenate((starts, [len(g_ids)])))
        u_ids = g_ids[starts]
        u_dls = dls[g0:g1][starts]
        blocks = codec.pack_group_blocks(u_ids, tfs, u_dls, block_size)
        term, range_id = terms[g0], int(ranges[g0])
        for blk in blocks:
            blk["term"] = term
            blk["range_id"] = range_id
        rows.extend(blocks)
    return pd.DataFrame(rows, columns=_BLOCK_COLS)


def _pack_stream_fn(block_size: int):
    """Streaming mapInPandas packer: consumes Arrow batches of tf rows
    sorted by (term, range_id, doc_id) within the partition, carrying the
    (possibly batch-spanning) trailing group over to the next batch.

    vs groupBy().applyInPandas: one pandas frame per ARROW BATCH instead of
    one per GROUP — per-group overhead collapses, which dominates build
    time (a 210k-turn corpus has ~77k groups)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for batch in batches:
            if carry is not None and len(carry):
                batch = pd.concat([carry, batch], ignore_index=True)
            if not len(batch):
                continue
            terms = batch["term"].to_numpy()
            ranges = batch["range_id"].to_numpy()
            change = (
                np.flatnonzero(
                    (terms[1:] != terms[:-1]) | (ranges[1:] != ranges[:-1])
                )
                + 1
            )
            if len(change) == 0:
                carry = batch  # batch is a single (possibly continuing) group
                continue
            last_start = int(change[-1])
            carry = batch.iloc[last_start:]
            yield _pack_groups_frame(batch.iloc[:last_start], block_size)
        if carry is not None and len(carry):
            yield _pack_groups_frame(carry, block_size)

    return run


def dictionary_from_blocks(postings: DataFrame) -> DataFrame:
    """Dictionary (term → df, cf, impacts) as a rollup of posting blocks.

    Reads only the five metadata columns — when the blocks come from
    parquet, column pruning means the (much larger) compressed byte columns
    are never touched. This replaces a second full tokenize+explode+groupBy
    pass over the corpus. NOTE: if ``postings`` is an unpersisted in-memory
    lineage, evaluating the dictionary recomputes the pack stage — persist
    postings (or write them, as IndexStore.save does) first.
    """
    return (
        postings.groupBy("term")
        .agg(
            F.sum("n_docs").alias("df"),
            F.sum("tf_sum").alias("cf"),
            F.max("max_tf").alias("max_tf"),
            F.min("min_dl").alias("min_dl"),
        )
        .withColumn("bucket", term_bucket_expr(F.col("term")))
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    id_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    block_size: int = codec.BLOCK_SIZE,
    range_bits: int = RANGE_BITS,
    id_base: int = 0,
    persist_postings: bool = True,
) -> BuiltIndex:
    """Build all four index tables from a transcript DataFrame.

    ``id_base`` offsets doc_ids (segment appends start above the existing
    max doc_id, SURVEY.md B7).

    Exactly ONE heavy pipeline pass runs over the corpus: tokenize →
    explode → tf groupBy → pack. n_docs falls out of the doc-id
    assignment's offset pass; the dictionary is a metadata rollup of the
    packed blocks; corpus stats (total tokens → avgdl) aggregate the
    dictionary. With ``persist_postings=True`` (default; right for corpora
    that fit the cluster's cache+spill) the blocks materialize once. At
    extreme scale pass False and let IndexStore.save sequence the
    postings-write before the dictionary rollup instead.
    """
    assigned, n_docs = assign_doc_ids_with_count(
        transcripts.select(id_col, order_col, text_col),
        key_cols=(id_col, order_col),
        id_base=id_base,
    )
    # docs (the ES _source analogue) carries dl so doc_stats is a pure
    # column-pruned projection of the written docs table — IndexStore.save
    # exploits this to avoid a second tokenize pass.
    docs = assigned.select(
        "doc_id",
        F.col(id_col).alias("conv_id"),
        F.col(order_col).alias("turn_idx"),
        F.col(text_col).alias("text"),
        F.size(tokens_expr(text_col)).alias("dl"),
    )

    toks = assigned.select(
        "doc_id",
        F.col(id_col).alias("conv_id"),
        F.col(order_col).alias("turn_idx"),
        tokens_expr(text_col).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))

    doc_stats = toks.select("doc_id", "conv_id", "turn_idx", "dl")

    # Raw token occurrences (term, doc_id, dl) — dl rides along (it is
    # functionally dependent on doc_id) so pack never joins doc_stats.
    occurrences = toks.select(
        "doc_id", "dl", F.explode("tokens").alias("term")
    ).withColumn("range_id", F.shiftright("doc_id", range_bits))

    # ONE shuffle for the whole postings build: repartition on
    # (term, range_id) + in-partition sort + streaming mapInPandas packer
    # (tf computed by run-length inside pack — no separate groupBy stage).
    # range_id is the deterministic anti-skew salt: a hot term spreads over
    # doc ranges, so no single shuffle partition can exceed ~2^range_bits
    # postings per term. Partition count = shuffle conf (data-size knob).
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    postings = (
        occurrences.repartition(nparts, "term", "range_id")
        .sortWithinPartitions("term", "range_id", "doc_id")
        .mapInPandas(_pack_stream_fn(block_size), BLOCKS_SCHEMA)
        .withColumn("bucket", term_bucket_expr(F.col("term")))
    )
    if persist_postings:
        postings = postings.persist()

    dictionary = dictionary_from_blocks(postings)

    total_tokens = int(
        dictionary.agg(F.sum("cf").alias("t")).collect()[0]["t"] or 0
    )
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    corpus_stats = spark.createDataFrame(
        [(n_docs, avgdl, total_tokens)],
        "n_docs long, avgdl double, total_tokens long",
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
