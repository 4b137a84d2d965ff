"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2, seed=42).

One row = one conversation turn = one document — the transcript turn plays
the role the filesystem-event message plays in the reference
(rabbit_indexer/queue_handler/queue_handler.py:30 — one message, one doc).

Generation is *distributed and partition-invariant*: every value is a pure
function of (conv_id, turn_idx) and the global seed, computed inside
``mapInPandas`` over ``spark.range(n_conv)``. Re-running at any parallelism
yields byte-identical tables — the property the resume/idempotence tests
lean on.

Zipf-distributed vocabulary (~5k terms, s≈1.1) builds hot-term skew in by
construction; sentinel phrases are planted in deterministic rows for golden
queries; ~1% empty strings and a sprinkle of unicode/emoji rows mirror the
reference's encoding edge-case tests (tests/test_path_tools.py:117-125).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

SENTINELS = [
    "zephyr quantum lattice",
    "obsidian falcon manifest",
    "cerulean tensor harvest",
    "granite ember protocol",
]
UNICODE_SNIPPET = "café naïve 東京 résumé 😀 Ωmega"
TOOLS = ["bash", "search", "browser"]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _vocab() -> list[str]:
    """Deterministic pseudo-word vocabulary. Index 0 = hottest term."""
    syl = ["ka", "ro", "mi", "ten", "sol", "ver", "da", "lu", "pex", "tor",
           "gan", "li", "mos", "ara", "vek", "zu", "nor", "fi", "hal", "qued"]
    words = []
    i = 0
    while len(words) < VOCAB_SIZE:
        a, b, c = syl[i % 20], syl[(i // 20) % 20], syl[(i // 400) % 20]
        words.append(a + b + (c if i >= 400 else ""))
        i += 1
    return words


VOCAB = _vocab()


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    weights = ranks ** (-ZIPF_S)
    return np.cumsum(weights / weights.sum())


_ZIPF_CDF = _zipf_cdf()


def _turns_for_conv(conv_i: int) -> int:
    """Deterministic turns-per-conversation in [2, 12]."""
    return 2 + (conv_i * 2654435761 % 11)


def _gen_conv_rows(conv_i: int) -> list[dict]:
    conv_id = f"conv-{conv_i:08d}"
    n_turns = _turns_for_conv(conv_i)
    rs = np.random.RandomState((SEED * 1_000_003 + conv_i) % (2**31 - 1))
    rows = []
    for turn in range(n_turns):
        is_tool = rs.random_sample() < 0.10
        role = "tool" if is_tool else ("user" if turn % 2 == 0 else "assistant")
        r = rs.random_sample()
        if r < 0.01:
            text = ""
        else:
            n_tok = 5 + int(rs.random_sample() * 116)  # 5..120
            idx = np.searchsorted(_ZIPF_CDF, rs.random_sample(n_tok))
            text = " ".join(VOCAB[j] for j in idx)
            marker = (conv_i * 31 + turn) % 211
            if marker < len(SENTINELS):
                text = text + " " + SENTINELS[marker]
            if (conv_i * 31 + turn) % 509 == 7:
                text = text + " " + UNICODE_SNIPPET
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn,
                "role": role,
                "text": text,
                "tool": TOOLS[turn % 3] if is_tool else None,
                "ts": pd.Timestamp(BASE_TS) + pd.Timedelta(seconds=conv_i * 900 + turn * 13),
            }
        )
    return rows


def transcripts_df(spark: SparkSession, n_conv: int = 200, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic transcript table (~7·n_conv turns)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: list[dict] = []
            for conv_i in batch["id"].tolist():
                out.extend(_gen_conv_rows(int(conv_i)))
            if out:
                yield pd.DataFrame(out)

    parts = partitions or max(2, min(64, n_conv // 32 or 2))
    return spark.range(0, n_conv, numPartitions=parts).mapInPandas(gen, TRANSCRIPT_SCHEMA)


def transcripts_pandas(n_conv: int = 200) -> pd.DataFrame:
    """Driver-side twin of transcripts_df for the pure-Python oracle."""
    rows: list[dict] = []
    for conv_i in range(n_conv):
        rows.extend(_gen_conv_rows(conv_i))
    return pd.DataFrame(rows)


def fixture_queries() -> list[dict]:
    """The fixed reference query set (FIXTURES.md §2): q-001..q-050."""
    qs: list[dict] = []

    def add(text: str, k: int = 10) -> None:
        qs.append({"query_id": f"q-{len(qs) + 1:03d}", "query_text": text, "k": k})

    # single hot terms (vocab rank 0..4)
    for i in range(5):
        add(VOCAB[i])
    # single rare terms
    for i in (4200, 4500, 4890, 4999):
        add(VOCAB[i])
    # 2-4 term conjunctions mixing hot and rare
    rs = np.random.RandomState(SEED)
    for n in (2, 2, 3, 3, 4, 4, 2, 3):
        idx = rs.randint(0, VOCAB_SIZE, size=n)
        add(" ".join(VOCAB[j] for j in idx))
    # sentinel phrases
    for s in SENTINELS:
        add(s)
    # unicode
    add("café")
    add("東京")
    # absent term → empty result
    add("qqqabsenttermqqq")
    # empty query
    add("")
    # varied k
    add(VOCAB[0], k=1)
    add(VOCAB[1], k=100)
    add(VOCAB[4300], k=1)
    # pad to 50 with more conjunctions
    while len(qs) < 50:
        idx = rs.randint(0, VOCAB_SIZE, size=2 + len(qs) % 3)
        add(" ".join(VOCAB[j] for j in idx))
    return qs
