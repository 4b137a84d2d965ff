"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k, pure built-ins
  (``F.zip_with`` dot product + ``F.aggregate`` fold, float64) — the
  correctness baseline and the DuckDB-twin shape.
* ``ivf_topk`` — the scale path: IVF-style inverted-file search. Vectors
  are assigned to the nearest of C centroids at build; a query probes only
  the ``nprobe`` nearest centroid buckets (partition-pruned scan at 100 TB:
  bucket = storage partition). Exact within probed buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot_expr(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(a) -> F.Column:
    return F.sqrt(_dot_expr(a, a))


def cosine_expr(a, b) -> F.Column:
    """Cosine similarity of two array<float> columns, float64, 0 for zero-norm."""
    denom = _norm_expr(a) * _norm_expr(b)
    return F.when(denom > 0, _dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k. The scan is embarrassingly parallel;
    global merge is TakeOrderedAndProject — no shuffle of the vectors."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vectors.select(
            F.col(key_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(key_col))
        .limit(k)
    )


# ---------------- IVF (inverted file) ----------------


def train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    n_iter: int = 5,
    seed: int = 42,
    sample_limit: int = 100_000,
) -> np.ndarray:
    """Driver-side k-means on a bounded sample (Lloyd's, deterministic
    seed). Centroids are tiny (C × dim) — broadcast to assignment."""
    sample = np.array(
        [r[0] for r in vectors.select(vec_col).limit(sample_limit).collect()],
        dtype=np.float64,
    )
    rs = np.random.RandomState(seed)
    cents = sample[rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def assign_buckets(
    vectors: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid bucket per vector — pure column expressions over a
    broadcast literal centroid array (no UDF): argmin over C distances."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = F.greatest(
        *[
            F.struct(
                (-F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )).alias("neg_dist"),
                F.lit(i).alias("bucket"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return vectors.select(F.col(key_col), F.col(vec_col), best["bucket"].alias("bucket"))


def ivf_topk(
    bucketed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest buckets only — at scale this is a
    partition-pruned scan (bucket is the storage partition column)."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d)[:nprobe]]
    return cosine_topk(
        bucketed.where(F.col("bucket").isin(probes)), query_vec, k, key_col, vec_col
    )
