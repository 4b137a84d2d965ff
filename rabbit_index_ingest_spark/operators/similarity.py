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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


# ---------------- embedding near-dup (bucketed, never all-pairs) --------


def embedding_sketch(
    vectors: DataFrame,
    hyperplanes: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane sign-bit sketch per vector (SimHash for cosine):
    bit i = sign(v · h_i), folded into one int64. Arrow-batched matrix
    multiply — one ``X @ H.T`` per batch, no per-row Python."""
    n_bits = len(hyperplanes)
    H = np.asarray(hyperplanes, dtype=np.float64)
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), False),
            T.StructField("sketch", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        for batch in batches:
            X = np.array(batch[vec_col].tolist(), dtype=np.float64)
            bits = (X @ H.T) > 0  # (n, n_bits)
            sigs = (bits.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {key_col: batch[key_col].values, "sketch": sigs.view(np.int64)}
            )

    return vectors.select(key_col, vec_col).mapInPandas(run, out_schema)


def embedding_neardup_lsh(
    vectors: DataFrame,
    threshold: float = 0.95,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 64,
    n_chunks: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate embedding pairs WITHOUT an all-pairs join — the scale
    path the pairwise ``cosine_expr`` shape lacks (its ``l.vec_id <
    r.vec_id`` cross join is O(n²) at 100 TB):

      sign-bit sketch (random hyperplanes, seeded) → split into n_chunks
      chunk values → candidates = pairs agreeing on ≥1 chunk (pigeonhole:
      a miss needs every chunk to differ ⇒ Hamming ≥ n_chunks; at
      cos ≥ 0.95 the expected Hamming is ~0.10·n_bits ≈ 6.5 of 64, so
      16 chunks make misses vanishingly rare) → exact cosine verify.

    Output (a, b, cosine) with a < b — a verified subset of the all-pairs
    result, equal to it whenever no true pair is missed (asserted against
    the brute-force oracle on the fixture embeddings)."""
    dim = len(vectors.select(vec_col).first()[0])
    rs = np.random.RandomState(seed)
    H = rs.normal(size=(n_bits, dim))
    sk = embedding_sketch(vectors, H, key_col, vec_col)

    chunk_bits = n_bits // n_chunks
    mask = (1 << chunk_bits) - 1
    chunk_vals = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("sketch", c * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )
    tagged = sk.select(F.col(key_col), F.explode(chunk_vals).alias("cv")).select(
        key_col, "cv.chunk", "cv.chunk_val"
    )
    l, r = tagged.alias("l"), tagged.alias("r")
    cand = (
        l.join(r, ["chunk", "chunk_val"])
        .where(F.col(f"l.{key_col}") < F.col(f"r.{key_col}"))
        .select(
            F.col(f"l.{key_col}").alias("a"), F.col(f"r.{key_col}").alias("b")
        )
        .distinct()
    )
    va = vectors.select(F.col(key_col).alias("a"), F.col(vec_col).alias("_va"))
    vb = vectors.select(F.col(key_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------- IVF (inverted file) ----------------


def train_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    n_iter: int = 5,
    seed: int = 42,
    sample_target: int = 100_000,
    key_col: str = "vec_id",
) -> np.ndarray:
    """Distributed, deterministic Lloyd's k-means — vectors NEVER collect
    to the driver (only k×dim aggregates per iteration do).

    * Sample: deterministic hash predicate ``xxhash64(key, seed) % m == 0``
      sized to ~sample_target rows — unlike ``limit()`` (whose row choice
      depends on partition order) the sampled SET is a pure function of the
      keys, so any partitioning/cluster size trains on identical data.
    * Init: the k rows with the smallest ``xxhash64(key, seed)`` (global
      orderBy of a tiny top-k — TakeOrderedAndProject, no full sort).
    * Iterate: Arrow-batched nearest-centroid assignment (numpy argmin vs
      the broadcast centroid matrix) → per-bucket vector sums via
      posexplode + groupBy(bucket, dim) — k·dim rows to the driver.
    * Determinism under float reordering: partial sums combine in
      nondeterministic order, so centroids are rounded to 9 dp each
      iteration — assignments can only differ if a distance tie sits
      within ~1e-9, which the determinism test (varied partition counts)
      guards against.
    """
    n = vectors.count()
    mod = max(1, n // sample_target)
    sample = vectors.select(key_col, vec_col)
    if mod > 1:
        sample = sample.where(
            F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(mod)) == 0
        )
    sample = sample.persist()

    k = n_centroids
    init_rows = (
        sample.orderBy(F.xxhash64(F.col(key_col), F.lit(seed)), F.col(key_col))
        .limit(k)
        .collect()
    )
    cents = np.array([list(r[vec_col]) for r in init_rows], dtype=np.float64)
    k = len(cents)
    dim = cents.shape[1]

    assign_schema = T.StructType(
        [
            T.StructField("bucket", T.IntegerType(), False),
            T.StructField("vec", T.ArrayType(T.DoubleType()), False),
        ]
    )

    for _ in range(n_iter):
        C = np.round(cents, 9)

        def assign(batches: Iterator[pd.DataFrame], C=C) -> Iterator[pd.DataFrame]:
            c_sq = (C**2).sum(axis=1)
            for batch in batches:
                X = np.array(batch[vec_col].tolist(), dtype=np.float64)
                d = c_sq[None, :] - 2.0 * (X @ C.T)  # argmin-equivalent
                yield pd.DataFrame(
                    {"bucket": d.argmin(axis=1).astype(np.int32), "vec": list(X)}
                )

        assigned = sample.mapInPandas(assign, assign_schema)
        stats = (
            assigned.select(
                "bucket", F.posexplode("vec").alias("pos", "val")
            )
            .groupBy("bucket", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for row in stats:
            sums[row["bucket"], row["pos"]] = row["s"]
            counts[row["bucket"]] = row["n"]
        live = counts > 0
        cents[live] = sums[live] / counts[live, None]
    sample.unpersist()
    return np.round(cents, 9)


def train_centroids_local(
    pdf: pd.DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    n_iter: int = 5,
    seed: int = 42,
    sample_target: int = 100_000,
    key_col: str = "vec_id",
) -> np.ndarray:
    """Pure-numpy twin of ``train_centroids`` — identical centroids from a
    pandas frame, NO Spark. Exists so the s3 DuckDB oracle can obtain the
    (deterministic) codebook without a SparkSession: the sampling
    predicate and the init ordering reuse the driver-side xxhash64 twin
    (functions/hashing.py), and every float step mirrors the distributed
    trainer (same c_sq − 2·X@Cᵀ assignment, same per-iteration 9-dp
    rounding that absorbs summation-order differences). Exact equality
    with the Spark trainer is asserted in
    tests/test_training_ops.py::test_centroids_local_twin_matches_spark."""
    from ..functions.hashing import xxhash64_long_with_int_salt

    n = len(pdf)
    mod = max(1, n // sample_target)
    keys = pdf[key_col].to_numpy()
    h = np.array(
        [xxhash64_long_with_int_salt(int(kk), seed) for kk in keys],
        dtype=np.int64,
    )
    sel = np.ones(n, dtype=bool) if mod == 1 else (h % mod == 0)
    Xs = np.array(pdf.loc[sel, vec_col].tolist(), dtype=np.float64)
    hs, ks = h[sel], keys[sel]
    order = np.lexsort((ks, hs))[:n_centroids]
    cents = Xs[order].copy()
    k = len(cents)
    dim = cents.shape[1]
    for _ in range(n_iter):
        C = np.round(cents, 9)
        c_sq = (C**2).sum(axis=1)
        d = c_sq[None, :] - 2.0 * (Xs @ C.T)
        b = d.argmin(axis=1)
        sums = np.zeros((k, dim))
        np.add.at(sums, b, Xs)
        counts = np.bincount(b, minlength=k).astype(np.float64)
        live = counts > 0
        cents[live] = sums[live] / counts[live, None]
    return np.round(cents, 9)


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


def assign_buckets_arrow(
    vectors: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched nearest-centroid assignment: one ``X @ C.T`` matmul +
    argmin per batch. Same output as ``assign_buckets`` on tie-free
    inputs (asserted in tests over the fixture corpus); use it for large
    codebooks — the column-expression path builds C struct comparisons
    per row, which stops scaling past C≈64, while the matmul is flat in C
    up to thousands of centroids.

    Tie/rounding caveat: this path compares ``c_sq − 2·x·c`` (the
    ``x_sq`` term cancels in argmin) while the expression path sums full
    ``(x−c)²`` — algebraically equal, but under float rounding a vector
    *near-equidistant* (within ~1 ulp) from two centroids can be assigned
    different buckets, and exact ties break differently (argmin → lowest
    bucket; F.greatest → highest). Don't rely on cross-path bucket
    equality for adversarial inputs; for IVF recall both assignments are
    equally valid."""
    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C ** 2).sum(axis=1)
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), False),
            T.StructField(vec_col, T.ArrayType(T.FloatType()), True),
            T.StructField("bucket", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            X = np.array(batch[vec_col].tolist(), dtype=np.float64)
            d = c_sq[None, :] - 2.0 * (X @ C.T)  # argmin-equivalent distance
            yield pd.DataFrame(
                {
                    key_col: batch[key_col].values,
                    vec_col: batch[vec_col],
                    "bucket": d.argmin(axis=1).astype(np.int32),
                }
            )

    return vectors.select(key_col, vec_col).mapInPandas(run, out_schema)


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
