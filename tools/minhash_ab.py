"""Interleaved A/B of the minhash base-hash kernel (round-6 change):

  A (old): per-SHINGLE Python — " ".join window strings + hashlib.md5 per
           shingle occurrence (the round-5 verdict's flagged loop);
  B (new): vocab-only md5 + vectorized polynomial shingle combine
           (the kernel now inside operators.dedup._minhash_fast).

Pure pandas/numpy (no Spark) over the sf dir's documents — isolates the
kernel the verdict flagged. Arms alternate A,B,A,B,... per round so host
drift hits both equally. Prints one JSON line.

Usage: python tools/minhash_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rabbit_index_ingest_spark.analysis import _PY_TOKEN_RE, py_tokenize
from rabbit_index_ingest_spark.operators.dedup import _SHINGLE_P

K = 3


def kernel_old(texts: pd.Series) -> np.ndarray:
    sh_all = []
    for text in texts.tolist():
        toks = py_tokenize(text)
        sh_all.extend(
            " ".join(toks[i : i + K]) for i in range(len(toks) - K + 1)
        )
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
            for s in sh_all
        ),
        dtype=np.uint64,
        count=len(sh_all),
    )


def kernel_new(texts: pd.Series) -> np.ndarray:
    toks = texts.fillna("").str.lower().str.findall(_PY_TOKEN_RE)
    n_tok = toks.str.len().to_numpy(np.int64)
    n_sh = np.maximum(n_tok - (K - 1), 0)
    bounds = np.concatenate(([0], np.cumsum(n_sh)))
    total = int(bounds[-1])
    if not total:
        return np.empty(0, dtype=np.uint64)
    flat = toks.explode().dropna()
    codes, vocab = pd.factorize(flat.to_numpy(), sort=False)
    vh = np.fromiter(
        (int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big") for v in vocab),
        dtype=np.uint64,
        count=len(vocab),
    )
    th = vh[codes]
    tb = np.concatenate(([0], np.cumsum(n_tok)))
    doc_of = np.repeat(np.arange(len(texts)), n_sh)
    starts = tb[doc_of] + (np.arange(total) - bounds[doc_of])
    sh = np.zeros(total, dtype=np.uint64)
    for j in range(K):
        sh = sh * _SHINGLE_P + th[starts + j]
    return sh


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    np.seterr(over="ignore")
    # warmup both
    kernel_old(texts.head(50))
    kernel_new(texts.head(50))
    ta, tb_ = [], []
    n_sh = 0
    for _ in range(rounds):
        t0 = time.perf_counter()
        a = kernel_old(texts)
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        b = kernel_new(texts)
        tb_.append(time.perf_counter() - t0)
        assert len(a) == len(b), "kernels disagree on shingle count"
        n_sh = len(b)
    out = {
        "metric": "minhash_base_hash_kernel",
        "sf_dir": sf_dir,
        "n_docs": int(len(texts)),
        "n_shingles": n_sh,
        "old_per_shingle_md5_s": round(min(ta), 4),
        "new_vocab_poly_s": round(min(tb_), 4),
        "speedup": round(min(ta) / min(tb_), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
