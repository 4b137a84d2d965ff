"""Within-session interleaved A/B for ann_cosine (round-3 verdict item 6).

ann_cosine read 1.12 s in BENCH_r03 vs 0.46 s in r02 with UNCHANGED code;
this host's delivered CPU varies ~2.5x between sessions, so cross-round
wall-clock is weak evidence. Protocol (BENCH/BASELINE.md): interleave the
suspect workload with a fixed reference workload in ONE session, several
reps, report mins — if ann's min lands back near the r2 number while the
reference holds its own band, the r3 reading was host state, not a
regression.

Usage: python tools/ann_ab.py [sf_dir] [reps]   (defaults sf0.1, 5)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from rabbit_index_ingest_spark.operators.similarity import cosine_topk
    from rabbit_index_ingest_spark.session import get_spark

    spark = get_spark(app_name="ann-ab", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb = emb.persist()
    n = emb.count()  # warm the cache so every rep sees the same input state
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]

    # reference workload: a fixed narrow aggregation over the same table —
    # tracks host speed without sharing ann's exact plan
    def ref_job() -> None:
        emb.select(F.sum(F.element_at("embedding", 1))).collect()

    ann_times, ref_times = [], []
    cosine_topk(emb, qvec, 10).collect()  # untimed warmup (Arrow/py init)
    for _ in range(reps):
        t0 = time.time()
        cosine_topk(emb, qvec, 10).collect()
        ann_times.append(round(time.time() - t0, 3))
        t0 = time.time()
        ref_job()
        ref_times.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "n_embeddings": n,
                "ann_cosine_secs": ann_times,
                "ann_cosine_min": min(ann_times),
                "ref_agg_secs": ref_times,
                "ref_agg_min": min(ref_times),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
