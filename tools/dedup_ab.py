"""Interleaved A/B for the dedup_lsh regression (round-4 verdict item 1).

dedup_lsh read 12.4 s in BENCH_r04 vs 5.6 s in r03. Two things changed
between those readings: the session-wide ``spark.io.compression.codec=zstd``
(session.py) and the host (this box's delivered CPU varies ~2.5-3.5x between
sessions — BENCH/BASELINE.md caveat). This tool separates them the only
honest way available: ``spark.io.compression.codec`` is fixed at JVM start,
so each arm runs in its own subprocess and the ARMS are interleaved
(zstd, lz4, zstd, lz4, ...) within one wall-clock window, several timed
reps per subprocess, min-of-reps per arm reported. The parquet codec is
PINNED to zstd in both arms so the comparison isolates the shuffle/spill
codec alone (the scaling-gate win came from BOTH zstd parquet and the
one-int64 positional row; only the shuffle codec is on trial here).

Workload = bench.py's dedup_lsh verbatim: monotonically_increasing_id +
minhash_signatures(n_hashes=16) + lsh_candidate_pairs().count() over the
sf transcript corpus. Each subprocess also times a ``shuffle_only`` variant
(signatures persisted first) so the codec effect on the collect_list
shuffle is visible without the fixed numpy minhash cost diluting it.

Usage: python tools/dedup_ab.py [sf_dir] [rounds] [reps_per_proc]
       (defaults /root/testdata/sf0.1, 3, 2)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONV = {"sf0.001": 300, "sf0.01": 3000, "sf0.1": 30000}


def _corpus(spark, sf_dir: str) -> str:
    """Same deterministic transcript corpus bench.py uses (cached in /tmp)."""
    n_conv = N_CONV.get(os.path.basename(sf_dir.rstrip("/")), 3000)
    path = f"/tmp/bench_transcripts_{n_conv}"
    if not os.path.exists(path + "/_SUCCESS"):
        from rabbit_index_ingest_spark.datagen import transcripts_df

        transcripts_df(spark, n_conv=n_conv, partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def subproc(codec: str, sf_dir: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from rabbit_index_ingest_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from rabbit_index_ingest_spark.session import get_spark

    spark = get_spark(
        app_name=f"dedup-ab-{codec}",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.io.compression.codec": codec,
            # pin parquet codec so only shuffle/spill IO differs between arms
            "spark.sql.parquet.compression.codec": "zstd",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(_corpus(spark, sf_dir))
    transcripts.select(F.max(F.length("text"))).collect()  # warm page cache

    def full_run() -> float:
        docs = transcripts.select(
            F.monotonically_increasing_id().alias("doc_id"), F.col("text")
        )
        t0 = time.time()
        lsh_candidate_pairs(minhash_signatures(docs, n_hashes=16)).count()
        return time.time() - t0

    full_run()  # untimed warmup (Arrow/py worker init)
    full = [round(full_run(), 3) for _ in range(reps)]

    # shuffle-only variant: signatures precomputed+persisted, so the timed
    # section is the collect_list groupBy shuffle + in-bucket pair gen
    docs = transcripts.select(
        F.monotonically_increasing_id().alias("doc_id"), F.col("text")
    )
    sigs = minhash_signatures(docs, n_hashes=16).persist()
    sigs.count()
    shuffle_only = []
    for _ in range(reps):
        t0 = time.time()
        lsh_candidate_pairs(sigs).count()
        shuffle_only.append(round(time.time() - t0, 3))
    print(
        "SUBPROC_RESULT "
        + json.dumps({"codec": codec, "full": full, "shuffle_only": shuffle_only})
    )
    spark.stop()


def main() -> None:
    if "--subprocess" in sys.argv:
        i = sys.argv.index("--subprocess")
        subproc(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]))
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    results: dict[str, dict[str, list[float]]] = {
        c: {"full": [], "shuffle_only": []} for c in ("zstd", "lz4")
    }
    for _ in range(rounds):
        for codec in ("zstd", "lz4"):  # interleaved within one window
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--subprocess",
                 codec, sf_dir, str(reps)],
                capture_output=True, text=True, check=True,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("SUBPROC_RESULT ")][-1]
            r = json.loads(line.removeprefix("SUBPROC_RESULT "))
            results[codec]["full"].extend(r["full"])
            results[codec]["shuffle_only"].extend(r["shuffle_only"])

    summary = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "reps_per_proc": reps,
        **{
            f"{c}_{k}": v
            for c, d in results.items()
            for k, v in (
                (f"secs", d["full"]),
                (f"min", min(d["full"])),
                (f"shuffle_secs", d["shuffle_only"]),
                (f"shuffle_min", min(d["shuffle_only"])),
            )
        },
    }
    summary["full_ratio_zstd_over_lz4"] = round(
        min(results["zstd"]["full"]) / min(results["lz4"]["full"]), 3
    )
    summary["shuffle_ratio_zstd_over_lz4"] = round(
        min(results["zstd"]["shuffle_only"]) / min(results["lz4"]["shuffle_only"]), 3
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
