"""Phase-split scaling A/B harness (round-4 perf work).

Runs build_index + IndexStore.save as SEPARATELY TIMED phases at two
pinned parallelism levels (default 2 vs 8 cores) on the same tmpfs
corpus, interleaved, and reports per-phase minima and scaling
efficiencies. This is the iteration loop for the positional-build
scaling work: `bench.py --scaling` is the definitive protocol but takes
hours at 8.4M turns; this tool answers "which phase stopped scaling"
in minutes at a configurable corpus size.

Usage:
  python tools/scaling_ab.py --convs 300000 --reps 2 --positions 1 \
      [--conf spark.io.compression.codec=zstd] [--cpus 2,8]

Subprocess protocol mirrors bench.py --scaling exactly: taskset pinning
+ -XX:ActiveProcessorCount + tmpfs scratch + data-sized shuffle
partitions + untimed warm read of the text column.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(cpus: int, convs: int, positions: bool, confs: dict[str, str]) -> dict:
    import shutil
    import tempfile

    from bench import _corpus_parquet, _scratch_base
    from pyspark.sql import functions as F

    from rabbit_index_ingest_spark.index.build import build_index
    from rabbit_index_ingest_spark.index.store import IndexStore
    from rabbit_index_ingest_spark.session import get_spark

    est_occurrences = convs * 7 * 30
    shuffle_parts = max(64, min(1024, 1 << (est_occurrences // 1_000_000).bit_length()))
    extra = {
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cpus}",
        "spark.local.dir": f"{_scratch_base(True)}/local-{cpus}",
        **confs,
    }
    spark = get_spark(
        app_name=f"ab-{cpus}", cores=cpus,
        shuffle_partitions=shuffle_parts, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _corpus_parquet(spark, convs, quick=True)
    transcripts = spark.read.parquet(corpus)
    n_turns = transcripts.count()
    transcripts.select(F.max(F.length("text"))).collect()  # warm page cache

    idx_root = tempfile.mkdtemp(prefix="ab_idx_", dir=_scratch_base(True))
    t0 = time.time()
    built = build_index(spark, transcripts, positions=positions)
    t_build = time.time() - t0
    t0 = time.time()
    IndexStore(spark, idx_root).save(built, segment=0)
    t_save = time.time() - t0
    spark.stop()
    shutil.rmtree(idx_root, ignore_errors=True)
    return {
        "cpus": cpus,
        "n_turns": n_turns,
        "t_build": round(t_build, 2),
        "t_save": round(t_save, 2),
        "t_total": round(t_build + t_save, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=300_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--positions", type=int, default=1)
    ap.add_argument("--cpus", default="2,8")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--subprocess", type=int, default=None)
    args = ap.parse_args()
    confs = dict(c.split("=", 1) for c in args.conf)

    if args.subprocess is not None:
        res = run_one(args.subprocess, args.convs, bool(args.positions), confs)
        print("AB_RESULT " + json.dumps(res))
        return

    levels = [int(c) for c in args.cpus.split(",")]
    # pre-generate shared corpus at full parallelism
    from bench import _corpus_parquet
    from rabbit_index_ingest_spark.session import get_spark

    spark = get_spark(app_name="ab-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    _corpus_parquet(spark, args.convs, quick=True)
    spark.stop()

    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for rep in range(args.reps):
        for cpus in levels:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--subprocess", str(cpus),
                   "--convs", str(args.convs),
                   "--positions", str(args.positions)]
            for c in args.conf:
                cmd += ["--conf", c]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            t0 = time.time()
            out = subprocess.run(
                cmd, capture_output=True, text=True,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("AB_RESULT ")][-1]
            res = json.loads(line.removeprefix("AB_RESULT "))
            runs[cpus].append(res)
            print(f"[ab] rep{rep} cpus={cpus}: build={res['t_build']}s "
                  f"save={res['t_save']}s (wall {time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)

    lo, hi = levels[0], levels[-1]
    ratio = hi / lo
    summary = {"convs": args.convs, "positions": bool(args.positions),
               "confs": confs, "reps": args.reps}
    for phase in ("t_build", "t_save", "t_total"):
        a = min(r[phase] for r in runs[lo])
        b = min(r[phase] for r in runs[hi])
        summary[phase] = {
            f"n{lo}": a, f"n{hi}": b,
            "eff": round((a / b) / ratio, 3) if b else None,
        }
    summary["all"] = {str(c): rs for c, rs in runs.items()}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
