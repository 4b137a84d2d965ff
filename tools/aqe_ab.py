"""Interleaved A/B: build+save with AQE on vs off (SPARK_GRAFT_AQE knob).

Each rep is a fresh subprocess (fresh JVM) so JIT state cannot leak
between arms; arms alternate so host drift hits both equally.

Usage: python tools/aqe_ab.py [n_reps_per_arm]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, tempfile, shutil
sys.path.insert(0, %(repo)r)
from rabbit_index_ingest_spark.session import get_spark
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.store import IndexStore

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_conv = 30000
est_occ = n_conv * 7 * 30
shuffle = max(64, min(1024, 1 << (est_occ // 1_000_000).bit_length()))
spark = get_spark(app_name="aqe-ab", cores=32, shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")
corpus = "/tmp/bench_transcripts_%%d" %% n_conv
if not os.path.exists(corpus + "/_SUCCESS"):
    from rabbit_index_ingest_spark.datagen import transcripts_df
    transcripts_df(spark, n_conv=n_conv, partitions=32).write.mode(
        "overwrite").parquet(corpus)
t = spark.read.parquet(corpus)
t.count()
from pyspark.sql import functions as F
t.select(F.max(F.length("text"))).collect()
out = {}
idx = tempfile.mkdtemp(prefix="aqe_ab_")
t0 = time.time(); built = build_index(spark, t); out["build_core"] = time.time() - t0
t0 = time.time(); IndexStore(spark, idx + "/i").save(built, segment=0); out["save"] = time.time() - t0
shutil.rmtree(idx, ignore_errors=True)
print("CHILD_RESULT " + json.dumps(out))
spark.stop()
"""


def run_rep(aqe: bool) -> dict:
    env = dict(os.environ)
    # set the knob EXPLICITLY for both arms (the session default is on;
    # an unset variable would make the "off" arm identical to "on")
    env["SPARK_GRAFT_AQE"] = "1" if aqe else "0"
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"no result (rc={p.returncode}):\n{p.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res: dict[str, list[dict]] = {"aqe_on": [], "aqe_off": []}
    for i in range(n):
        for arm, aqe in (("aqe_on", True), ("aqe_off", False)):
            r = run_rep(aqe)
            res[arm].append(r)
            print(f"rep {i} {arm}: {r}", flush=True)
    for arm in res:
        for k in ("build_core", "save"):
            vals = sorted(x[k] for x in res[arm])
            print(f"{arm} {k}: min={vals[0]:.2f} med={vals[len(vals)//2]:.2f} all={[round(v,2) for v in vals]}")


if __name__ == "__main__":
    main()
