"""Interleaved A/B: the FULL query family with AQE on vs off.

Built to audit the (since-reverted) AQE-off session default, which had
been justified with an A/B over the block-max scorer paths, build and
save only; this harness covers the decode-everything DataFrame twins and
the bool/query_string combine too. Verdict at sf0.1/32 cores: a wash —
the decision between defaults is made by the SCALING-size build A/B
(session.py comment), not by this query-side one.

Each arm is a fresh subprocess (fresh JVM): build+save once into a shared
store dir, then each rep loads the store and times every query min-of-3
warm. Arms alternate.

Usage: python tools/aqe_query_ab.py [n_reps_per_arm]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE = "/tmp/aqe_qab_store"

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from rabbit_index_ingest_spark.session import get_spark
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.index.store import IndexStore
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.datagen import VOCAB

n_conv = 30000
est_occ = n_conv * 7 * 30
shuffle = max(64, min(1024, 1 << (est_occ // 1_000_000).bit_length()))
spark = get_spark(app_name="aqe-qab", cores=32, shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")
store = IndexStore(spark, %(store)r)
if not os.path.exists(%(store)r + "/corpus_stats"):
    t = spark.read.parquet("/tmp/bench_transcripts_30000")
    store.save(build_index(spark, t), segment=0)
L = store.load()
s = Searcher(spark, L.postings, L.dictionary, L.n_docs, L.avgdl)
s.topk_blockmax(VOCAB[0], 10).collect()  # warm

Q = {
    "q_bmw_hot": lambda: s.topk_blockmax(VOCAB[0], 10),
    "q_bmw_mix": lambda: s.topk_blockmax(f"{VOCAB[0]} {VOCAB[120]} {VOCAB[3500]}", 10),
    "q_phrase_hot": lambda: s.topk_phrase(f"{VOCAB[0]} {VOCAB[1]}", 10),
    "q_near_hot": lambda: s.topk_near(f"{VOCAB[0]} {VOCAB[1]}", 10, gap=4),
    "q_slop_hot": lambda: s.topk_phrase(f"{VOCAB[0]} {VOCAB[1]}", 10, slop=2),
    "q_dataframe": lambda: s.topk_dataframe("karo tenro solda", 10),
    "q_phrase_hot_df": lambda: s.topk_phrase_dataframe(f"{VOCAB[0]} {VOCAB[1]}", 10),
    "q_near_hot_df": lambda: s.topk_near_dataframe(f"{VOCAB[0]} {VOCAB[1]}", 10, gap=4),
    "q_and_mix_df": lambda: s.topk_and(f"{VOCAB[0]} {VOCAB[120]} {VOCAB[3500]}", 10),
    "q_bool_mix": lambda: s.bool_query(
        must=[{"match": {"query": VOCAB[0]}}],
        should=[
            {"match_phrase": {"query": f"{VOCAB[0]} {VOCAB[1]}"}},
            {"match": {"query": VOCAB[120], "boost": 2.0}},
        ],
        must_not=[{"match": {"query": VOCAB[3500]}}],
        k=10,
    ),
    "q_query_string": lambda: s.topk_query_string(
        f'+{VOCAB[0]} "{VOCAB[0]} {VOCAB[1]}" {VOCAB[120]} -{VOCAB[3500]}', 10
    ),
}
out = {}
for name, fn in Q.items():
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); fn().collect(); best = min(best, time.time() - t0)
    out[name] = round(best, 3)
print("CHILD_RESULT " + json.dumps(out))
spark.stop()
"""


def run_rep(aqe: bool) -> dict:
    env = dict(os.environ)
    # set the knob EXPLICITLY for both arms (the session default is on;
    # an unset variable would make the "off" arm identical to "on")
    env["SPARK_GRAFT_AQE"] = "1" if aqe else "0"
    p = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "store": STORE}],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"no result (rc={p.returncode}):\n{p.stderr[-2000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    res: dict[str, list[dict]] = {"on": [], "off": []}
    for i in range(n):
        for arm, aqe in (("on", True), ("off", False)):
            r = run_rep(aqe)
            res[arm].append(r)
            print(f"rep {i} aqe_{arm}: {r}", flush=True)
    keys = res["on"][0].keys()
    print(f"{'query':18s} {'on(min)':>8s} {'off(min)':>9s}")
    for k in keys:
        on = min(x[k] for x in res["on"])
        off = min(x[k] for x in res["off"])
        print(f"{k:18s} {on:8.3f} {off:9.3f}")


if __name__ == "__main__":
    main()
