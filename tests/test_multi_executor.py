"""Multi-executor smoke: the whole build→query path on local-cluster[2,2]
— two REAL executor JVMs with netty shuffle and the package shipped via
addPyFile (the in-process `spark-submit --py-files` analogue, north rule
"run on a multi-executor cluster"). Run in a subprocess because
getOrCreate() would otherwise return the session fixture's local-mode
session instead of a local-cluster one.
"""

import os
import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from rabbit_index_ingest_spark.session import get_spark
from rabbit_index_ingest_spark.datagen import transcripts_df
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.query import Searcher

spark = get_spark(app_name="lc-smoke", master="local-cluster[2,2,2048]",
                  shuffle_partitions=8,
                  extra_conf={{"spark.driver.memory": "4g"}})
spark.sparkContext.setLogLevel("ERROR")
t = transcripts_df(spark, n_conv=100)
built = build_index(spark, t)
s = Searcher(spark, built.postings, built.dictionary, built.n_docs, built.avgdl)
fast = [(r["doc_id"], round(r["score"], 6))
        for r in s.topk_blockmax("karo tenro", 10).collect()]
ref = [(r["doc_id"], round(r["score"], 6))
       for r in s.topk_dataframe("karo tenro", 10).collect()]
assert fast == ref and len(fast) == 10, (fast, ref)
print("LC_SMOKE_OK")
spark.stop()
"""


def test_build_and_query_on_two_real_executors():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "LC_SMOKE_OK" in out.stdout, out.stderr[-2000:]
