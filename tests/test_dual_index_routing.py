"""B8: two-index routing — the reference writes files events to ceda-fbi
and directory events to ceda-dirs (README.md:5-7). Our analogue: route
doc classes to separate IndexStore roots, each independently queryable."""

from pyspark.sql import functions as F

from rabbit_index_ingest_spark.datagen import transcripts_df
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.index.store import IndexStore


def test_route_roles_into_two_indices(spark, tmp_path):
    t = transcripts_df(spark, n_conv=25).persist()
    # routing split (A4 shape): user/assistant turns vs tool turns
    convo = t.where(F.col("role").isin("user", "assistant"))
    tools = t.where(F.col("role") == "tool")

    stores = {}
    for name, df in (("convo", convo), ("tools", tools)):
        root = str(tmp_path / name)
        IndexStore(spark, root).save(build_index(spark, df), segment=0)
        stores[name] = IndexStore(spark, root).load()

    n_tools = tools.count()
    assert stores["convo"].n_docs == t.count() - n_tools
    assert stores["tools"].n_docs == n_tools

    # each index answers queries over ONLY its doc class
    searchers = {
        k: Searcher(spark, L.postings, L.dictionary, L.n_docs, L.avgdl)
        for k, L in stores.items()
    }
    hits_convo = (
        searchers["convo"]
        .fetch_topk("karo", 50, stores["convo"].docs)
        .join(t.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"])
        .collect()
    )
    assert hits_convo and all(r["role"] in ("user", "assistant") for r in hits_convo)
    hits_tools = (
        searchers["tools"]
        .fetch_topk("karo", 50, stores["tools"].docs)
        .join(t.select("conv_id", "turn_idx", "role"), ["conv_id", "turn_idx"])
        .collect()
    )
    assert hits_tools and all(r["role"] == "tool" for r in hits_tools)
