"""End-to-end: build index on synthetic transcripts, both query paths must be
rank- and score-identical (6 dp) to the pure-Python oracle — the north-rule
acceptance test (SURVEY.md §5.2 item 1), modeled on the reference's
golden-output style (tests/test_directory_updates.py:70-91)."""

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.datagen import (
    fixture_queries,
    transcripts_df,
    transcripts_pandas,
)
from rabbit_index_ingest_spark.index.build import build_index
from rabbit_index_ingest_spark.index.query import Searcher
from rabbit_index_ingest_spark.oracle import OracleIndex

N_CONV = 120  # ≈ 800 turns — correctness scale


@pytest.fixture(scope="module")
def corpus(spark):
    tdf = transcripts_df(spark, n_conv=N_CONV).persist()
    built = build_index(spark, tdf)
    built.postings = built.postings.persist()
    built.dictionary = built.dictionary.persist()
    built.doc_stats = built.doc_stats.persist()
    searcher = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl
    )
    pdf = transcripts_pandas(n_conv=N_CONV)
    oracle = OracleIndex.build(
        [((r.conv_id, r.turn_idx), r.text) for r in pdf.itertuples(index=False)]
    )
    # doc_id -> (conv_id, turn_idx) map for comparing against oracle keys
    id_map = {
        r["doc_id"]: (r["conv_id"], r["turn_idx"])
        for r in built.doc_stats.select("doc_id", "conv_id", "turn_idx").collect()
    }
    return tdf, built, searcher, oracle, id_map


def test_datagen_spark_matches_pandas(spark, corpus):
    tdf, *_ = corpus
    pdf = transcripts_pandas(n_conv=N_CONV)
    got = (
        tdf.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .toPandas()
    )
    exp = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)[
        ["conv_id", "turn_idx", "role", "text", "tool"]
    ]
    assert len(got) == len(exp)
    for c in got.columns:
        assert (got[c].fillna("@null") == exp[c].fillna("@null")).all(), c


def test_doc_ids_dense_and_ordered(corpus):
    _, built, _, _, id_map = corpus
    ids = sorted(id_map)
    assert ids == list(range(len(ids)))  # dense 0..N-1
    keys = [id_map[i] for i in ids]
    assert keys == sorted(keys)  # isomorphic to (conv_id, turn_idx) order


def test_corpus_stats_match_oracle(corpus):
    _, built, _, oracle, _ = corpus
    assert built.n_docs == oracle.n_docs
    assert abs(built.avgdl - oracle.avgdl) < 1e-9


def _rank_lists(spark_rows, oracle_top, id_map):
    got = [(id_map[r["doc_id"]], round(r["score"], 6)) for r in spark_rows]
    exp = [(key, round(score, 6)) for key, score in oracle_top]
    return got, exp


QUERY_SET = [q for q in fixture_queries()]


@pytest.mark.parametrize("qspec", QUERY_SET, ids=lambda q: q["query_id"])
def test_rank_identical_both_paths(corpus, qspec):
    _, _, searcher, oracle, id_map = corpus
    q, k = qspec["query_text"], qspec["k"]
    exp = oracle.topk(q, k)
    for path in ("dataframe", "blockmax"):
        fn = searcher.topk_dataframe if path == "dataframe" else searcher.topk_blockmax
        rows = fn(q, k).collect()
        got, want = _rank_lists(rows, exp, id_map)
        assert got == want, f"{path} mismatch for {q!r}"


def test_theta0_seeded_parity_over_full_query_set(spark, corpus):
    """The ENTIRE fixture query set, scored with the global-θ₀ probe
    FORCED on (probe_min_blocks=1): rank- and score-identical to the
    pure-Python oracle — the seed may only skip provably-sub-kth work."""
    _, built, _, oracle, id_map = corpus
    seeded = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl,
        probe_min_blocks=1,
    )
    for qspec in QUERY_SET:
        q, k = qspec["query_text"], qspec["k"]
        rows = seeded.topk_blockmax(q, k).collect()
        got, want = _rank_lists(rows, oracle.topk(q, k), id_map)
        assert got == want, f"seeded blockmax mismatch for {q!r}"


def test_text_equality_invariant(spark, corpus):
    """input_hint invariant: top-k fetch-back returns the exact original
    per-turn text under stable (conv_id, turn_idx) ordering."""
    tdf, built, searcher, oracle, id_map = corpus
    docs = built.docs.select("doc_id", "conv_id", "turn_idx", "text")
    out = searcher.fetch_topk("zephyr quantum lattice", 10, docs).collect()
    assert len(out) > 0
    pdf = transcripts_pandas(n_conv=N_CONV).set_index(["conv_id", "turn_idx"])
    for r in out:
        assert r["text"] == pdf.loc[(r["conv_id"], r["turn_idx"]), "text"]


def test_empty_and_absent_queries(corpus):
    _, _, searcher, _, _ = corpus
    assert searcher.topk_dataframe("", 10).count() == 0
    assert searcher.topk_blockmax("qqqabsenttermqqq", 10).count() == 0
    assert searcher.topk_blockmax("!!! ...", 10).count() == 0


def test_flat_postings_roundtrip(spark, corpus):
    """Decode of all blocks reproduces exactly the tf table the build saw."""
    tdf, built, _, oracle, id_map = corpus
    from rabbit_index_ingest_spark.index.query import flat_postings

    flat = {
        (r["term"], id_map[r["doc_id"]]): (r["tf"], r["dl"])
        for r in flat_postings(built.postings).collect()
    }
    exp = {}
    for term, plist in oracle.postings.items():
        for key, tf in plist.items():
            exp[(term, key)] = (tf, oracle.doc_len[key])
    assert flat == exp
