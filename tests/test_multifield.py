"""Multi-field indexing + ES multi_match (best_fields / most_fields).

Oracle: per-field BM25 recomputed in pure Python with Lucene per-field
statistics — df per (field, term), doc_count = docs with >= 1 token in the
field, avgdl = total field tokens / doc_count — then combined per doc
(max + tb*(sum-max) for best_fields, plain sum for most_fields).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.analysis import py_tokenize
from rabbit_index_ingest_spark.datagen import transcripts_pandas
from rabbit_index_ingest_spark.index.build import (
    build_index,
    build_index_multifield,
)
from rabbit_index_ingest_spark.index.codec import B, K1
from rabbit_index_ingest_spark.index.query import Searcher

TB = 0.3


def _title_of(text: str, i: int) -> str:
    """Deterministic short second field; every 7th doc has an EMPTY title
    (drops out of the field's doc_count — Lucene docCount semantics)."""
    return "" if i % 7 == 0 else " ".join(py_tokenize(text)[:4])


def _mm_oracle(pdf, titles, query, fields, mode, tb):
    """fields: {field: boost} over {'text','title'}."""
    toks = {"text": [py_tokenize(t) for t in pdf["text"]], "title": [py_tokenize(t) for t in titles]}
    out = {}
    fstats = {}
    for f in fields:
        docs_with = [d for d in toks[f] if d]
        dc = len(docs_with)
        fstats[f] = (dc, (sum(len(d) for d in docs_with) / dc) if dc else 0.0)
    qt = sorted(set(py_tokenize(query)))
    for i in range(len(pdf)):
        per_field = []
        for f, boost in sorted(fields.items()):
            n, adl = fstats[f]
            s = 0.0
            d = toks[f][i]
            for t in qt:
                tf = d.count(t)
                if tf == 0:
                    continue
                df = sum(1 for dd in toks[f] if t in dd)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += (
                    boost
                    * idf
                    * tf
                    * (K1 + 1.0)
                    / (tf + K1 * (1.0 - B + B * len(d) / adl))
                )
            per_field.append(s)
        if not any(per_field):
            continue
        if mode == "most_fields":
            out[i] = sum(per_field)
        else:
            out[i] = max(per_field) + tb * (sum(per_field) - max(per_field))
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def mfcorpus(spark):
    pdf = transcripts_pandas(n_conv=30)[["conv_id", "turn_idx", "text"]]
    # keep only docs whose TEXT has tokens so text doc_count == n_docs and
    # the degenerate-to-plain-match invariant is exact (empty TITLES stay —
    # they are the docCount case under test)
    pdf = pdf[[bool(py_tokenize(t)) for t in pdf["text"]]]
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    titles = [_title_of(t, i) for i, t in enumerate(pdf["text"])]
    pdf = pdf.assign(title=titles)
    built = build_index_multifield(
        spark,
        spark.createDataFrame(pdf),
        fields={"text": "text", "title": "title"},
    )
    s = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl,
        field_stats=built.field_stats,
    )
    yield pdf, titles, built, s
    built.release()


def test_field_stats_lucene_semantics(spark, mfcorpus):
    pdf, titles, built, s = mfcorpus
    rows = {r["field"]: r for r in built.field_stats.collect()}
    n_titled = sum(1 for t in titles if py_tokenize(t))
    assert rows["title"]["doc_count"] == n_titled < len(pdf)
    assert rows["text"]["doc_count"] == len(pdf)
    tot = sum(len(py_tokenize(t)) for t in titles)
    assert rows["title"]["total_tokens"] == tot
    assert rows["title"]["avgdl"] == pytest.approx(tot / n_titled)


def test_default_field_scores_match_single_field_build(spark, mfcorpus):
    """A multi-field index must score default-field queries IDENTICALLY to
    a single-field build of the same column (unprefixed terms, same stats)."""
    pdf, _, built, s = mfcorpus
    single = build_index(
        spark, spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
    )
    s1 = Searcher(
        spark, single.postings, single.dictionary, single.n_docs, single.avgdl
    )
    q = "zephyr quantum karo"
    a = [(r["doc_id"], round(r["score"], 9))
         for r in s.topk_blockmax(q, 1000).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in s1.topk_blockmax(q, 1000).collect()]
    assert a == b and a
    single.release()


@pytest.mark.parametrize("mode,tb", [
    ("best_fields", 0.0), ("best_fields", TB), ("best_fields", 1.0),
    ("most_fields", 0.0),
])
def test_multimatch_matches_oracle_and_twin(spark, mfcorpus, mode, tb):
    pdf, titles, built, s = mfcorpus
    q = "zephyr quantum karo"
    fields = {"text": 1.0, "title": 2.0}
    want = [(i, round(v, 9)) for i, v in _mm_oracle(pdf, titles, q, fields, mode, tb)]
    fast = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch(q, fields, 10_000, mode=mode, tie_breaker=tb).collect()
    ]
    twin = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch_dataframe(q, fields, 10_000, mode=mode, tie_breaker=tb).collect()
    ]
    assert fast == twin, f"{mode}/{tb}: fast != dataframe twin"
    assert fast == want and fast, f"{mode}/{tb}: engine != python oracle"


def test_multimatch_single_field_degenerates_to_match(spark, mfcorpus):
    """multi_match over only the default text field with boost 1 == plain
    BM25 (every doc has text tokens here, so doc_count == n_docs)."""
    pdf, _, built, s = mfcorpus
    q = "zephyr quantum"
    mm = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch(q, {"text": 1.0}, 1000, mode="most_fields").collect()
    ]
    plain = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_blockmax(q, 1000).collect()
    ]
    assert mm == plain and mm
    # best_fields over one field: same regardless of tie_breaker
    bf = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch(q, {"text": 1.0}, 1000, mode="best_fields",
                                   tie_breaker=0.7).collect()
    ]
    assert bf == plain


def test_multimatch_composes_with_filters(spark, mfcorpus):
    pdf, titles, built, s = mfcorpus
    q = "zephyr quantum karo"
    fields = {"text": 1.0, "title": 3.0}
    full = [(i, v) for i, v in _mm_oracle(pdf, titles, q, fields, "best_fields", TB)]
    assert len(full) > 4
    allow_ids = [i for i, _ in full][::2]
    allowed = spark.createDataFrame([(i,) for i in allow_ids], "doc_id long")
    excluded = spark.createDataFrame([(allow_ids[0],)], "doc_id long")
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch(
            q, fields, 1000, mode="best_fields", tie_breaker=TB,
            allowed=allowed, excluded=excluded,
        ).collect()
    ]
    want = [
        (i, round(v, 9)) for i, v in full
        if i in set(allow_ids) and i != allow_ids[0]
    ]
    assert got == sorted(want, key=lambda kv: (-kv[1], kv[0])) and got


def test_multimatch_validation(spark, mfcorpus):
    pdf, _, built, s = mfcorpus
    with pytest.raises(ValueError, match="mode"):
        s.topk_multimatch("x", {"text": 1.0}, mode="cross_fields")
    with pytest.raises(ValueError, match="tie_breaker"):
        s.topk_multimatch("x", {"text": 1.0}, tie_breaker=1.5)
    with pytest.raises(ValueError, match=">= 0"):
        s.topk_multimatch("x", {"text": -1.0})
    with pytest.raises(ValueError, match="unknown fields"):
        s.topk_multimatch("x", {"nope": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        s.topk_multimatch("x", {})
    # single-field Searcher: clear error, not a silent wrong answer
    single = build_index(
        spark, spark.createDataFrame(pdf[["conv_id", "turn_idx", "text"]])
    )
    s1 = Searcher(
        spark, single.postings, single.dictionary, single.n_docs, single.avgdl
    )
    with pytest.raises(ValueError, match="multi-field"):
        s1.topk_multimatch("x", {"text": 1.0})
    single.release()
    # empty analyzed query / all-absent tokens -> empty frame
    assert s.topk_multimatch("", {"text": 1.0}).count() == 0
    assert s.topk_multimatch("qqqzzzabsent", {"text": 1.0}).count() == 0


def test_multimatch_best_fields_prunes_blocks(spark):
    """Grouped dis_max must still skip provably sub-θ blocks: skewed
    corpus (hot term everywhere, rare term in few docs) + small k."""
    rows = []
    for i in range(4000):
        text = "hot common filler " + ("rare special " if i % 997 == 0 else "") + f"w{i % 13}"
        title = "hot" if i % 3 == 0 else "other thing"
        rows.append((f"c{i:05d}", 0, text, title))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, title string")
    built = build_index_multifield(spark, df, fields={"text": "text", "title": "title"})
    s = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl,
        field_stats=built.field_stats, probe_min_blocks=1,
    )
    acc = spark.sparkContext.accumulator(0)
    fast = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch(
            "hot rare", {"text": 1.0, "title": 2.0}, 5,
            mode="best_fields", tie_breaker=0.2, skip_acc=acc,
        ).collect()
    ]
    twin = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_multimatch_dataframe(
            "hot rare", {"text": 1.0, "title": 2.0}, 5,
            mode="best_fields", tie_breaker=0.2,
        ).collect()
    ]
    assert fast == twin and fast
    assert acc.value > 0, "no pruning on the skewed multi-field corpus"
    built.release()


def test_multifield_store_roundtrip(spark, mfcorpus, tmp_path):
    """save → load: field_stats persists, multi_match over the LOADED
    index matches the in-memory build; upsert/merge fail loud."""
    from rabbit_index_ingest_spark.index.store import IndexStore

    pdf, titles, built, s = mfcorpus
    store = IndexStore(spark, str(tmp_path / "mfidx"))
    rebuilt = build_index_multifield(
        spark,
        spark.createDataFrame(pdf),
        fields={"text": "text", "title": "title"},
    )
    store.save(rebuilt)
    L = store.load()
    assert L.field_stats is not None
    got_fs = {
        r["field"]: (r["doc_count"], round(r["avgdl"], 9), r["total_tokens"])
        for r in L.field_stats.collect()
    }
    want_fs = {
        r["field"]: (r["doc_count"], round(r["avgdl"], 9), r["total_tokens"])
        for r in built.field_stats.collect()
    }
    assert got_fs == want_fs
    s2 = Searcher(
        spark, L.postings, L.dictionary, L.n_docs, L.avgdl,
        deleted_df=L.deleted_df, field_stats=L.field_stats,
    )
    q = "zephyr quantum karo"
    fields = {"text": 1.0, "title": 2.0}
    a = [(r["doc_id"], round(r["score"], 9))
         for r in s.topk_multimatch(q, fields, 100, tie_breaker=TB).collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in s2.topk_multimatch(q, fields, 100, tie_breaker=TB).collect()]
    assert a == b and a
    # batch missing a scored field column fails loud
    with pytest.raises(ValueError, match="missing content column"):
        store.upsert(
            spark.createDataFrame(
                [("zzz", 0, "karo zephyr")],
                "conv_id string, turn_idx int, text string",
            )
        )


def test_multifield_upsert_merge_compact_lifecycle(spark, mfcorpus, tmp_path):
    """doc_as_upsert + tiered merge + compact on a MULTI-FIELD store:
    upserted docs replace by key with their new field contents; a full
    merge (== all segments) purges deletes so the result is score-
    identical to a fresh multi-field build of the live corpus; compact
    preserves the field layout too."""
    from rabbit_index_ingest_spark.index.store import IndexStore

    pdf, titles, _, _ = mfcorpus
    store = IndexStore(spark, str(tmp_path / "mfidx2"))
    store.save(
        build_index_multifield(
            spark, spark.createDataFrame(pdf),
            fields={"text": "text", "title": "title"},
        )
    )
    # modify 3 keys (new sentinel token in TITLE) + 1 brand-new key
    keys = list(zip(pdf["conv_id"][:3], pdf["turn_idx"][:3]))
    batch_rows = [
        (c, int(t), "replaced body tokens", "qqsentinel title words")
        for c, t in keys
    ] + [("zzz-new", 0, "fresh body", "qqsentinel fresh title")]
    batch = spark.createDataFrame(
        batch_rows, "conv_id string, turn_idx int, text string, title string"
    )
    seg = store.upsert(batch)
    assert seg > 0
    L = store.load()
    s2 = Searcher(
        spark, L.postings, L.dictionary, L.n_docs, L.avgdl,
        deleted_df=L.deleted_df, field_stats=L.field_stats,
    )
    hits = s2.topk_multimatch(
        "qqsentinel", {"title": 1.0}, 100, mode="most_fields"
    )
    got_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in hits.join(L.doc_stats, "doc_id").collect()
    }
    assert got_keys == set((c, int(t)) for c, t in keys) | {("zzz-new", 0)}
    # full merge == fresh build of the live corpus (scores shed deletes)
    merged = store.merge_segments(store.segments())
    assert merged >= 0
    live_pdf = pdf[~pdf.apply(
        lambda r: (r["conv_id"], r["turn_idx"]) in set(
            (c, int(t)) for c, t in keys
        ), axis=1,
    )]
    import pandas as pd
    fresh_rows = pd.concat([
        live_pdf[["conv_id", "turn_idx", "text", "title"]],
        pd.DataFrame(batch_rows, columns=["conv_id", "turn_idx", "text", "title"]),
    ])
    fresh = build_index_multifield(
        spark, spark.createDataFrame(fresh_rows),
        fields={"text": "text", "title": "title"},
    )
    sf = Searcher(
        spark, fresh.postings, fresh.dictionary, fresh.n_docs, fresh.avgdl,
        field_stats=fresh.field_stats,
    )
    L2 = store.load()
    s3 = Searcher(
        spark, L2.postings, L2.dictionary, L2.n_docs, L2.avgdl,
        deleted_df=L2.deleted_df, field_stats=L2.field_stats,
    )
    q = "zephyr quantum karo qqsentinel"
    fields = {"text": 1.0, "title": 2.0}
    want = {
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in sf.topk_multimatch(q, fields, 1000, tie_breaker=TB)
        .join(fresh.doc_stats, "doc_id").collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in s3.topk_multimatch(q, fields, 1000, tie_breaker=TB)
        .join(L2.doc_stats, "doc_id").collect()
    }
    assert got == want and got
    # compact keeps the layout; per-field phrase still works
    store.compact()
    L3 = store.load()
    assert L3.field_stats is not None
    s4 = Searcher(
        spark, L3.postings, L3.dictionary, L3.n_docs, L3.avgdl,
        deleted_df=L3.deleted_df, field_stats=L3.field_stats,
    )
    ph = s4.topk_phrase("qqsentinel title", 10, field="title")
    assert ph.count() == 3
    fresh.release()


def test_per_field_phrase(spark, mfcorpus):
    """ES match_phrase on a non-default field: positions are WITHIN-FIELD,
    idf uses the field's doc_count, dl/avgdl the field's lengths — checked
    against a pure-Python phrase oracle over the title tokens."""
    import math

    pdf, titles, built, s = mfcorpus
    # pick a title bigram that occurs somewhere
    title_toks = [py_tokenize(t) for t in titles]
    bigram = None
    for toks in title_toks:
        if len(toks) >= 2:
            bigram = (toks[0], toks[1])
            break
    assert bigram
    q = " ".join(bigram)
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.topk_phrase(q, 10_000, field="title").collect()
    ]
    # oracle: sliding-window phrase tf over title tokens, field stats
    dc = sum(1 for t in title_toks if t)
    avgdl = sum(len(t) for t in title_toks) / dc
    from rabbit_index_ingest_spark.index.codec import B as bB
    from rabbit_index_ingest_spark.index.codec import K1 as kK
    dfs = {
        w: sum(1 for t in title_toks if w in t) for w in bigram
    }
    idf_q = sum(
        math.log(1.0 + (dc - dfs[w] + 0.5) / (dfs[w] + 0.5)) for w in bigram
    )
    want = []
    for i, toks in enumerate(title_toks):
        ptf = sum(
            1 for p in range(len(toks) - 1)
            if toks[p] == bigram[0] and toks[p + 1] == bigram[1]
        )
        if ptf:
            dl = len(toks)
            sc = idf_q * ptf * (kK + 1.0) / (
                ptf + kK * (1.0 - bB + bB * dl / avgdl)
            )
            want.append((i, round(sc, 9)))
    want.sort(key=lambda kv: (-kv[1], kv[0]))
    assert got == want and got
    # phrase on the DEFAULT field via field="text" == plain topk_phrase
    a = [(r["doc_id"], round(r["score"], 9))
         for r in s.topk_phrase("zephyr quantum", 100, field="text").collect()]
    b = [(r["doc_id"], round(r["score"], 9))
         for r in s.topk_phrase("zephyr quantum", 100).collect()]
    assert a == b
    with pytest.raises(ValueError, match="unknown field"):
        s.topk_phrase(q, 10, field="nope")
