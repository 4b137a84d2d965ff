"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rabbit_index_ingest_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from rabbit_index_ingest_spark.operators.similarity import (
    assign_buckets,
    cosine_topk,
    ivf_topk,
    train_centroids,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),   # exact dup (case)
        (3, "completely different content about spark engines"),
        (4, "spark engines process completely different content"),
        (5, ""),
        (6, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_dedup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 0 and groups[0]["n_members"] == 2
    kept = exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 2 not in ids and 0 in ids and len(ids) == 6


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = minhash_signatures(docs, n_hashes=16)
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 2) in pairs  # exact dups always collide
    # short/empty docs produce no signatures, never appear
    assert not any(5 in p or 6 in p for p in pairs)


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(0, 2)] == 1.0  # identical after lowercasing
    assert 0.5 < pairs[(0, 1)] < 1.0  # near-dup
    assert (0, 3) not in pairs


def test_simhash_near_dups(spark, docs):
    sim = simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals[0] == vals[2]  # identical content → identical simhash
    assert vals[5] == 0
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_dups(sim, 3).collect()}
    assert pairs[(0, 2)] == 0


def test_simhash_deterministic(spark, docs):
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert a == b


@pytest.fixture(scope="module")
def vectors(spark):
    rs = np.random.RandomState(42)
    rows = []
    for i in range(200):
        v = rs.randn(16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark, vectors):
    qvec = [float(x) for x in vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = cosine_topk(vectors, qvec, k=5).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] == 1.0
    scores = [r["cosine"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_recall_vs_brute_force(spark, vectors):
    qvec = [float(x) for x in vectors.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
    cents = train_centroids(vectors, n_centroids=8)
    bucketed = assign_buckets(vectors, cents)
    # every vector lands in exactly one bucket
    assert bucketed.count() == vectors.count()
    exact = [r["vec_id"] for r in cosine_topk(vectors, qvec, 10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(bucketed, cents, qvec, 10, nprobe=8).collect()]
    # nprobe == n_centroids ⇒ identical to brute force
    assert approx == exact
    # smaller probe set: query's own vector still found (its bucket is probed)
    approx4 = [r["vec_id"] for r in ivf_topk(bucketed, cents, qvec, 10, nprobe=4).collect()]
    assert 7 in approx4


def test_assign_buckets_arrow_matches_expression_path(spark, vectors):
    """The large-codebook Arrow matmul assignment must agree bucket-for-
    bucket with the column-expression path (same centroids, same ties)."""
    from rabbit_index_ingest_spark.operators.similarity import assign_buckets_arrow

    cents = train_centroids(vectors, n_centroids=8)
    expr = {r["vec_id"]: r["bucket"] for r in assign_buckets(vectors, cents).collect()}
    arrow = {
        r["vec_id"]: r["bucket"]
        for r in assign_buckets_arrow(vectors, cents).collect()
    }
    assert arrow == expr


def test_multimodal_plumbing(spark):
    from rabbit_index_ingest_spark.operators.multimodal import (
        extract_features,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["n_bytes"] > 0
        assert 0.0 <= r["byte_entropy"] <= 8.0
        assert len(r["feature"]) == 8
    frames = sample_frames(media, every_ms=500)
    got = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.where(F.col("kind") == "video").collect()
    }
    for r in got:
        assert r["count"] == len(range(0, durations[r["media_id"]], 500))


def test_multimodal_resize_gathers_expected_bytes(spark):
    from rabbit_index_ingest_spark.operators.multimodal import (
        resize_thumbnails,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    out = {r["media_id"]: r["pixels"] for r in resize_thumbnails(media).collect()}
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, pixels in out.items():
        padded = payloads[mid][:64].ljust(64, b"\0")
        expect = [padded[y * 8 + x] for y in (0, 2, 4, 6) for x in (0, 2, 4, 6)]
        assert pixels == expect


def test_quality_and_lang_functions(spark):
    from rabbit_index_ingest_spark.functions.text import (
        lang_id_expr,
        quality_score_expr,
        token_count_expr,
    )

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog in the yard"),
            (1, "el perro y el gato en la casa que no se ve"),
            (2, "der hund und die katze ist ein tier mit fell"),
            (3, "!!! ??? ###"),
            (4, ""),
        ],
        "i long, text string",
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            token_count_expr("text").alias("n"),
            quality_score_expr("text").alias("q"),
            lang_id_expr("text").alias("lang"),
        ).collect()
    }
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "es"
    assert rows[2]["lang"] == "de"
    assert rows[3]["lang"] == "und" and rows[3]["n"] == 0
    assert rows[4]["q"] is not None
    assert rows[0]["q"] > rows[3]["q"]


def test_lsh_hot_bucket_salting_preserves_pairs(spark):
    """300 identical docs (a near-dup cluster) put every signature in one
    band bucket; with salting (small max_bucket) the pair set must be
    IDENTICAL to the unsalted result, and counts must be exact."""
    rows = [(i, "all work and no play makes jack a dull boy") for i in range(300)]
    rows += [(1000 + i, f"unique document number {i} about topic {i*7}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, n_hashes=16).persist()
    salted = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sigs, max_bucket=50, cache=False).collect()
    }
    plain = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sigs, max_bucket=10**9, cache=False).collect()
    }
    assert salted == plain
    assert len(salted) >= 300 * 299 // 2  # the full clique is present
    # extreme tier: cap 20 over a 300-doc cluster gives s = 15 > 8, which
    # routes through the salted-join fallback — identical pair set again
    extreme = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sigs, max_bucket=20, cache=False).collect()
    }
    assert extreme == plain
    sigs.unpersist()


def test_jaccard_salting_preserves_intersection_counts(spark, docs):
    """Salted pair generation must emit each pair exactly once per shared
    shingle — Jaccard values depend on exact intersection counts."""
    plain = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1, max_bucket=10**9).collect()
    }
    salted = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.1, max_bucket=1).collect()
    }
    assert salted == plain


def test_embedding_neardup_lsh_matches_bruteforce(spark):
    """Planted near-dups: the bucketed LSH path must find exactly the
    all-pairs cosine >= threshold set (verified candidates)."""
    from rabbit_index_ingest_spark.operators.similarity import (
        cosine_expr,
        embedding_neardup_lsh,
    )

    rs = np.random.RandomState(7)
    rows = []
    for i in range(120):
        v = rs.randn(32)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i % 10 == 0:  # plant a near-duplicate of every 10th vector
            w = v + 0.05 * rs.randn(32)
            w /= np.linalg.norm(w)
            rows.append((1000 + i, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()

    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in embedding_neardup_lsh(emb, threshold=0.9).collect()
    }
    l = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    r_ = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    exp = {
        (row["a"], row["b"]): row["cosine"]
        for row in l.join(r_, F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"))
        .where(F.col("cosine") >= 0.9)
        .collect()
    }
    assert got == exp
    assert len(exp) >= 12  # the planted pairs are actually in play
    emb.unpersist()


def test_embedding_neardup_lsh_plan_is_not_cartesian(spark, vectors):
    from rabbit_index_ingest_spark.operators.similarity import embedding_neardup_lsh

    plan = embedding_neardup_lsh(vectors, threshold=0.99)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_train_centroids_deterministic_across_partitioning(spark, vectors):
    a = train_centroids(vectors.repartition(3), n_centroids=8, sample_target=10**6)
    b = train_centroids(vectors.repartition(17), n_centroids=8, sample_target=10**6)
    assert np.array_equal(a, b)


def test_centroids_local_twin_matches_spark(spark, vectors):
    """The pure-numpy trainer (the s3 oracle's codebook source) must
    produce EXACTLY the Spark trainer's centroids — same hash-predicate
    sample, same init order, same 9-dp-rounded Lloyd iterations. Also
    exercised with a sampling modulus > 1 so the xxhash64 twin's
    predicate is actually used."""
    from rabbit_index_ingest_spark.operators.similarity import (
        train_centroids_local,
    )

    pdf = vectors.toPandas()
    a = train_centroids(vectors, n_centroids=8)
    b = train_centroids_local(pdf, n_centroids=8)
    assert np.array_equal(a, b)
    # force mod > 1: sample_target=50 over 200 rows -> mod=4
    a2 = train_centroids(vectors, n_centroids=4, sample_target=50)
    b2 = train_centroids_local(pdf, n_centroids=4, sample_target=50)
    assert np.array_equal(a2, b2)


def test_decode_thumbs_batch_matches_per_payload_stub():
    """The vectorized batch decode (the hot path) must agree byte-for-byte
    with the per-payload stub across lengths 0, <64, =64, >64."""
    from rabbit_index_ingest_spark.operators.multimodal import (
        _decode_image_stub,
        _decode_thumbs_batch,
        _flatten_payloads,
    )

    rs = np.random.RandomState(3)
    payloads = [b"", rs.bytes(10), rs.bytes(64), rs.bytes(200), rs.bytes(63)]
    flat, starts, lens = _flatten_payloads(payloads)
    batch = _decode_thumbs_batch(flat, starts, lens)
    for i, p in enumerate(payloads):
        assert np.array_equal(batch[i], _decode_image_stub(p)), i


def test_concurrent_dedup_jobs_cache_isolation(spark, docs):
    """Two dedup jobs submitted from concurrent driver threads must both
    return correct pair sets: the groups cache is THREAD-local, so one
    job can no longer unpersist the other's persisted groups frame
    mid-flight (round-3 verdict item 4)."""
    from concurrent.futures import ThreadPoolExecutor

    sigs = minhash_signatures(docs, n_hashes=16).persist()
    sigs.count()

    def run(_):
        return {
            (r["a"], r["b"]) for r in lsh_candidate_pairs(sigs).collect()
        }

    with ThreadPoolExecutor(max_workers=2) as ex:
        got_a, got_b = list(ex.map(run, range(2)))
    assert got_a == got_b
    assert (0, 2) in got_a
    sigs.unpersist()


def test_decode_image_probe_and_fallback():
    """decode_image: stub fallback on non-image payloads always; real
    Pillow decode exercised only when the codec is importable (runtime
    feature probe — this sandbox ships no codecs)."""
    from rabbit_index_ingest_spark.operators.multimodal import (
        _decode_image_stub,
        decode_image,
        pil_available,
    )

    fake = bytes(range(100))
    out = decode_image(fake)
    assert out.shape == (8, 8)
    assert (out == _decode_image_stub(fake)).all()


def test_decode_image_real_codec():
    from rabbit_index_ingest_spark.operators.multimodal import (
        _decode_image_stub,
        decode_image,
        pil_available,
    )

    if not pil_available():
        pytest.skip("Pillow not installed — decode_image falls back to stub")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.arange(256, dtype=np.uint8).reshape(16, 16)).save(
        buf, format="PNG"
    )
    real = decode_image(buf.getvalue())
    assert real.shape == (8, 8)
    # a real decode is NOT the byte-gather stub
    assert not (real == _decode_image_stub(buf.getvalue())).all()


def test_pii_scrub_matches_duckdb_twin(spark):
    """pii_scrub_expr (Java regex) and pii_scrub_sql (DuckDB RE2) must
    agree byte-for-byte — the dialect-neutrality contract of
    PII_PATTERNS (no lookarounds, fixed order, global replace)."""
    import duckdb

    from rabbit_index_ingest_spark.functions.text import (
        pii_scrub_expr,
        pii_scrub_sql,
    )

    cases = [
        "mail john.doe+x@corp.example.org now",
        "see https://example.com/a?b=c#d and http://x.io then stop",
        "server at 192.168.0.1 port 80",
        "call +1 (555) 123-4567 or 07700-900123",
        "no pii here, just 3.14 and v2",
        "edge: a@b.co 1.2.3.4.5 999",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [
        r["o"] for r in df.select(pii_scrub_expr("t").alias("o")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {pii_scrub_sql('?::VARCHAR')} "
        , [c]).fetchone()[0]
        for c in cases
    ]
    assert got == want
    # masking actually happened
    assert "<email>" in got[0] and "<url>" in got[1]
    assert "<ip>" in got[2] and "<phone>" in got[3]
    assert got[4] == cases[4]  # clean text untouched


def test_match_count(spark):
    import pandas as pd

    from rabbit_index_ingest_spark.analysis import py_tokenize
    from rabbit_index_ingest_spark.index.build import build_index
    from rabbit_index_ingest_spark.index.query import Searcher

    texts = ["alpha beta", "alpha", "gamma", "beta gamma", "pad"]
    pdf = pd.DataFrame(
        {
            "conv_id": [f"{i:04d}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "text": texts,
        }
    )
    built = build_index(spark, spark.createDataFrame(pdf))
    s = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl
    )
    qt = lambda q: {
        i for i, t in enumerate(texts)
        if set(py_tokenize(q)) & set(py_tokenize(t))
    }
    for q in ("alpha", "alpha gamma", "nosuchterm", ""):
        assert s.match_count(q).collect()[0]["n"] == len(qt(q)), q
    # tombstones masked: delete one alpha doc via the deleted_df path
    s2 = Searcher(
        spark, built.postings, built.dictionary, built.n_docs, built.avgdl,
        deleted_df=spark.createDataFrame([(0,)], "doc_id long"),
    )
    assert s2.match_count("alpha").collect()[0]["n"] == len(qt("alpha")) - 1
    built.release()


def test_stratified_sample_deterministic(spark):
    import hashlib

    from rabbit_index_ingest_spark.operators.training import (
        _rate_threshold,
        stratified_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, s string")
    rates = {"a": 0.5, "b": 0.1}

    def keep(k, s):
        h = hashlib.md5(f"{k}-42".encode()).hexdigest()[:8]
        return h < _rate_threshold(rates.get(s, 0.25))

    want = {k for k, s in rows if keep(k, s)}
    got = {
        r["k"]
        for r in stratified_sample(
            df, "k", "s", rates, default_rate=0.25
        ).collect()
    }
    assert got == want and 0 < len(got) < 500
    # membership independent of partition layout (the sample() pitfall)
    got7 = {
        r["k"]
        for r in stratified_sample(
            df.repartition(7), "k", "s", rates, default_rate=0.25
        ).collect()
    }
    assert got7 == got
    # rate edges: 0 keeps nothing, 1 keeps everything
    assert stratified_sample(df, "k", "s", {}, default_rate=0.0).count() == 0
    assert (
        stratified_sample(df, "k", "s", {}, default_rate=1.0).count() == 500
    )
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(df, "k", "s", {"a": 1.5})


def test_ngram_counts_matches_counter(spark):
    from collections import Counter

    from rabbit_index_ingest_spark.analysis import py_tokenize
    from rabbit_index_ingest_spark.operators.training import ngram_counts

    texts = [
        "the quick brown fox the quick",
        "brown fox jumps",
        "the quick brown",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for n in (1, 2, 3):
        c = Counter()
        for t in texts:
            toks = py_tokenize(t)
            for i in range(len(toks) - n + 1):
                c[" ".join(toks[i:i + n])] += 1
        want = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:5]
        got = [
            (r["ngram"], r["count"])
            for r in ngram_counts(df, "text", n=n, k=5).collect()
        ]
        assert got == want, n
    with pytest.raises(ValueError, match="n must"):
        ngram_counts(df, "text", n=0)


def test_pack_sequences_prefix_sum(spark):
    from rabbit_index_ingest_spark.operators.training import pack_sequences

    rows = [(i, 1 + (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, ln long")
    budget = 25
    run, want = 0, {}
    for k, ln in sorted(rows):
        want[k] = run // budget
        run += ln
    got = {
        r["k"]: r["bin"]
        for r in pack_sequences(
            spark, df, "k", "ln", budget, partitions=5
        ).collect()
    }
    assert got == want
    # default partitioning agrees (the distributed prefix sum is exact
    # whatever the range layout)
    got_d = {
        r["k"]: r["bin"]
        for r in pack_sequences(spark, df, "k", "ln", budget).collect()
    }
    assert got_d == want
    assert pack_sequences(
        spark, df.limit(0), "k", "ln", budget
    ).count() == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(spark, df, "k", "ln", 0)


def test_connected_components_dedup_groups(spark):
    from rabbit_index_ingest_spark.operators.dedup import (
        connected_components,
    )

    # {1..6} as a CHAIN (diameter 5 — exercises multiple propagation
    # rounds), {10,11} and {20,21,22} as separate clusters
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21),
         (21, 22)],
        "a long, b long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
    }
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iterations=1)


def test_training_ops_plan_shapes(spark):
    """Scale-shape assertions: stratified_sample is a pure filter (NO
    Exchange — nothing shuffles, no Python stage), and ngram_counts /
    multi-column groupBys shuffle exactly once (map-side combine)."""
    from rabbit_index_ingest_spark.operators.training import (
        ngram_counts,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(10)],
        "k long, lang string, text string",
    )

    def plan(frame):
        return frame._jdf.queryExecution().executedPlan().toString()

    p = plan(stratified_sample(df, "k", "lang", {"en": 0.5}, 0.1))
    assert "Exchange" not in p and "EvalPython" not in p
    # ngram_counts: the groupBy is ONE exchange (plus the TakeOrdered's
    # single-partition gather, which moves only the aggregated frame)
    p2 = plan(ngram_counts(df, "text", n=2, k=3))
    assert p2.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in p2


def test_minhash_fast_exact_vs_python_twin(spark):
    """The Arrow-native fast minhash must be BIT-identical to a pure
    Python re-derivation (tokenize via py_tokenize, md5 base hash,
    polynomial shingle combine, affine families) — pins the r7 rewrite
    (JVM tokenize + dictionary_encode replacing pandas findall/factorize)."""
    import hashlib

    import numpy as np

    from rabbit_index_ingest_spark.analysis import py_tokenize
    from rabbit_index_ingest_spark.operators.dedup import (
        SEED_MINHASH,
        _SHINGLE_P,
        minhash_signatures,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "",
        "one two",  # < shingle_k tokens -> null signature
        "Café Naïve 東京 résumé emoji 😀 Ωmega mix 3 14",
        "a a a a a a",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n_hashes, k = 6, 3
    got = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(n_hashes)]
        for r in minhash_signatures(df, n_hashes=n_hashes, shingle_k=k).collect()
    }
    rs = np.random.RandomState(SEED_MINHASH)
    A = (rs.randint(0, 2**62, size=n_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    Bc = rs.randint(0, 2**62, size=n_hashes).astype(np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            toks = py_tokenize(t)
            if len(toks) < k:
                assert got[i] == [None] * n_hashes
                continue
            th = np.array(
                [
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    for w in toks
                ],
                dtype=np.uint64,
            )
            sh = np.zeros(len(toks) - k + 1, dtype=np.uint64)
            for j in range(k):
                sh = sh * _SHINGLE_P + th[j : j + len(sh)]
            want = [
                int(np.int64((A[h] * sh + Bc[h]).min().view(np.int64)))
                for h in range(n_hashes)
            ]
            assert got[i] == want, f"doc {i}"
