"""Varbyte/delta codec: golden + property tests (FIXTURES.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rabbit_index_ingest_spark.index import codec


def test_varbyte_golden():
    assert codec.varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varbyte_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert codec.varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    # 128 = 0b1000_0000 → LEB128 little-endian: 0x80 0x01
    assert codec.varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert codec.varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


def test_varbyte_roundtrip_fixed_lengths():
    rs = np.random.RandomState(42)
    for n in (0, 1, 127, 128, 129, 10_000):
        vals = rs.randint(0, 2**40, size=n).astype(np.uint64)
        out = codec.varbyte_decode(codec.varbyte_encode(vals))
        np.testing.assert_array_equal(out, vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400, unique=True
    )
)
def test_delta_roundtrip_property(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    np.testing.assert_array_equal(codec.delta_decode(codec.delta_encode(arr)), arr)


def test_pack_unpack_blocks():
    rs = np.random.RandomState(42)
    ids = np.unique(rs.randint(0, 2**30, size=1200).astype(np.int64))[:1000]
    tfs = rs.randint(1, 50, size=1000).astype(np.int64)
    dls = rs.randint(5, 120, size=1000).astype(np.int64)
    blocks = codec.pack_postings(ids, tfs, dls, block_size=128)
    assert len(blocks) == 8  # ceil(1000/128)
    got_ids, got_tfs, got_dls = [], [], []
    for blk in blocks:
        d, t = codec.unpack_block(blk["doc_bytes"], blk["tf_bytes"])
        dl = codec.varbyte_decode(blk["dl_bytes"]).astype(np.int64)
        got_ids.append(d)
        got_tfs.append(t)
        got_dls.append(dl)
        lo = blk["block_id"] * 128
        assert blk["max_tf"] == tfs[lo : lo + blk["n_docs"]].max()
        assert blk["min_dl"] == dls[lo : lo + blk["n_docs"]].min()
        assert blk["first_doc"] == d[0] and blk["last_doc"] == d[-1]
    np.testing.assert_array_equal(np.concatenate(got_ids), ids)
    np.testing.assert_array_equal(np.concatenate(got_tfs), tfs)
    np.testing.assert_array_equal(np.concatenate(got_dls), dls)


def test_pack_group_blocks_equals_per_block_packing():
    """The single-pass vectorized packer must produce byte-identical blocks
    to the straightforward per-block reference packer."""
    rs = np.random.RandomState(7)
    for n in (1, 127, 128, 129, 1000):
        ids = np.unique(rs.randint(0, 2**35, size=n + 200).astype(np.int64))[:n]
        tfs = rs.randint(1, 40, size=n).astype(np.int64)
        dls = rs.randint(5, 120, size=n).astype(np.int64)
        fast = codec.pack_group_blocks(ids, tfs, dls, block_size=128)
        ref = codec.pack_postings(ids, tfs, dls, block_size=128)
        assert len(fast) == len(ref)
        for a, b in zip(fast, ref):
            assert a == b, (a["block_id"], n)


def test_tf_norm_monotone_in_tf():
    # sanity: BM25 tf saturation — increasing, bounded by (k1+1)
    tfs = np.arange(1, 200)
    n = codec.tf_norm(tfs, np.full_like(tfs, 60), avgdl=60.0)
    assert np.all(np.diff(n) > 0)
    assert n.max() < codec.K1 + 1.0


def test_pack_batch_equals_per_group_packing():
    """Batch-wide vectorized packing (codec.pack_batch) must produce
    byte-identical blocks to per-group pack_group_blocks over the same
    occurrence stream (multiple terms/ranges per batch, duplicate doc
    occurrences for tf run-length, uneven tail blocks)."""
    import pandas as pd

    rng = np.random.RandomState(7)
    occ = []
    for term in ("aa", "bb", "cc"):
        for range_id in (0, 1):
            n_docs = rng.randint(1, 400)
            base = range_id << 16
            ids = np.sort(rng.choice(5000, size=n_docs, replace=False)) + base
            tfs = rng.randint(1, 5, size=n_docs)
            dls = rng.randint(1, 60, size=n_docs)
            for i, tf in zip(ids, tfs):
                dl = int(dls[np.searchsorted(ids, i)])
                occ.extend([(term, range_id, int(i), dl)] * int(tf))
    terms = np.array([o[0] for o in occ], dtype=object)
    ranges = np.array([o[1] for o in occ], dtype=np.int64)
    ids_a = np.array([o[2] for o in occ], dtype=np.int64)
    dls_a = np.array([o[3] for o in occ], dtype=np.int64)

    got = pd.DataFrame(codec.pack_batch(terms, ranges, ids_a, dls_a, block_size=128))
    # positionless packing: the pos stream is empty per block by contract
    assert set(got["pos_bytes"]) == {b""}
    got = got.drop(columns=["pos_bytes"])

    # expected: per-group run-length + pack_group_blocks
    exp_rows = []
    df = pd.DataFrame({"term": terms, "range_id": ranges, "doc_id": ids_a, "dl": dls_a})
    for (term, range_id), g in df.groupby(["term", "range_id"], sort=False):
        gi = g["doc_id"].to_numpy()
        starts = np.concatenate(([0], np.flatnonzero(gi[1:] != gi[:-1]) + 1))
        tfs = np.diff(np.concatenate((starts, [len(gi)])))
        for blk in codec.pack_group_blocks(
            gi[starts], tfs, g["dl"].to_numpy()[starts], block_size=128
        ):
            blk["term"] = term
            blk["range_id"] = range_id
            exp_rows.append(blk)
    exp = pd.DataFrame(exp_rows)[list(got.columns)]
    assert len(got) == len(exp)
    for c in got.columns:
        assert list(got[c]) == list(exp[c]), c


def _random_positional_stream(seed: int, n_terms: int = 4, max_docs: int = 300):
    """Occurrence stream (term, range, doc, dl, pos) sorted the way the
    build does (term, doc_id, pos), plus the per-(term, doc) ground truth."""
    rng = np.random.RandomState(seed)
    terms_l, ranges_l, ids_l, dls_l, pos_l = [], [], [], [], []
    truth = {}
    for t in [f"t{i:02d}" for i in range(n_terms)]:
        for range_id in (0, 3):
            base = range_id << 16
            n_docs = rng.randint(1, max_docs)
            ids = np.sort(rng.choice(4000, size=n_docs, replace=False)) + base
            for d in ids:
                dl = int(rng.randint(5, 200))
                tf = int(rng.randint(1, 6))
                positions = np.sort(
                    rng.choice(dl, size=min(tf, dl), replace=False)
                ).astype(np.int64)
                truth[(t, int(d))] = (dl, positions)
                for p in positions:
                    terms_l.append(t)
                    ranges_l.append(range_id)
                    ids_l.append(int(d))
                    dls_l.append(dl)
                    pos_l.append(int(p))
    return (
        np.array(terms_l, dtype=object),
        np.array(ranges_l, dtype=np.int64),
        np.array(ids_l, dtype=np.int64),
        np.array(dls_l, dtype=np.int64),
        np.array(pos_l, dtype=np.int64),
        truth,
    )


def test_pack_batch_positions_roundtrip():
    """pos_bytes must decode back to each doc's exact ascending position
    list — across multi-block groups, multiple terms and doc ranges."""
    terms, ranges, ids, dls, pos, truth = _random_positional_stream(11)
    cols = codec.pack_batch(terms, ranges, ids, dls, block_size=128, pos=pos)
    seen = set()
    for bi in range(len(cols["term"])):
        d_ids, d_tfs = codec.unpack_block(
            cols["doc_bytes"][bi], cols["tf_bytes"][bi]
        )
        flat, starts = codec.unpack_positions(cols["pos_bytes"][bi], d_tfs)
        assert len(flat) == d_tfs.sum()
        for j, (doc, tf) in enumerate(zip(d_ids, d_tfs)):
            got = flat[starts[j] : starts[j] + tf]
            dl, want = truth[(cols["term"][bi], int(doc))]
            np.testing.assert_array_equal(got, want)
            seen.add((cols["term"][bi], int(doc)))
    assert seen == set(truth)  # every posting decoded exactly once


def test_pack_batch_positions_absent_by_default():
    terms, ranges, ids, dls, pos, _ = _random_positional_stream(13)
    cols = codec.pack_batch(terms, ranges, ids, dls, block_size=128)
    assert set(cols["pos_bytes"]) == {b""}


def test_unpack_positions_empty():
    flat, starts = codec.unpack_positions(b"", np.array([], dtype=np.int64))
    assert len(flat) == 0 and len(starts) == 0
