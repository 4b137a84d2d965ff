"""Posting-list compression: delta-gap doc IDs + varbyte, fixed-size blocks.

Spark-free, pure-numpy module (vectorized — no per-element Python loops),
called from inside Arrow-batched ``mapInPandas`` stages (SURVEY.md §2.2 B4,
mirroring Lucene's FOR/vint block postings which define the reference's
storage behavior via ES 7.9.1).

Each block covers ≤ BLOCK_SIZE docs of one term and carries:
  first_doc / last_doc  — decode-free skip bounds (block-max WAND, B6)
  max_tf_norm           — max over the block of the idf-independent BM25
                          factor tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl));
                          query multiplies by idf(term) → block max_score.
                          Storing it idf-free keeps block metadata valid
                          when df changes under incremental merges (B7).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

K1 = 1.2
B = 0.75


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-style varbyte encode of a uint64 array (vectorized).

    The group matrix is sized to the ACTUAL maximum value, not the uint64
    worst case: typical posting streams (gaps, tfs, dls) fit 1-2 bytes, so
    building (n, 2) temporaries instead of (n, 10) cuts the encoder's
    memory traffic ~5× — this is the hottest numpy path of the build."""
    if len(values) == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    width = max(1, (int(v.max()).bit_length() + 6) // 7)
    shifts = (np.arange(width, dtype=np.uint64) * np.uint64(7))[None, :]
    groups = (v[:, None] >> shifts) & np.uint64(0x7F)
    # bytes needed per value = index of highest nonzero group + 1 (min 1)
    nonzero = groups != 0
    nbytes = np.where(
        nonzero.any(axis=1), width - np.argmax(nonzero[:, ::-1], axis=1), 1
    ).astype(np.int64)
    mask = np.arange(width)[None, :] < nbytes[:, None]
    out = groups.astype(np.uint8)
    # continuation bit on every byte except the last of each value
    is_last = np.arange(width)[None, :] == (nbytes - 1)[:, None]
    out |= np.where(mask & ~is_last, 0x80, 0).astype(np.uint8)
    return out[mask].tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Inverse of varbyte_encode → uint64 array (vectorized). Accepts the
    raw ``bytes`` of one stream or a uint8 ndarray view over several
    CONCATENATED streams (each value's byte group is self-delimiting, so
    concatenation of valid streams is a valid stream — the batch decoders
    exploit this to decode a whole Arrow batch of blocks in one call)."""
    if isinstance(buf, np.ndarray):
        b = buf
        if len(b) == 0:
            return np.empty(0, dtype=np.uint64)
    elif not buf:
        return np.empty(0, dtype=np.uint64)
    else:
        b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.flatnonzero(b < 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    offsets = np.arange(len(b)) - np.repeat(starts, ends - starts + 1)
    contribs = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * offsets.astype(np.uint64)
    )
    return np.add.reduceat(contribs, starts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids → gaps (first element kept verbatim)."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(ids)
    if len(ids):
        out[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64)).astype(np.int64)


def tf_norm(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """idf-independent BM25 factor, float64 (classic (k1+1) numerator)."""
    tfs = np.asarray(tfs, dtype=np.float64)
    dls = np.asarray(dls, dtype=np.float64)
    return tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))


def pack_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Cut one term's sorted (doc_id, tf, dl) postings into compressed blocks.

    Returns plain dicts (columnar-friendly) with keys: block_id, first_doc,
    last_doc, n_docs, doc_bytes, tf_bytes, dl_bytes, max_tf, min_dl. The
    (max_tf, min_dl) pair is the Lucene-impact-style upper-bound metadata:
    idf·tf_norm(max_tf, min_dl, avgdl) bounds any doc's contribution.
    """
    n = len(doc_ids)
    blocks = []
    for b0 in range(0, n, block_size):
        b1 = min(b0 + block_size, n)
        ids = np.asarray(doc_ids[b0:b1], dtype=np.int64)
        tf = np.asarray(tfs[b0:b1], dtype=np.uint64)
        dl = np.asarray(dls[b0:b1], dtype=np.uint64)
        blocks.append(
            {
                "block_id": b0 // block_size,
                "first_doc": int(ids[0]),
                "last_doc": int(ids[-1]),
                "n_docs": int(b1 - b0),
                "doc_bytes": varbyte_encode(delta_encode(ids)),
                "tf_bytes": varbyte_encode(tf),
                "dl_bytes": varbyte_encode(dl),
                "max_tf": int(tf.max()),
                "min_dl": int(dl.min()),
                "tf_sum": int(tf.sum()),
            }
        )
    return blocks


def unpack_block(doc_bytes: bytes, tf_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_ids int64 ascending, tfs int64)."""
    return (
        delta_decode(varbyte_decode(doc_bytes)),
        varbyte_decode(tf_bytes).astype(np.int64),
    )


def unpack_positions(
    pos_bytes: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a block's position stream → (flat int64 positions, per-doc
    start offsets). Doc i of the block owns ``flat[starts[i] : starts[i] +
    tfs[i]]`` — ascending within-doc token positions.

    The stream stores within-doc deltas with each doc's first position
    absolute, so reconstruction is one global cumsum corrected at doc
    boundaries (vectorized segment-cumsum; no per-doc Python loop).
    """
    deltas = varbyte_decode(pos_bytes).astype(np.int64)
    counts = np.asarray(tfs, dtype=np.int64)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    if not len(deltas):
        return deltas, starts
    out = np.cumsum(deltas)
    corr = out[starts] - deltas[starts]
    out -= np.repeat(corr, counts)
    return out, starts


def decode_blocks_batch(
    nd: np.ndarray,
    doc_stream: np.ndarray,
    tf_stream: np.ndarray,
    dl_stream: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a WHOLE batch of blocks' (doc, tf, dl) streams in one pass —
    the batch-wide twin of per-block ``unpack_block`` used by the flat
    decoders: ``nd`` is the per-block posting count and each ``*_stream``
    the batch's concatenated varbyte stream (valid because every value's
    byte group is self-delimiting). Doc ids reconstruct with ONE global
    cumsum corrected at block boundaries (block-leading gaps are stored
    absolute), exactly the segment-cumsum of ``unpack_positions``.
    Returns (doc_ids, tfs, dls) int64 arrays of length ``nd.sum()``.
    """
    total = int(nd.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    gaps = varbyte_decode(doc_stream)
    tfs = varbyte_decode(tf_stream).astype(np.int64)
    dls = varbyte_decode(dl_stream).astype(np.int64)
    if not (len(gaps) == len(tfs) == len(dls) == total):
        raise ValueError(
            f"corrupt block streams: {total} postings declared, decoded "
            f"{len(gaps)}/{len(tfs)}/{len(dls)} doc/tf/dl values"
        )
    starts = np.zeros(len(nd), dtype=np.int64)
    np.cumsum(nd[:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    corr = cs[starts] - gaps[starts]
    ids = (cs - np.repeat(corr, nd)).astype(np.int64)
    return ids, tfs, dls


def decode_positions_batch(
    tfs: np.ndarray, pos_stream: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Batch-wide ``unpack_positions``: decode the concatenated position
    stream of MANY blocks at once. ``tfs`` is the per-posting occurrence
    count across the whole batch (every posting has tf ≥ 1 by
    construction); positions reset at doc boundaries (doc-leading delta
    stored absolute), so one global cumsum + boundary correction
    reconstructs everything. Returns (flat positions, per-doc offsets of
    length len(tfs)+1) — offsets slice doc i's positions as
    ``flat[offs[i]:offs[i+1]]``, ready for an Arrow ListArray."""
    counts = np.asarray(tfs, dtype=np.int64)
    offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    deltas = varbyte_decode(pos_stream).astype(np.int64)
    if len(deltas) != offs[-1]:
        raise ValueError(
            f"corrupt position stream: {int(offs[-1])} occurrences "
            f"declared, decoded {len(deltas)} position deltas"
        )
    if not len(deltas):
        return deltas, offs
    cs = np.cumsum(deltas)
    dstarts = offs[:-1]
    corr = cs[dstarts] - deltas[dstarts]
    return cs - np.repeat(corr, counts), offs


def pack_batch(
    terms: np.ndarray,
    ranges: np.ndarray,
    ids: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
    pos: np.ndarray | None = None,
) -> dict[str, np.ndarray | list]:
    """Pack a WHOLE Arrow batch of raw token occurrences — sorted by
    (term, range_id, doc_id) and holding only complete (term, range)
    groups — into block columns, with **no per-group or per-block Python
    loop** on the hot path:

    * tf by run-length over the sorted occurrences (batch-wide);
    * per-block metadata via ``ufunc.reduceat`` (block starts tile the
      batch exactly, so one reduceat call covers every block);
    * each byte stream is varbyte-encoded ONCE for the whole
      batch and sliced per block via the exact per-value length table
      (block-leading gaps patched to absolute doc ids so blocks decode
      standalone — group boundaries are always block starts, which also
      makes the batch-wide gap stream safe across groups);
    * with ``pos`` (per-occurrence within-doc token position, ascending
      inside each (term, doc) run — guaranteed by the build's
      sortWithinPartitions(term, doc_id, pos)), a fourth stream
      ``pos_bytes`` stores within-doc position deltas (doc-leading entry
      absolute) for phrase/proximity queries — the positional-postings
      analogue of Lucene's .prx; decode with ``unpack_positions``.
      Without ``pos``, ``pos_bytes`` is empty per block (same schema).

    Returns a column dict in BLOCKS_SCHEMA order (build.py). This is the
    vectorized successor of per-group ``pack_group_blocks`` (kept for
    equivalence tests); at ~60k groups/partition the per-group Python
    dispatch dominated the build's pack stage.
    """
    empty: dict[str, np.ndarray | list] = {
        "term": np.empty(0, dtype=object),
        "range_id": np.empty(0, dtype=np.int64),
        "block_id": np.empty(0, dtype=np.int32),
        "first_doc": np.empty(0, dtype=np.int64),
        "last_doc": np.empty(0, dtype=np.int64),
        "n_docs": np.empty(0, dtype=np.int32),
        "doc_bytes": [],
        "tf_bytes": [],
        "dl_bytes": [],
        "pos_bytes": [],
        "max_tf": np.empty(0, dtype=np.int64),
        "min_dl": np.empty(0, dtype=np.int64),
        "tf_sum": np.empty(0, dtype=np.int64),
    }
    n = len(ids)
    if n == 0:
        return empty
    ids = np.asarray(ids, dtype=np.int64)
    dls_i = np.asarray(dls, dtype=np.int64)
    ranges = np.asarray(ranges, dtype=np.int64)

    # run-length over (term, range, doc) → unique postings with tf
    occ_change = (ids[1:] != ids[:-1]) | (ranges[1:] != ranges[:-1]) | (
        terms[1:] != terms[:-1]
    )
    run_starts = np.concatenate(([0], np.flatnonzero(occ_change) + 1))
    run_ends = np.concatenate((run_starts[1:], [n]))
    u_tfs = (run_ends - run_starts).astype(np.uint64)
    u_ids = ids[run_starts]
    u_dls = dls_i[run_starts].astype(np.uint64)
    u_terms = terms[run_starts]
    u_ranges = ranges[run_starts]
    m = len(u_ids)

    # (term, range) group bounds over the unique postings
    g_change = (u_ranges[1:] != u_ranges[:-1]) | (u_terms[1:] != u_terms[:-1])
    g_starts = np.concatenate(([0], np.flatnonzero(g_change) + 1))
    g_ends = np.concatenate((g_starts[1:], [m]))
    g_nblocks = -(-(g_ends - g_starts) // block_size)

    # block starts tile [0, m): every group's postings cut into ≤block_size
    starts = np.concatenate(
        [np.arange(a, b, block_size, dtype=np.int64) for a, b in zip(g_starts, g_ends)]
    )
    block_group = np.repeat(np.arange(len(g_starts)), g_nblocks)
    ends = np.minimum(starts + block_size, g_ends[block_group])
    block_id = ((starts - g_starts[block_group]) // block_size).astype(np.int32)

    # gap stream, block-leading gaps patched to absolute doc ids
    gaps = np.empty(m, dtype=np.int64)
    gaps[0] = u_ids[0]
    np.subtract(u_ids[1:], u_ids[:-1], out=gaps[1:])
    gaps[starts] = u_ids[starts]

    byte_cols: dict[str, list] = {}
    for name, arr in (
        ("doc_bytes", gaps.astype(np.uint64)),
        ("tf_bytes", u_tfs),
        ("dl_bytes", u_dls),
    ):
        enc = varbyte_encode(arr)
        offs = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(_vb_lengths(arr), out=offs[1:])
        lo, hi = offs[starts].tolist(), offs[ends].tolist()
        byte_cols[name] = [enc[a:b] for a, b in zip(lo, hi)]

    if pos is None:
        byte_cols["pos_bytes"] = [b""] * len(starts)
    else:
        # position stream is OCCURRENCE-level (n values, vs m postings):
        # within-doc deltas, run-leading entry patched absolute. A block's
        # slice spans the occurrences of its postings — bounds come from
        # run_starts (with the n sentinel) indexed by the block's posting
        # range, then mapped through the byte-offset table.
        p = np.asarray(pos, dtype=np.int64)
        pgaps = np.empty(n, dtype=np.int64)
        pgaps[0] = p[0]
        np.subtract(p[1:], p[:-1], out=pgaps[1:])
        pgaps[run_starts] = p[run_starts]
        parr = pgaps.astype(np.uint64)
        enc = varbyte_encode(parr)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(_vb_lengths(parr), out=offs[1:])
        occ_bounds = np.concatenate((run_starts, [n]))
        lo = offs[occ_bounds[starts]].tolist()
        hi = offs[occ_bounds[ends]].tolist()
        byte_cols["pos_bytes"] = [enc[a:b] for a, b in zip(lo, hi)]

    return {
        "term": u_terms[starts],
        "range_id": u_ranges[starts],
        "block_id": block_id,
        "first_doc": u_ids[starts],
        "last_doc": u_ids[ends - 1],
        "n_docs": (ends - starts).astype(np.int32),
        **byte_cols,
        "max_tf": np.maximum.reduceat(u_tfs, starts).astype(np.int64),
        "min_dl": np.minimum.reduceat(u_dls, starts).astype(np.int64),
        "tf_sum": np.add.reduceat(u_tfs, starts).astype(np.int64),
    }


def _vb_lengths(v: np.ndarray) -> np.ndarray:
    """Exact varbyte length (1..10) per uint64 value, vectorized (loop
    bounded by the actual max width, matching varbyte_encode)."""
    n = np.ones(len(v), dtype=np.int64)
    width = max(1, (int(v.max()).bit_length() + 6) // 7) if len(v) else 1
    for k in range(1, width):
        n += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return n


def pack_group_blocks(
    ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = BLOCK_SIZE
) -> list[dict]:
    """Pack one (term, range) group's sorted postings into blocks with a
    SINGLE varbyte pass per stream (vs one per block): gaps are computed
    group-wide, block-leading gaps are patched to absolute doc ids, the
    whole stream is encoded once, and per-block byte spans are sliced via
    the exact per-value length table. ~10× less numpy-call overhead than
    per-block encoding for multi-block terms."""
    n = len(ids)
    ids = np.asarray(ids, dtype=np.int64)
    tfs64 = np.asarray(tfs, dtype=np.uint64)
    dls64 = np.asarray(dls, dtype=np.uint64)
    starts = np.arange(0, n, block_size)
    gaps = delta_encode(ids)
    gaps[starts] = ids[starts].astype(np.uint64)  # blocks decode standalone

    out = []
    streams = []
    for arr in (gaps, tfs64, dls64):
        enc = varbyte_encode(arr)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(_vb_lengths(arr), out=offs[1:])
        streams.append((enc, offs))
    for bi, b0 in enumerate(starts):
        b1 = min(b0 + block_size, n)
        (g_enc, g_off), (t_enc, t_off), (d_enc, d_off) = streams
        out.append(
            {
                "block_id": bi,
                "first_doc": int(ids[b0]),
                "last_doc": int(ids[b1 - 1]),
                "n_docs": int(b1 - b0),
                "doc_bytes": g_enc[g_off[b0] : g_off[b1]],
                "tf_bytes": t_enc[t_off[b0] : t_off[b1]],
                "dl_bytes": d_enc[d_off[b0] : d_off[b1]],
                "max_tf": int(tfs64[b0:b1].max()),
                "min_dl": int(dls64[b0:b1].min()),
                "tf_sum": int(tfs64[b0:b1].sum()),
            }
        )
    return out
