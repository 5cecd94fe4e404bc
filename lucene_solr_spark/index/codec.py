"""Vectorized posting-list codec: delta + varint, 128-doc blocks.

The Spark re-expression of Lucene's FOR-packed posting blocks
(``lucene/core/src/java/org/apache/lucene/codecs/lucene50/
Lucene50PostingsFormat.java`` + ``ForUtil.java``): postings are split
into fixed :data:`BLOCK_SIZE`-doc blocks; doc ordinals are
delta-encoded within each block (the block's first doc is stored
separately, giving a skip list — ``MultiLevelSkipListWriter`` analog —
via ``np.searchsorted`` over the first-doc array) and packed as LEB128
varints. Per-block ``max_tf``/``min_dl`` are the impact metadata
feeding block-max WAND upper bounds
(``lucene/core/src/java/org/apache/lucene/search/WANDScorer.java``,
``ImpactsEnum``).

Everything here is numpy-vectorized (no per-element Python loops except
over the ≤10 varint byte positions) — these functions run inside Arrow
UDF batches on executors.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _varint_layout(v: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length for LEB128."""
    nb = np.ones(len(v), np.int64)
    for k in range(1, 10):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return nb


def pack_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array. Vectorized over values;
    the loop runs over byte positions (≤10 for uint64)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nb = _varint_layout(v)
    starts = np.cumsum(nb) - nb
    out = np.empty(int(nb.sum()), np.uint8)
    rem = v.copy()
    idx = starts.copy()
    active = np.ones(n, bool)
    while True:
        cur = rem[active]
        more = cur >= np.uint64(0x80)
        byte = (cur & np.uint64(0x7F)).astype(np.uint8)
        byte[more] |= np.uint8(0x80)
        out[idx[active]] = byte
        if not more.any():
            break
        rem[active] >>= np.uint64(7)
        idx[active] += 1
        nxt = active.copy()
        nxt[active] = more
        active = nxt
    return out.tobytes()


def unpack_varint(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a LEB128 stream to int64. Fully vectorized: value
    boundaries from the continuation bit, per-value accumulation via
    float64 bincount (exact below 2^53 — doc ords/tfs are far below)."""
    b = np.frombuffer(buf, np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if len(b) == 0:
        return np.empty(0, np.int64)
    is_end = (b & 0x80) == 0
    ends = np.nonzero(is_end)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vid = np.cumsum(is_end) - is_end  # value index per byte
    shift = np.arange(len(b)) - starts[vid]
    contrib = (b & 0x7F).astype(np.float64) * np.exp2(7.0 * shift)
    return np.bincount(vid, weights=contrib, minlength=len(ends)).astype(np.int64)


def delta_encode(doc_ords: np.ndarray, first: int) -> np.ndarray:
    """Deltas within a block: d[0] = ords[0]-first(=0 by construction),
    d[i] = ords[i]-ords[i-1]. Strictly-increasing input → deltas ≥ 1
    after the first."""
    d = np.diff(doc_ords, prepend=np.int64(first))
    return d.astype(np.int64)


def pack_postings(doc_ords: np.ndarray, tfs: np.ndarray) -> dict:
    """Encode one (term, segment) posting list into block structure.

    Returns dict with: first_docs, doc_offs, tf_offs, max_tfs, min_dls
    placeholder (filled by caller that knows doc lengths), doc_bytes,
    tf_bytes. Offsets are byte starts per block → blocks decode
    independently (skip-list granularity).
    """
    n = len(doc_ords)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    first_docs = np.empty(n_blocks, np.int64)
    max_tfs = np.empty(n_blocks, np.int64)
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    doc_offs = np.zeros(n_blocks, np.int64)
    tf_offs = np.zeros(n_blocks, np.int64)
    dpos = tpos = 0
    for blk in range(n_blocks):
        lo, hi = blk * BLOCK_SIZE, min(n, (blk + 1) * BLOCK_SIZE)
        ords = doc_ords[lo:hi]
        first_docs[blk] = ords[0]
        max_tfs[blk] = tfs[lo:hi].max()
        db = pack_varint(delta_encode(ords, int(ords[0])))
        tb = pack_varint(tfs[lo:hi])
        doc_offs[blk], tf_offs[blk] = dpos, tpos
        dpos += len(db)
        tpos += len(tb)
        doc_chunks.append(db)
        tf_chunks.append(tb)
    return {
        "first_docs": first_docs,
        "doc_offs": doc_offs,
        "tf_offs": tf_offs,
        "max_tfs": max_tfs,
        "doc_bytes": b"".join(doc_chunks),
        "tf_bytes": b"".join(tf_chunks),
        "n_blocks": n_blocks,
    }


def segmented_cumsum(vals: np.ndarray, seg_starts_mask: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting wherever seg_starts_mask is True."""
    cs = np.cumsum(vals)
    seg_ids = np.cumsum(seg_starts_mask) - 1
    base = (cs - vals)[seg_starts_mask]  # running total just before each segment
    return cs - base[seg_ids]


def pack_all_postings(
    term_starts: np.ndarray,
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    positions: np.ndarray | None = None,
) -> dict:
    """Encode ALL of a segment's posting lists in one vectorized pass.

    Inputs are postings sorted by (term, doc_ord); `term_starts` is the
    CSR-style boundary array (len T+1). One `pack_varint` call encodes
    every delta in the segment; per-term slicing of the resulting byte
    stream is the only Python-level loop (T cheap slice ops).

    Returns per-term lists: first_docs, doc_offs, tf_offs, max_tfs,
    min_dls (numpy arrays per term) and doc_bytes/tf_bytes (bytes per
    term). With `positions` given (the flat within-doc token positions,
    one entry per token occurrence, grouped by posting in posting
    order), also emits pos_offs/pos_bytes — the proximity data Lucene
    stores for PhraseQuery (`Lucene50PostingsFormat` .pos file analog).
    """
    n = len(doc_ords)
    n_terms = len(term_starts) - 1
    if n == 0:
        return {k: [] for k in (
            "first_docs", "doc_offs", "tf_offs", "max_tfs", "min_dls",
            "doc_bytes", "tf_bytes", "pos_offs", "pos_bytes")}
    df = np.diff(term_starts)
    term_of = np.repeat(np.arange(n_terms), df)
    pos_in_term = np.arange(n) - term_starts[term_of]
    blk_first = (pos_in_term % BLOCK_SIZE) == 0
    blk_start_idx = np.nonzero(blk_first)[0]

    deltas = np.empty(n, np.int64)
    deltas[1:] = doc_ords[1:] - doc_ords[:-1]
    deltas[blk_first] = 0  # block-local: first doc kept in first_docs
    doc_stream = np.ascontiguousarray(deltas, dtype=np.uint64)
    tf_stream = np.ascontiguousarray(tfs, dtype=np.uint64)

    d_nb = _varint_layout(doc_stream)
    t_nb = _varint_layout(tf_stream)
    d_pos = np.cumsum(d_nb) - d_nb  # global byte start per value
    t_pos = np.cumsum(t_nb) - t_nb
    doc_all = pack_varint(doc_stream)
    tf_all = pack_varint(tf_stream)

    # Per-block metadata (global order).
    blk_bounds = np.append(blk_start_idx, n)
    first_docs_all = doc_ords[blk_start_idx]
    max_tf_all = np.maximum.reduceat(tfs, blk_start_idx)
    min_dl_all = np.minimum.reduceat(doc_lens, blk_start_idx)
    d_off_all = d_pos[blk_start_idx]
    t_off_all = t_pos[blk_start_idx]

    # Split per term.
    n_blocks_per_term = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    blk_term_bounds = np.cumsum(n_blocks_per_term)[:-1]
    term_d_start = d_pos[term_starts[:-1]]
    term_t_start = t_pos[term_starts[:-1]]
    term_d_end = np.append(term_d_start[1:], len(doc_all))
    term_t_end = np.append(term_t_start[1:], len(tf_all))

    first_docs = np.split(first_docs_all, blk_term_bounds)
    max_tfs = np.split(max_tf_all, blk_term_bounds)
    min_dls = np.split(min_dl_all, blk_term_bounds)
    doc_offs = [
        a - s for a, s in zip(np.split(d_off_all, blk_term_bounds), term_d_start)
    ]
    tf_offs = [
        a - s for a, s in zip(np.split(t_off_all, blk_term_bounds), term_t_start)
    ]
    doc_bytes = [doc_all[s:e] for s, e in zip(term_d_start, term_d_end)]
    tf_bytes = [tf_all[s:e] for s, e in zip(term_t_start, term_t_end)]
    _ = blk_bounds  # (kept for clarity; block ends are implied)
    out = {
        "first_docs": first_docs,
        "doc_offs": doc_offs,
        "tf_offs": tf_offs,
        "max_tfs": max_tfs,
        "min_dls": min_dls,
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
    }
    if positions is not None:
        # token index per posting: CSR over tf
        tok_starts = np.cumsum(tfs) - tfs  # first token idx per posting
        pair_first_tok_mask = np.zeros(len(positions), bool)
        pair_first_tok_mask[tok_starts] = True
        pdeltas = np.empty(len(positions), np.int64)
        pdeltas[1:] = positions[1:] - positions[:-1]
        pdeltas[pair_first_tok_mask] = positions[pair_first_tok_mask]
        p_stream = np.ascontiguousarray(pdeltas, dtype=np.uint64)
        p_nb = _varint_layout(p_stream)
        p_pos = np.cumsum(p_nb) - p_nb
        pos_all = pack_varint(p_stream)
        p_off_all = p_pos[tok_starts[blk_start_idx]]
        term_p_start = p_pos[tok_starts[term_starts[:-1]]]
        term_p_end = np.append(term_p_start[1:], len(pos_all))
        out["pos_offs"] = [
            a - s
            for a, s in zip(np.split(p_off_all, blk_term_bounds), term_p_start)
        ]
        out["pos_bytes"] = [pos_all[s:e] for s, e in zip(term_p_start, term_p_end)]
    return out


def unpack_positions(
    pos_offs: np.ndarray,
    pos_bytes: bytes,
    block_tfs: np.ndarray,
    blocks: np.ndarray,
    n_blocks: int,
) -> np.ndarray:
    """Decode the position stream for selected blocks.

    `block_tfs` must be the decoded tfs of exactly those blocks (posting
    order). Returns the flat positions array aligned with the tokens of
    the selected blocks' postings (use cumsum(tf) boundaries to slice
    per posting).
    """
    pos_ends = np.append(pos_offs[1:], len(pos_bytes))
    buf = np.frombuffer(pos_bytes, np.uint8)
    chunks = [unpack_varint(buf[pos_offs[b] : pos_ends[b]]) for b in blocks]
    if not chunks:
        return np.empty(0, np.int64)
    deltas = np.concatenate(chunks)
    starts_mask = np.zeros(len(deltas), bool)
    starts_mask[np.cumsum(block_tfs) - block_tfs] = True
    return segmented_cumsum(deltas, starts_mask)


def unpack_postings(
    first_docs: np.ndarray,
    doc_offs: np.ndarray,
    tf_offs: np.ndarray,
    doc_bytes: bytes,
    tf_bytes: bytes,
    blocks: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode selected blocks (all when `blocks` is None) of one posting
    list → (doc_ords, tfs). Selective decode is what WAND's block skip
    buys: untouched byte ranges are never parsed."""
    n_blocks = len(first_docs)
    if blocks is None:
        blocks = np.arange(n_blocks)
    if len(blocks) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doc_ends = np.append(doc_offs[1:], len(doc_bytes))
    tf_ends = np.append(tf_offs[1:], len(tf_bytes))
    outs_d: list[np.ndarray] = []
    outs_t: list[np.ndarray] = []
    dbuf = np.frombuffer(doc_bytes, np.uint8)
    tbuf = np.frombuffer(tf_bytes, np.uint8)
    for blk in blocks:
        deltas = unpack_varint(dbuf[doc_offs[blk] : doc_ends[blk]])
        deltas[0] = first_docs[blk]
        outs_d.append(np.cumsum(deltas))
        outs_t.append(unpack_varint(tbuf[tf_offs[blk] : tf_ends[blk]]))
    return np.concatenate(outs_d), np.concatenate(outs_t)
