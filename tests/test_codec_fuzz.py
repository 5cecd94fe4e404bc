"""Property-based codec fuzz (hypothesis) — the randomized,
seed-reproducible testing layer of SURVEY §5 (LuceneTestCase /
BasePostingsFormatTestCase philosophy): arbitrary posting shapes must
round-trip exactly; block-max metadata must dominate; selective block
decode must equal full decode slices."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.index import codec


@st.composite
def posting_list(draw):
    n = draw(st.integers(1, 600))
    universe = draw(st.integers(n, 4 * n + 16))
    rng = np.random.default_rng(draw(st.integers(0, 2**32 - 1)))
    ords = np.sort(rng.choice(universe, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, draw(st.integers(2, 500)), n).astype(np.int64)
    return ords, tfs


@settings(max_examples=40, deadline=None)
@given(posting_list())
def test_roundtrip_any_shape(pl):
    ords, tfs = pl
    p = codec.pack_postings(ords, tfs)
    d, t = codec.unpack_postings(
        p["first_docs"], p["doc_offs"], p["tf_offs"], p["doc_bytes"], p["tf_bytes"]
    )
    assert np.array_equal(d, ords)
    assert np.array_equal(t, tfs)


@settings(max_examples=25, deadline=None)
@given(posting_list(), st.data())
def test_selective_decode_any_blocks(pl, data):
    ords, tfs = pl
    p = codec.pack_postings(ords, tfs)
    nb = p["n_blocks"]
    blocks = np.array(
        sorted(data.draw(st.sets(st.integers(0, nb - 1), min_size=1, max_size=nb))),
        dtype=np.int64,
    )
    d, t = codec.unpack_postings(
        p["first_docs"], p["doc_offs"], p["tf_offs"],
        p["doc_bytes"], p["tf_bytes"], blocks,
    )
    want_d = np.concatenate(
        [ords[b * codec.BLOCK_SIZE : (b + 1) * codec.BLOCK_SIZE] for b in blocks]
    )
    want_t = np.concatenate(
        [tfs[b * codec.BLOCK_SIZE : (b + 1) * codec.BLOCK_SIZE] for b in blocks]
    )
    assert np.array_equal(d, want_d)
    assert np.array_equal(t, want_t)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 40))
def test_flat_blockmax_dominates(seed, n_terms):
    rng = np.random.default_rng(seed)
    dfs = rng.integers(1, 300, n_terms)
    term_starts = np.concatenate([[0], np.cumsum(dfs)]).astype(np.int64)
    n = int(term_starts[-1])
    ords = np.empty(n, np.int64)
    for i in range(n_terms):
        s, e = term_starts[i], term_starts[i + 1]
        ords[s:e] = np.sort(rng.choice(4000, e - s, replace=False))
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(5, 200, n).astype(np.int64)
    f = codec.pack_all_postings_flat(term_starts, ords, tfs, dls)
    blk = f["blk_offsets"]
    # every stored block-max dominates every tf in its block; min_dl
    # is dominated by every dl (the WAND upper-bound soundness invariant)
    for i in range(n_terms):
        s, e = term_starts[i], term_starts[i + 1]
        t_i, d_i = tfs[s:e], dls[s:e]
        for j, b in enumerate(range(blk[i], blk[i + 1])):
            lo, hi = j * codec.BLOCK_SIZE, min(len(t_i), (j + 1) * codec.BLOCK_SIZE)
            assert f["max_tfs"][b] >= t_i[lo:hi].max()
            assert f["min_dls"][b] <= d_i[lo:hi].min()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**52), max_size=400))
def test_varint_any_values(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(codec.unpack_varint(codec.pack_varint(v)), v)
