"""Codec round-trip suite — BasePostingsFormatTestCase analog
(SURVEY §5): random posting lists encode→decode to exact equality;
block-max metadata dominates true block maxima."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index import codec

SEEDS = [0, 1, 7, 42, 1234]


@pytest.mark.parametrize("seed", SEEDS)
def test_varint_roundtrip(seed):
    rng = np.random.default_rng(seed)
    for n in (0, 1, 127, 128, 129, 5000):
        v = rng.integers(0, 2**40, n)
        assert np.array_equal(codec.unpack_varint(codec.pack_varint(v)), v)


@pytest.mark.parametrize("seed", SEEDS)
def test_postings_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    ords = np.sort(rng.choice(10 * n + 10, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, n).astype(np.int64)
    p = codec.pack_postings(ords, tfs)
    d, t = codec.unpack_postings(
        p["first_docs"], p["doc_offs"], p["tf_offs"], p["doc_bytes"], p["tf_bytes"]
    )
    assert np.array_equal(d, ords)
    assert np.array_equal(t, tfs)
    # block-max invariant: stored max >= every tf in block
    for blk in range(p["n_blocks"]):
        lo, hi = blk * codec.BLOCK_SIZE, min(n, (blk + 1) * codec.BLOCK_SIZE)
        assert p["max_tfs"][blk] == tfs[lo:hi].max()


@pytest.mark.parametrize("seed", SEEDS)
def test_selective_block_decode(seed):
    rng = np.random.default_rng(seed)
    n = 1000
    ords = np.sort(rng.choice(50000, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, n).astype(np.int64)
    p = codec.pack_postings(ords, tfs)
    blocks = np.array([0, 3, 7])
    d, t = codec.unpack_postings(
        p["first_docs"], p["doc_offs"], p["tf_offs"], p["doc_bytes"], p["tf_bytes"], blocks
    )
    want = np.concatenate([ords[b * 128 : (b + 1) * 128] for b in blocks])
    assert np.array_equal(d, want)


@pytest.mark.parametrize("seed", SEEDS)
def test_pack_all_equals_per_term(seed):
    rng = np.random.default_rng(seed)
    n_terms = int(rng.integers(1, 80))
    dfs = rng.integers(1, 400, n_terms)
    term_starts = np.concatenate([[0], np.cumsum(dfs)]).astype(np.int64)
    n = int(term_starts[-1])
    doc_ords = np.empty(n, np.int64)
    for i in range(n_terms):
        s, e = term_starts[i], term_starts[i + 1]
        doc_ords[s:e] = np.sort(rng.choice(5000, e - s, replace=False))
    tfs = rng.integers(1, 20, n).astype(np.int64)
    dls = rng.integers(5, 200, n).astype(np.int64)
    allp = codec.pack_all_postings(term_starts, doc_ords, tfs, dls)
    for i in range(n_terms):
        s, e = term_starts[i], term_starts[i + 1]
        single = codec.pack_postings(doc_ords[s:e], tfs[s:e])
        assert np.array_equal(allp["first_docs"][i], single["first_docs"])
        assert np.array_equal(allp["max_tfs"][i], single["max_tfs"])
        assert allp["doc_bytes"][i] == single["doc_bytes"]
        assert allp["tf_bytes"][i] == single["tf_bytes"]
        assert np.array_equal(allp["doc_offs"][i], single["doc_offs"])
        # min_dl invariant
        for b, blk_start in enumerate(range(0, e - s, codec.BLOCK_SIZE)):
            seg = dls[s + blk_start : min(e, s + blk_start + codec.BLOCK_SIZE)]
            assert allp["min_dls"][i][b] == seg.min()
