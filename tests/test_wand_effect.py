"""Block-max WAND effectiveness: on a skewed corpus the pruned
disjunction must (a) return exactly the exhaustive answer and (b)
actually skip decoding most posting blocks — the optimization is
live, not just correct (SURVEY §4.1 block-max row)."""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.index import codec
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.scorer import TermPostings, score_segment

N_DOCS = 60_000


def _term_row(term: str, docs: np.ndarray, tfs: np.ndarray) -> dict:
    p = codec.pack_postings(docs, tfs)
    n_blocks = p["n_blocks"]
    min_dls = np.full(n_blocks, 100, np.int64)  # uniform doc_len
    return {
        "term": term,
        "first_docs": p["first_docs"],
        "doc_offs": p["doc_offs"],
        "tf_offs": p["tf_offs"],
        "pos_offs": np.zeros(n_blocks, np.int64),
        "max_tfs": p["max_tfs"],
        "min_dls": min_dls,
        "doc_bytes": p["doc_bytes"],
        "tf_bytes": p["tf_bytes"],
        "pos_bytes": b"",
    }


def _skewed_corpus(seed: int):
    """Two frequent terms, tf=1 everywhere except a few hot blocks —
    the shape WAND exists for."""
    rng = np.random.default_rng(seed)
    rows = {}
    for ti, term in enumerate(("alpha", "beta")):
        docs = np.sort(rng.choice(N_DOCS, 30_000, replace=False)).astype(np.int64)
        tfs = np.ones(len(docs), np.int64)
        hot = rng.choice(len(docs), 40, replace=False)
        tfs[hot] = 40 + ti
        rows[term] = _term_row(term, docs, tfs)
    return rows


def test_wand_prunes_and_matches():
    rows = _skewed_corpus(42)
    idf = {"alpha": 2.0, "beta": 2.2}
    doc_len = np.full(N_DOCS, 100, np.int64)
    spec = BooleanSpec(should=("alpha", "beta"), min_should_match=1, k=10)

    # exhaustive control: force the exact path via mm=2→no; instead
    # score with k = huge so WAND's theta never prunes, then take 10
    full_spec = BooleanSpec(should=("alpha", "beta"), min_should_match=1, k=40_000)
    fd, fs = score_segment(full_spec, {t: dict(r) for t, r in rows.items()},
                           idf, 100.0, doc_len, None, 40_000)
    want = list(zip(fd[:10].tolist(), np.round(fs[:10], 9).tolist()))

    # instrument block decodes via TermPostings cache size
    tps: dict[str, TermPostings] = {}
    orig_init = TermPostings.__init__

    decoded: dict[str, set] = {"alpha": set(), "beta": set()}
    orig_decode = TermPostings.decode_blocks

    def spy_decode(self, blocks):
        decoded[self.term].update(np.asarray(blocks).tolist())
        return orig_decode(self, blocks)

    TermPostings.decode_blocks = spy_decode
    try:
        gd, gs = score_segment(spec, {t: dict(r) for t, r in rows.items()},
                               idf, 100.0, doc_len, None, 10)
    finally:
        TermPostings.decode_blocks = orig_decode
    # segment stage may return boundary ties beyond k (the global
    # TakeOrdered applies the final business-key tiebreak); the first
    # k under (score desc, doc asc) must match exhaustive scoring
    got = list(zip(gd[:10].tolist(), np.round(gs[:10], 9).tolist()))

    assert got == want  # rank-identical to exhaustive scoring

    total_blocks = sum(len(r["first_docs"]) for r in rows.values())
    touched = sum(len(v) for v in decoded.values())
    assert touched < total_blocks * 0.5, (
        f"WAND decoded {touched}/{total_blocks} blocks — pruning inactive"
    )
    _ = (tps, orig_init)
