"""Round-5 session battery: contracts the oracle comparison alone
can't pin (fuzzy length-band losslessness + its dictionary row cut,
executor-resident cache size discipline)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.registry import cached_searcher


def test_fuzzy_band_is_lossless_and_prunes(spark, sf_dir):
    """The length-band fuzzy predicate (VERDICT r4 item 5) must return
    exactly the unbanded full-levenshtein term set, while the band
    alone cuts the dictionary rows reaching the edit-distance kernel
    by a measurable factor — the LevenshteinAutomata-∩-FST analog's
    'scan row count drops by the band factor' evidence."""
    s = cached_searcher(spark, sf_dir)
    dicts = s.postings().groupBy("term").agg(F.sum("df").alias("df"))

    for q, k in (("merge", 1), ("qurey", 2)):
        banded = {
            r.term for r in dicts.filter(s.fuzzy_predicate(q, k)).collect()
        }
        full = {
            r.term
            for r in dicts.filter(
                F.levenshtein("term", F.lit(q)) <= k
            ).collect()
        }
        assert banded == full, (q, banded ^ full)

    n_dict = dicts.count()
    n_band = dicts.filter(
        F.abs(F.length("term") - F.lit(len("merge"))) <= 1
    ).count()
    # the band must actually prune (numeric tokens + long/short words
    # fall outside |len-5|<=1 on every sf corpus)
    assert n_band < n_dict, (n_band, n_dict)


def test_caches_hold_no_corpus_width_state_on_driver(
    spark, sf_dir, tmp_path_factory
):
    """The 100× scale contract for the cache layer (VERDICT r4 item
    3): after warming a filterCache and a queryResultCache entry, the
    DRIVER-side handle holds only O(#segments) integers — the packed
    bits live as per-segment sidecar files sized ceil(n/8), read back
    only by the task serving that segment. Eviction removes the
    sidecar dir; docset_count on a hit equals the real count without
    touching the bits (warm-time popcounts)."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import IndexSearcher, SegBitsCache
    from lucene_solr_spark.transcripts import transcripts_from_documents

    root = str(tmp_path_factory.mktemp("qcidx"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    s = IndexSearcher(spark, root)

    fq = BooleanSpec(must=("merge",), filters=(("role", "assistant"),), k=15)
    assert s.cache_filter(fq) is True
    ds = BooleanSpec(must=("merge",), k=10)
    s.cache_docset(ds)

    for handle in (s._fq_cached_bc(fq), s._docset_cached_bc(ds)):
        assert isinstance(handle, SegBitsCache)
        assert set(handle.meta) == set(s.seg_dir_by_id)  # one per seg
        for seg_id, (n, pop) in handle.meta.items():
            # driver state is two ints per segment — corpus-width
            # bytes never transit the driver
            assert isinstance(n, int) and isinstance(pop, int)
            assert 0 <= pop <= n
            path = os.path.join(handle.path, f"{seg_id}.bits")
            assert os.path.getsize(path) == (n + 7) // 8

    # numFound fast path: warm popcounts == the real DocSet count
    assert s.docset_count(ds) == s.docset(ds).count()

    # eviction drops the sidecar dir
    handle = s._fq_cache.pop(s._filter_key(fq))
    handle.destroy()
    assert not os.path.exists(handle.path)


def test_y4m_codec_roundtrip():
    """The Y4M encoder/decoder pair is a true codec: the synthesized
    stream carries a parseable YUV4MPEG2 header, FRAME markers at
    exactly plane-stride intervals, and the planes decode back
    bit-identical to the signal definition."""
    import numpy as np

    from lucene_solr_spark.operators.multimodal import (
        _synth_y4m,
        _y4m_params,
        _y4m_planes,
    )

    for doc_id in (0, 2, 5, 11, 17):
        raw = _synth_y4m(doc_id)
        w, h, nf, _, _ = _y4m_params(doc_id)
        header, rest = raw.split(b"\n", 1)
        assert header.startswith(b"YUV4MPEG2 ")
        assert f"W{w}".encode() in header and f"H{h}".encode() in header
        assert rest.count(b"FRAME\n") == nf
        frame_size = len(b"FRAME\n") + 3 * w * h
        assert len(rest) == nf * frame_size
        y, u, v = _y4m_planes(doc_id)
        first = rest[len(b"FRAME\n"):frame_size]
        assert np.array_equal(
            np.frombuffer(first[: w * h], np.uint8), y[0]
        )
        assert np.array_equal(
            np.frombuffer(first[2 * w * h:], np.uint8), v[0]
        )


def test_time_allowed_partial_results(spark, sf_dir):
    """timeAllowed / partialResults (ExitableDirectoryReader): a wide
    request under a 1 ms budget must come back FLAGGED partial (never
    an unflagged answer, never an exception); a generous budget must
    return the identical full page with partialResults=False; a
    non-positive budget is a 400."""
    import pytest

    from lucene_solr_spark.handler import select
    from lucene_solr_spark.registry import cached_searcher

    s = cached_searcher(spark, sf_dir)
    base = {"q": "merge data", "rows": 10, "facet.field": "role"}

    tight = select(s, {**base, "timeAllowed": 1})
    assert tight["partialResults"] is True

    loose = select(s, {**base, "timeAllowed": 10_000_000})
    assert loose["partialResults"] is False
    full = select(s, base)
    want = [(r.conv_id, r.turn_idx, r.score)
            for r in full["response"].collect()]
    got = [(r.conv_id, r.turn_idx, r.score)
           for r in loose["response"].collect()]
    assert got == want and len(got) > 0

    # the budget must not leak into later un-budgeted requests
    again = select(s, base)
    assert [(r.conv_id, r.turn_idx) for r in again["response"].collect()] \
        == [(c, t) for c, t, _ in want]

    with pytest.raises(ValueError):
        select(s, {**base, "timeAllowed": 0})
