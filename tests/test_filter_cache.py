"""filterCache (SolrIndexSearcher#getDocSet fq bitsets): a warmed fq
must change NOTHING about results — same hits, same scores — while the
cached per-segment bitset replaces predicate evaluation and the fq
columns drop out of the docmap scan. Entries are bounded and evicted
oldest-first; the liveDocs mask still applies on top of a cache hit.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.deletes import delete_by_query
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents

SPECS = [
    BooleanSpec(must=("merge",), filters=(("role", "assistant"),), k=15),
    BooleanSpec(must=("data",), range_filters=(("turn_idx", "2", "6"),), k=15),
    BooleanSpec(
        must=("scan",), filters=(("role", "user"),),
        not_filters=(("tool", "tool_1"),), k=15,
    ),
    BooleanSpec(must=("table",), exists_filters=("tool",), k=15),
]


@pytest.fixture(scope="module")
def searcher(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fqidx"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    return IndexSearcher(spark, root)


@pytest.mark.parametrize("i", range(len(SPECS)))
def test_cached_fq_identical_results(searcher, i):
    spec = SPECS[i]
    cold = searcher.search(spec).toPandas()
    assert searcher.cache_filter(spec) is True
    assert searcher._fq_cached_bc(spec) is not None  # key canonical
    warm = searcher.search(spec).toPandas()
    assert list(zip(cold.conv_id, cold.turn_idx)) == list(
        zip(warm.conv_id, warm.turn_idx)
    )
    assert np.allclose(cold.score.to_numpy(), warm.score.to_numpy(), atol=1e-12)
    assert len(cold) > 0  # non-degenerate


def test_filterless_spec_is_a_noop(searcher):
    assert searcher.cache_filter(BooleanSpec(must=("merge",))) is False
    assert searcher._fq_cached_bc(BooleanSpec(must=("merge",))) is None


def test_cache_is_bounded_and_evicts_oldest(searcher, monkeypatch):
    monkeypatch.setattr(IndexSearcher, "MAX_FILTER_CACHE", 2)
    searcher._fq_cache.clear()
    a = BooleanSpec(filters=(("role", "system"),))
    b = BooleanSpec(filters=(("role", "user"),))
    c = BooleanSpec(filters=(("role", "assistant"),))
    for s in (a, b, c):
        searcher.cache_filter(s)
    assert len(searcher._fq_cache) == 2
    assert searcher._fq_cached_bc(a) is None  # oldest evicted
    assert searcher._fq_cached_bc(b) is not None
    assert searcher._fq_cached_bc(c) is not None


def test_cache_hit_still_masks_tombstones(spark, sf_dir, tmp_path):
    """liveDocs applies ON TOP of the cached fq bitset — a cache hit
    must never resurrect a deleted doc."""
    root = str(tmp_path / "fqdel")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=3, lineage_source=sf_dir)
    spec = BooleanSpec(must=("merge",), filters=(("role", "assistant"),), k=1000)
    delete_by_query(
        spark, root, BooleanSpec(must=("merge",), range_filters=(("turn_idx", "0", "3"),))
    )
    s = IndexSearcher(spark, root)
    uncached = s.search(spec).toPandas()
    s.cache_filter(spec)
    cached = s.search(spec).toPandas()
    assert list(zip(uncached.conv_id, uncached.turn_idx)) == list(
        zip(cached.conv_id, cached.turn_idx)
    )
    assert len(cached) > 0
    assert all(r.turn_idx > 3 for r in cached.itertuples())
