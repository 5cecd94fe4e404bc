"""Edge-case robustness: empty inputs, empty segments, degenerate
specs — the failure modes a 1000-executor run WILL hit somewhere."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.index.build import build_index, build_segment_pdf
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents


def test_empty_partition_segment():
    """A partition with zero rows builds an empty (valid) segment."""
    pdf = pd.DataFrame({
        "conv_id": pd.Series([], dtype=str),
        "turn_idx": pd.Series([], dtype="int32"),
        "role": pd.Series([], dtype=str),
        "text": pd.Series([], dtype=str),
        "tool": pd.Series([], dtype=str),
        "ts": pd.Series([], dtype="datetime64[us]"),
    })
    seg = build_segment_pdf(pdf, seg_id=0)
    assert seg["metrics"]["n_docs"] == 0
    assert seg["postings"].num_rows == 0
    assert seg["docmap"].num_rows == 0


def test_empty_text_rows():
    """Rows whose text tokenizes to nothing still get doc ords
    (doc_len 0) and never corrupt postings."""
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pd.Series([0, 1, 0], dtype="int32"),
        "role": ["user", "assistant", "user"],
        "text": ["", "!!! ???", "real tokens here"],
        "tool": [None, None, None],
        "ts": pd.to_datetime(["2024-01-01"] * 3),
    })
    seg = build_segment_pdf(pdf, seg_id=0)
    assert seg["metrics"]["n_docs"] == 3
    dm = seg["docmap"].to_pandas()
    assert list(dm.doc_len) == [0, 0, 3]


def test_searcher_on_uncommitted_root(tmp_path, spark):
    with pytest.raises(ValueError, match="no committed snapshot"):
        IndexSearcher(spark, str(tmp_path))


def test_scored_search_rejects_pure_negative(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("edge"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    s = IndexSearcher(spark, root)
    with pytest.raises(ValueError, match="no scoring terms"):
        s.search(BooleanSpec(must_not=("stream",)))
    # contradictory spec (term both required and excluded) is empty,
    # not an error — ReqExclScorer semantics
    assert s.search(BooleanSpec(must=("merge",), must_not=("merge",))).count() == 0
    # filters on every segment still work when the term misses segments
    assert s.docset(
        BooleanSpec(filters=(("role", "nosuchrole"),))
    ).count() == 0


def test_r4_ops_empty_and_boundary_domains(spark, sf_dir, tmp_path_factory):
    """Round-4 surfaces on hostile inputs: a zero-match foreground
    still yields full background relatedness rows (all scores
    negative), blockChildren/uniqueBlock over a no-hit domain are
    empty, early_topk with k > corpus returns every live row in index
    order."""
    from lucene_solr_spark.query.facets import (
        facet_block_domain,
        facet_relatedness,
        facet_unique_block,
    )

    root = str(tmp_path_factory.mktemp("edge4"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    s = IndexSearcher(spark, root)

    rel = facet_relatedness(
        s, "role", BooleanSpec(must=("zzznope",)), limit=20
    ).toPandas()
    assert len(rel) == 4  # every role bucket exists in the background
    assert (rel.fg_count == 0).all()
    assert (rel.relatedness < 0).all()  # -sqrt(bg_pop), never NaN

    assert facet_unique_block(
        s, "role", BooleanSpec(must=("zzznope",)), limit=20
    ).count() == 0
    assert facet_block_domain(
        s, "role", BooleanSpec(must=("zzznope",)), limit=20
    ).count() == 0

    n = t.count()
    head = s.early_topk(n + 50, fields=("role",))
    assert head.count() == n
    first = head.limit(3).collect()
    want = (
        t.select("conv_id", "turn_idx", "role")
        .orderBy("conv_id", "turn_idx").limit(3).collect()
    )
    assert [tuple(r) for r in first] == [tuple(r) for r in want]
