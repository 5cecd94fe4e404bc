"""Segment merge tests (SURVEY §5 / M3): the salted term-keyed merge
must preserve every answer — merged index ≡ original index on the BM25
battery and facets (SegmentMerger correctness re-expressed), global
stats preserved, postings structurally valid (CheckIndex analog)."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from lucene_solr_spark.index import codec
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.index.merge import merge_segments
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.registry import BM25_SPECS
from lucene_solr_spark.transcripts import transcripts_from_documents


@pytest.fixture(scope="module")
def pair(spark, sf_dir, tmp_path_factory):
    """(original searcher, merged searcher) over the same corpus."""
    r1 = str(tmp_path_factory.mktemp("midx_src"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, r1, num_parts=8, lineage_source=sf_dir)
    r2 = r1 + "_merged"
    shutil.copytree(r1, r2)
    merge_segments(spark, r2, merge_factor=4, salt_span=2)
    return IndexSearcher(spark, r1), IndexSearcher(spark, r2)


def test_stats_preserved(pair):
    a, b = pair
    assert a.manifest.n_docs == b.manifest.n_docs
    assert a.manifest.sum_dl == b.manifest.sum_dl
    assert len(b.manifest.segments) == 2  # 8 parts / merge_factor 4


@pytest.mark.parametrize("name", ["bm25_term", "bm25_and", "bm25_or_mm",
                                  "bm25_not", "bm25_phrase", "bm25_filtered"])
def test_merged_rank_identical(pair, name):
    a, b = pair
    spec = BM25_SPECS[name]
    ra = a.search(spec).toPandas()
    rb = b.search(spec).toPandas()
    assert list(zip(ra.conv_id, ra.turn_idx)) == list(zip(rb.conv_id, rb.turn_idx))
    assert np.allclose(ra.score.to_numpy(), rb.score.to_numpy(), atol=1e-9)


@pytest.mark.parametrize("field,spec", [
    ("role", BooleanSpec(must=("merge",))),
    ("tool", BooleanSpec(must=("data",))),
    ("ftok", None),
], ids=["role", "tool", "ftok"])
def test_merged_facets_identical(pair, field, spec):
    a, b = pair
    fa = a.facet(field, spec=spec, limit=15).toPandas()
    fb = b.facet(field, spec=spec, limit=15).toPandas()
    assert list(zip(fa.facet_value, fa.cnt)) == list(zip(fb.facet_value, fb.cnt))


def test_checkindex_merged(pair):
    """Structural invariants on merged postings: doc ords strictly
    increasing within a term, df == decoded posting count, manifest
    term/posting metrics == recount."""
    _, b = pair
    post = b.postings().toPandas()
    total_postings = 0
    for _, row in post.iterrows():
        d, tf = codec.unpack_postings(
            np.asarray(row["first_docs"], np.int64),
            np.asarray(row["doc_offs"], np.int64),
            np.asarray(row["tf_offs"], np.int64),
            row["doc_bytes"], row["tf_bytes"],
        )
        assert (np.diff(d) > 0).all(), row["term"]
        assert len(d) == row["df"], row["term"]
        assert int(tf.sum()) == row["cf"], row["term"]
        assert (tf >= 1).all()
        total_postings += len(d)
    m = Manifest.load(b.manifest.root)
    assert total_postings == sum(s["n_postings"] for s in m.segments.values())


def test_merge_then_search_filtered(pair):
    _, b = pair
    spec = BooleanSpec(must=("query",), filters=(("role", "assistant"),), k=10)
    r = b.search(spec).toPandas()
    assert len(r) > 0


def test_merged_unique_block_identical(pair):
    """uniqueBlock exactness survives merges: whole segments merge, so
    conversation blocks never split and per-segment distinct-conv sums
    stay exact (UniqueBlockAgg contract)."""
    from lucene_solr_spark.query.facets import facet_unique_block

    a, b = pair
    fa = facet_unique_block(
        a, "tool", spec=BooleanSpec(must=("data",)), limit=15
    ).toPandas()
    fb = facet_unique_block(
        b, "tool", spec=BooleanSpec(must=("data",)), limit=15
    ).toPandas()
    assert list(zip(fa.facet_value, fa.cnt, fa.unique_convs)) == list(
        zip(fb.facet_value, fb.cnt, fb.unique_convs)
    )
    # structural sanity: a bucket never has more distinct parents than docs
    assert (fa.unique_convs <= fa.cnt).all()
    assert (fa.unique_convs >= 1).all()


def test_merged_relatedness_identical(pair):
    """relatedness() partials are algebraic (fg/bg counts + sizes), so
    the merged index must produce the identical bucket ranking and
    scores; scores stay inside the formula's [-1, 1] bound."""
    from lucene_solr_spark.query.facets import facet_relatedness

    a, b = pair
    fa = facet_relatedness(
        a, "tool", fg_spec=BooleanSpec(must=("merge",)), limit=15
    ).toPandas()
    fb = facet_relatedness(
        b, "tool", fg_spec=BooleanSpec(must=("merge",)), limit=15
    ).toPandas()
    assert list(zip(fa.facet_value, fa.fg_count, fa.bg_count)) == list(
        zip(fb.facet_value, fb.fg_count, fb.bg_count)
    )
    assert np.allclose(fa.relatedness.to_numpy(), fb.relatedness.to_numpy())
    assert (fa.relatedness.abs() <= 1.0).all()


def test_merged_span_within_and_exists_identical(pair):
    """Round-4 session surfaces survive compaction: the span_within
    DocSet and an exists-filtered search are byte-identical on the
    merged index (positions and docvalues nullness both remap)."""
    a, b = pair
    sw = BooleanSpec(span_within=(("key", ("table", "merge")),), span_slop=4)
    da = a.docset(sw).toPandas().sort_values(["conv_id", "turn_idx"])
    db = b.docset(sw).toPandas().sort_values(["conv_id", "turn_idx"])
    assert list(zip(da.conv_id, da.turn_idx)) == list(zip(db.conv_id, db.turn_idx))

    ex = BooleanSpec(must=("data",), exists_filters=("tool",), k=12)
    ra, rb = a.search(ex).toPandas(), b.search(ex).toPandas()
    assert list(zip(ra.conv_id, ra.turn_idx)) == list(zip(rb.conv_id, rb.turn_idx))
    assert np.allclose(ra.score.to_numpy(), rb.score.to_numpy(), atol=1e-9)


def test_merged_dictionary_and_max_dl_identical(pair):
    """The term dictionary aggregate (term -> df, cf) must survive
    compaction byte-identically — it is the substrate of every
    dictionary op added this round (wordbreak/infix/freetext/tagger) —
    and the merged manifest's per-segment max_dl must re-describe the
    merged docmaps (explain() reads it instead of scanning)."""
    import pandas as pd
    from pyspark.sql import functions as F

    a, b = pair
    def dic(s):
        return (
            s.postings()
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            .toPandas()
            .sort_values("term")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(dic(a), dic(b))

    for name, seg in b.manifest.segments.items():
        d = b.seg_dir_by_id[int(seg["part"])]
        dm = pd.read_parquet(f"{d}/docmap.parquet")
        assert seg["max_dl"] == int(dm["doc_len"].max()), name


def test_merged_payload_check_identical(pair):
    """Payload-residue spans survive compaction byte-identically —
    merge rewrites segments but must preserve every doc's position
    stream, and pay(p)=1+(p mod 4) derives from exactly those
    positions (this session's payload_check read path)."""
    a, b = pair
    pa = a.payload_check(("table", "scan"), (2.0, 3.0), k=10_000).toPandas()
    pb = b.payload_check(("table", "scan"), (2.0, 3.0), k=10_000).toPandas()
    ka = sorted(zip(pa.conv_id, pa.turn_idx, pa.score))
    kb = sorted(zip(pb.conv_id, pb.turn_idx, pb.score))
    assert ka and ka == kb
