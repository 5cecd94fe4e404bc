"""fl= doc-transformer contracts ([docid] / [shard] / [explain])."""
from __future__ import annotations

import pytest

from lucene_solr_spark.handler import parse_select_params, select
from lucene_solr_spark.registry import cached_searcher


def test_fl_docid_and_shard_match_index_internals(spark, sf_dir):
    """[docid] = segment docBase + ord (docBases cumulate in seg_id
    order); [shard] = the owning segment's manifest name. Both must
    agree row-for-row with the docmap."""
    s = cached_searcher(spark, sf_dir)
    page = select(s, {
        "q": "merge data",
        "rows": 12,
        "fl": ["conv_id", "turn_idx", "[docid]", "[shard]"],
    })["response"].collect()
    assert len(page) == 12
    segs = sorted(
        (int(sd["part"]), name, int(sd["n_docs"]))
        for name, sd in s.manifest.segments.items()
    )
    base_of, name_of, acc = {}, {}, 0
    for sid, name, nd in segs:
        base_of[sid], name_of[sid] = acc, name
        acc += nd
    dm = {
        (r.conv_id, r.turn_idx): (int(r.seg_id), int(r.doc_ord))
        for r in s.docmap().select(
            "conv_id", "turn_idx", "seg_id", "doc_ord").collect()
    }
    seen = set()
    for r in page:
        sid, ord_ = dm[(r.conv_id, r.turn_idx)]
        assert r.shard == name_of[sid]
        assert r.docid == base_of[sid] + ord_
        assert 0 <= r.docid < acc
        seen.add(r.docid)
    assert len(seen) == 12  # docids are globally unique


def test_fl_explain_strings_sum_to_page_scores(spark, sf_dir):
    """The [explain] pairs re-parse to contribs that sum to each page
    row's rounded score (the engine's pinned explain identity)."""
    s = cached_searcher(spark, sf_dir)
    page = select(s, {
        "q": "merge data",
        "rows": 6,
        "fl": ["conv_id", "turn_idx", "score", "[explain]"],
    })["response"].collect()
    assert len(page) == 6
    for r in page:
        contribs = [
            float(p.rsplit(":", 1)[1]) for p in r.explain.split("; ")
        ]
        assert contribs  # every page doc matches >= 1 scoring term
        assert abs(sum(contribs) - r.score) < 5e-4 * len(contribs)


def test_fl_transformer_validation(spark, sf_dir):
    with pytest.raises(ValueError, match="unknown fl transformer"):
        parse_select_params({"q": "merge", "fl": ["conv_id", "[oops]"]})
    with pytest.raises(ValueError, match="score sort"):
        parse_select_params(
            {"q": "merge", "sort": "ts desc", "fl": ["[explain]"]})
    with pytest.raises(ValueError, match="defType=lucene"):
        parse_select_params(
            {"q": "merge data", "defType": "edismax", "fl": ["[explain]"]})
    # comma-string fl form parses too
    _, o = parse_select_params({"q": "merge", "fl": "conv_id, [docid]"})
    assert o["fl"] == ["conv_id", "docid"]
    assert o["fl_transformers"] == ["docid"]
