"""Round-4 depth batch: termfreq() ValueSource, group.main /
group.format=simple, StemmerOverrideFilter stage.

Pins: termfreq equals the raw token count per doc and masks tombstones
(new docmap read site ⇒ the liveDocs invariant applies), the flattened
grouped doclist is exactly the grouped output re-ordered by (group
rank, doc rank) and group.main=true makes it THE response, and the
override stage pins the custom stem while everything else Porter-stems.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import porter_stem, stemmer_override, tokens_col
from lucene_solr_spark.handler import select
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.deletes import delete_by_query
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.registry import cached_searcher
from lucene_solr_spark.transcripts import transcripts_from_documents


def _rows(df):
    return [tuple(r) for r in df.collect()]


# -- termfreq ValueSource ------------------------------------------------------


def test_termfreq_equals_token_count(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    got = {(r.conv_id, r.turn_idx): r.tf
           for r in s.termfreq("merge").collect()}
    t = transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text"))
    want = {
        (r.conv_id, r.turn_idx): r.tf
        for r in t.select(
            "conv_id", "turn_idx",
            F.size(F.filter("toks", lambda x: x == "merge")).alias("tf"),
        ).filter("tf > 0").collect()
    }
    assert got == want and got


def test_termfreq_absent_term_is_empty(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    assert s.termfreq("zzzznotaterm").count() == 0


def test_termfreq_respects_tombstones(spark, sf_dir, tmp_path):
    """termfreq is a docmap read path → the liveDocs mask applies."""
    root = str(tmp_path / "tfidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=3, lineage_source=sf_dir)
    pre = {(r.conv_id, r.turn_idx)
           for r in IndexSearcher(spark, root).termfreq("merge").collect()}
    delete_by_query(
        spark, root,
        BooleanSpec(must=("merge",), filters=(("role", "user"),)),
    )
    post = {(r.conv_id, r.turn_idx)
            for r in IndexSearcher(spark, root).termfreq("merge").collect()}
    assert post < pre


# -- group.main / group.format=simple -----------------------------------------


_GP = {"q": "data merge", "group": True, "group.field": "role",
       "group.limit": 2, "rows": 2}


def test_group_simple_is_flattened_grouped(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    grouped = select(s, _GP)["grouped"]
    simple = select(s, dict(_GP, **{"group.format": "simple"}))["grouped"]
    # same rows, (group rank, doc rank) order; g_rank is the head order
    g_rows = {(r.group_value, r.conv_id, r.turn_idx, r.score, r.doc_rank)
              for r in grouped.collect()}
    s_rows = [tuple(r) for r in simple.collect()]
    assert {(r[0], r[1], r[2], r[3], r[4]) for r in s_rows} == g_rows
    ranks = [(r[5], r[4]) for r in s_rows]  # (g_rank, doc_rank)
    assert ranks == sorted(ranks)


def test_group_main_replaces_response(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    out = select(s, dict(_GP, **{"group.main": True}))
    flat = out["grouped"]
    resp = out["response"]
    assert resp.columns == ["conv_id", "turn_idx", "score"]
    assert _rows(resp) == _rows(flat.select("conv_id", "turn_idx", "score"))
    # numFound still the full match count, untouched by grouping
    assert out["numFound"] >= resp.count()


def test_group_format_raises(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError, match="group.format"):
        select(s, dict(_GP, **{"group.format": "nested"}))
    with pytest.raises(ValueError, match="need group=true"):
        select(s, {"q": "data", "group.main": True})
    with pytest.raises(ValueError, match="hl/mlt/debug"):
        select(s, dict(_GP, **{"group.main": True, "hl": True,
                               "hl.fl": "text"}))


# -- StemmerOverrideFilter stage ----------------------------------------------


def test_stemmer_override_stage():
    f = stemmer_override({"table": "desk"})
    out = f(pd.Series([["table", "merge", "sort", "value"]]))
    assert out.iloc[0] == [
        "desk", porter_stem("merge"), porter_stem("sort"),
        porter_stem("value"),
    ]
    # the override REPLACES the stem — it is not mere protection
    assert porter_stem("table") != "desk"


def test_stemmer_override_search_matches_surface_docs(spark, sf_dir):
    from lucene_solr_spark.registry import cached_so_searcher

    s = cached_so_searcher(spark, sf_dir)
    hits = s.docset(BooleanSpec(must=("desk",)))
    t = transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text"))
    want = t.filter(F.array_contains("toks", "table")).select(
        "conv_id", "turn_idx")
    assert {(r.conv_id, r.turn_idx) for r in hits.collect()} == \
        {(r.conv_id, r.turn_idx) for r in want.collect()}
    # the Porter form of 'table' does not exist in this index
    assert s.expand_terms(F.col("term") == "tabl") == []
