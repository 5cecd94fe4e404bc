"""ReRank rq front door (ReRankQParserPlugin) contract tests.

Pins: rerank is ADDITIVE and never restrictive (the match set is the
first pass's — weight 0 reproduces the main ranking exactly, and every
returned key comes from the main head), the combined score equals the
pinned rounded-component blend, the /select rq/rqq leg equals the
direct engine call, the 400-family raises, and the plan shape (both
join-backs broadcast — the corpus never shuffles for the second pass).

ref: solr/core/src/java/org/apache/solr/search/ReRankQParserPlugin.java
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.handler import select
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.registry import cached_searcher

MAIN = BooleanSpec(must=("data",), k=10)
RR = BooleanSpec(must=("fast",))


@pytest.fixture(scope="module")
def searcher(spark, sf_dir):
    return cached_searcher(spark, sf_dir)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_weight_zero_is_main_ranking(searcher):
    got = searcher.rerank(MAIN, RR, re_rank_docs=40, weight=0.0, round_to=4)
    want = searcher.search(MAIN, round_to=4)
    assert _rows(got) == _rows(want)


def test_membership_is_first_pass_only(spark, searcher):
    """The rerank query must not ADD matches: every returned key is in
    the main query's head, even though the rerank query matches docs
    outside it."""
    from dataclasses import replace

    got = searcher.rerank(MAIN, RR, re_rank_docs=40, weight=5.0, round_to=4)
    head = searcher.search(replace(MAIN, k=40), round_to=4)
    head_keys = {(r.conv_id, r.turn_idx) for r in head.collect()}
    got_keys = [(r.conv_id, r.turn_idx) for r in got.collect()]
    assert set(got_keys) <= head_keys
    assert len(got_keys) == min(10, len(head_keys))


def test_combined_score_is_pinned_blend(searcher):
    """combined = round(main_rounded + w * rr_rounded, 4), rr = 0 when
    the rerank query misses the doc — recomposed independently."""
    from dataclasses import replace

    w = 2.0
    got = {(r.conv_id, r.turn_idx): r.score
           for r in searcher.rerank(MAIN, RR, 40, w, round_to=4).collect()}
    main = {(r.conv_id, r.turn_idx): r.score
            for r in searcher.search(replace(MAIN, k=40), round_to=4).collect()}
    rr = {(r.conv_id, r.turn_idx): round(r.score, 4)
          for r in searcher.score_hits(RR, k=None).collect()}
    for key, sc in got.items():
        want = round(main[key] + w * rr.get(key, 0.0), 4)
        assert sc == pytest.approx(want, abs=1e-9), key


def test_rerank_actually_reorders(searcher):
    """With a large weight, some head doc matched by the rerank query
    must overtake a main-only doc (the leg is not a no-op on this
    corpus)."""
    base = [(r.conv_id, r.turn_idx)
            for r in searcher.rerank(MAIN, RR, 40, 0.0, round_to=4).collect()]
    boosted = [(r.conv_id, r.turn_idx)
               for r in searcher.rerank(MAIN, RR, 40, 5.0, round_to=4).collect()]
    assert base != boosted


def test_select_rq_equals_direct_engine(spark, sf_dir, searcher):
    out = select(searcher, {
        "q": "data",
        "rq": "{!rerank reRankQuery=$rqq reRankDocs=40 reRankWeight=2}",
        "rqq": "fast", "rows": 10,
    })
    want = searcher.rerank(MAIN, RR, 40, 2.0, round_to=4)
    assert _rows(out["response"].select("conv_id", "turn_idx", "score")) \
        == _rows(want)
    # numFound stays the MAIN match count (rerank never changes it)
    assert out["numFound"] == searcher.docset(MAIN).count()


def test_select_rq_pages_combined_order(searcher):
    full = select(searcher, {
        "q": "data",
        "rq": "{!rerank reRankQuery=$rqq reRankDocs=40 reRankWeight=2}",
        "rqq": "fast", "rows": 10,
    })["response"]
    page2 = select(searcher, {
        "q": "data",
        "rq": "{!rerank reRankQuery=$rqq reRankDocs=40 reRankWeight=2}",
        "rqq": "fast", "start": 5, "rows": 5,
    })["response"]
    assert _rows(page2.select("conv_id", "turn_idx", "score")) \
        == _rows(full.select("conv_id", "turn_idx", "score"))[5:]


@pytest.mark.parametrize("params,msg", [
    ({"q": "data", "rq": "{!rerank reRankDocs=10 reRankWeight=2}",
      "rqq": "fast"}, "rq must be"),
    ({"q": "data",
      "rq": "{!rerank reRankQuery=$rqq reRankDocs=10 reRankWeight=2}"},
     "no rqq param"),
    ({"q": "data", "rqq": "fast"}, "rqq needs rq"),
    ({"q": "data", "sort": "ts asc",
      "rq": "{!rerank reRankQuery=$rqq reRankDocs=10 reRankWeight=2}",
      "rqq": "fast"}, "field sorts cannot combine"),
    ({"q": "data", "group": True, "group.field": "role",
      "rq": "{!rerank reRankQuery=$rqq reRankDocs=10 reRankWeight=2}",
      "rqq": "fast"}, "group=true"),
    ({"q": "data", "debug": True,
      "rq": "{!rerank reRankQuery=$rqq reRankDocs=10 reRankWeight=2}",
      "rqq": "fast"}, "debug=true"),
    ({"q": "data",
      "rq": "{!rerank reRankQuery=$rqq reRankDocs=10 reRankWeight=2}",
      "rqq": "role:assistant"}, "SCORING"),
    ({"q": "data",
      "rq": "{!rerank reRankQuery=$rqq reRankDocs=0 reRankWeight=2}",
      "rqq": "fast"}, "reRankDocs must be >= 1"),
])
def test_select_rq_raises(searcher, params, msg):
    with pytest.raises(ValueError, match=msg):
        select(searcher, params)


def test_rerank_plan_broadcasts_both_joins(searcher):
    df = searcher.rerank(MAIN, RR, 40, 2.0, round_to=4)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
