"""JSON Request API contracts (handler.json_request).

The JSON body must be a pure re-expression of the classic params
surface: same engine plan, same pages, same component legs — plus the
RequestUtil-style validation (unknown top-level keys are a 400, bool
clauses are single classic clauses, precedence is pinned).
"""
from __future__ import annotations

import pytest

from lucene_solr_spark.handler import (
    compile_json_query, json_request, select,
)
from lucene_solr_spark.registry import (
    _JSON_REQ_BODY, _JSON_REQ_SPEC, cached_searcher,
)


def _keys(df):
    return [(r.conv_id, r.turn_idx) for r in df.collect()]


def test_json_request_equals_classic_twin(spark, sf_dir):
    """The structured body and its hand-mapped classic params produce
    identical pages, numFound, and facet legs."""
    s = cached_searcher(spark, sf_dir)
    j = json_request(s, _JSON_REQ_BODY)
    c = select(s, {
        "q": "+merge data -tool:search",
        "fq": ["role:assistant", "turn_idx:[1 TO 8]"],
        "start": 3, "rows": 12,
        "fl": ["conv_id", "turn_idx", "score"],
    })
    assert _keys(j["response"]) == _keys(c["response"])
    assert j["numFound"] == c["numFound"]


def test_json_request_facet_leg_maps_to_json_facet(spark, sf_dir):
    """Top-level ``facet`` is exactly the classic json.facet param."""
    s = cached_searcher(spark, sf_dir)
    jf = {"roles": {"type": "terms", "field": "role", "limit": 3}}
    j = json_request(s, {"query": "merge", "facet": jf})
    c = select(s, {"q": "merge", "json.facet": jf})
    jb = {tuple(r) for r in j["facets"]["roles"].collect()}
    cb = {tuple(r) for r in c["facets"]["roles"].collect()}
    assert jb == cb and jb


def test_json_request_precedence_and_params_block(spark, sf_dir):
    """Structured top-level keys win over the params block; params-only
    keys pass through untouched."""
    s = cached_searcher(spark, sf_dir)
    j = json_request(s, {
        "query": "merge data",
        "limit": 5,
        # the block tries to override q and rows — both lose; q.op
        # passes through and tightens the clause arithmetic
        "params": {"q": "scan", "rows": 40, "q.op": "AND"},
    })
    c = select(s, {"q": "merge data", "q.op": "AND", "rows": 5})
    assert _keys(j["response"]) == _keys(c["response"])
    assert len(_keys(j["response"])) == 5


def test_json_query_dsl_compile_shapes():
    """compile_json_query: the three parser kinds and the bool
    occur-bucket mapping."""
    assert compile_json_query("a b") == ({"q": "a b"}, [])
    assert compile_json_query({"lucene": "a b"}) == ({"q": "a b"}, [])
    assert compile_json_query(
        {"lucene": {"query": "a b", "q.op": "AND"}}
    ) == ({"q": "a b", "q.op": "AND"}, [])
    assert compile_json_query(
        {"edismax": {"query": "a b", "mm": 2, "ps": 1}}
    ) == ({"q": "a b", "defType": "edismax", "mm": 2, "ps": 1}, [])
    frag, fq = compile_json_query({"bool": {
        "must": ['"table scan"'], "should": ["merge", "data"],
        "must_not": ["tool:search"], "filter": ["role:user"],
    }})
    assert frag == {"q": '+"table scan" merge data -tool:search'}
    assert fq == ["role:user"]


@pytest.mark.parametrize("bad", [
    # unknown parser kind
    {"knn_oops": "x"},
    # two-key query object
    {"lucene": "a", "bool": {"must": ["b"]}},
    # bool: multi-clause string smuggled into one slot
    {"bool": {"must": ["merge data"]}},
    # bool: clause carrying its own occur prefix
    {"bool": {"must": ["-merge"]}},
    # bool: non-string clause
    {"bool": {"must": [{"lucene": "x"}]}},
    # bool: no scoring clause (filter-only / pure-negative)
    {"bool": {"filter": ["role:user"]}},
    {"bool": {"must_not": ["merge"]}},
    # lucene object: unknown key
    {"lucene": {"query": "a", "df": "text"}},
    # edismax: missing query
    {"edismax": {"mm": 2}},
])
def test_json_query_dsl_rejects(bad):
    with pytest.raises(ValueError):
        compile_json_query(bad)


def test_json_request_top_level_validation(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError, match="unknown top-level"):
        json_request(s, {"query": "merge", "qurey": "typo"})
    with pytest.raises(ValueError, match="params"):
        json_request(s, {"query": "merge", "params": ["not", "a", "dict"]})
    with pytest.raises(ValueError, match="filter"):
        json_request(s, {"query": "merge",
                         "filter": [{"bool": {"must": ["x"]}}]})
    # quoted-phrase and range clauses keep their internal spaces
    frag, fq = compile_json_query({"bool": {
        "must": ["merge"], "filter": ["turn_idx:[1 TO 8]"],
    }})
    assert fq == ["turn_idx:[1 TO 8]"]


def test_json_request_filter_merges_with_bool_filter(spark, sf_dir):
    """Top-level filter, bool-bucket filter, and a params-block fq all
    land in ONE conjunctive fq mask."""
    from lucene_solr_spark.handler import parse_select_params

    s = cached_searcher(spark, sf_dir)
    j = json_request(s, {
        "query": {"bool": {"must": ["merge"],
                           "filter": ["turn_idx:[1 TO 8]"]}},
        "filter": "role:assistant",
        "params": {"fq": "tool:*"},
    })
    spec, _ = parse_select_params({
        "q": "+merge",
        "fq": ["tool:*", "role:assistant", "turn_idx:[1 TO 8]"],
    })
    c = select(s, {"q": "+merge",
                   "fq": ["tool:*", "role:assistant", "turn_idx:[1 TO 8]"]})
    assert spec.exists_filters == ("tool",)
    assert _keys(j["response"]) == _keys(c["response"])
