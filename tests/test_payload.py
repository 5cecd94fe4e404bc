"""PayloadScoreQuery (q_idx_payload_score) — pinned contract.

Payloads are the position-rule encoding pay(p) = 1.0 + (p mod 4)
(DelimitedPayloadTokenFilter analog, see
IndexSearcher.payload_score); the PayloadFunction (min/max/sum/avg)
aggregates payloads at the matched term's positions only, replacing
the span score (includeSpanScore=false, the Lucene default).

ref: lucene/queries/src/java/org/apache/lucene/queries/payloads/
PayloadScoreQuery.java + *PayloadFunction.java
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.analyzer import tokenize_one
from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.deletes import delete_by_query
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents


@pytest.fixture(scope="module")
def searcher(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("payidx"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    return IndexSearcher(spark, root), t, root


def _brute(t, term, func, role=None):
    """Independent per-doc payload aggregation over the raw text."""
    out = {}
    for r in t.collect():
        if role is not None and r.role != role:
            continue
        pays = [
            1.0 + (p % 4)
            for p, tok in enumerate(tokenize_one(r.text))
            if tok == term
        ]
        if not pays:
            continue
        v = {
            "sum": sum(pays),
            "max": max(pays),
            "min": min(pays),
            "avg": sum(pays) / len(pays),
        }[func]
        out[(r.conv_id, r.turn_idx)] = v
    return out


@pytest.mark.parametrize("func", ["sum", "max", "min", "avg"])
def test_payload_funcs_duel_brute_force(searcher, func):
    s, t, _ = searcher
    got = s.payload_score("merge", func=func, k=25).collect()
    want = _brute(t, "merge", func)
    # engine top-k must equal the brute ranking under the pinned
    # (score desc, conv_id, turn_idx) total order
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [((r.conv_id, r.turn_idx), r.score) for r in got] == [
        (k, pytest.approx(v)) for k, v in ranked
    ]


def test_payload_filter_narrows_domain(searcher):
    s, t, _ = searcher
    got = s.payload_score(
        "merge", func="max", filters=(("role", "assistant"),), k=1000
    ).collect()
    want = _brute(t, "merge", "max", role="assistant")
    assert {(r.conv_id, r.turn_idx): r.score for r in got} == pytest.approx(
        want
    )
    assert got  # non-degenerate


def test_payload_unknown_func_rejected(searcher):
    s, _, _ = searcher
    with pytest.raises(ValueError, match="payload function"):
        s.payload_score("merge", func="first")


def test_payload_respects_tombstones(spark, sf_dir, tmp_path):
    """payload_score is a docmap read path → the liveDocs mask applies
    (pinned invariant: every new read site masks)."""
    root = str(tmp_path / "pidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=3, lineage_source=sf_dir)
    pre = {(r.conv_id, r.turn_idx)
           for r in IndexSearcher(spark, root)
           .payload_score("merge", k=10_000).collect()}
    delete_by_query(
        spark, root, BooleanSpec(must=("merge",), filters=(("role", "user"),))
    )
    post = {(r.conv_id, r.turn_idx)
            for r in IndexSearcher(spark, root)
            .payload_score("merge", k=10_000).collect()}
    assert post < pre
    want = _brute(t, "merge", "sum")
    dropped = pre - post
    assert dropped and post == set(want) - dropped


def _brute_check(t, terms, payloads, role=None):
    """Independent payload-check span counting over the raw text."""
    out = {}
    n = len(terms)
    for r in t.collect():
        if role is not None and r.role != role:
            continue
        toks = tokenize_one(r.text)
        c = 0
        for p in range(len(toks) - n + 1):
            if all(toks[p + i] == terms[i] for i in range(n)) and all(
                1.0 + ((p + i) % 4) == payloads[i] for i in range(n)
            ):
                c += 1
        if c:
            out[(r.conv_id, r.turn_idx)] = float(c)
    return out


def test_payload_check_duels_brute_force(searcher):
    s, t, _ = searcher
    got = s.payload_check(("table", "scan"), (2.0, 3.0), k=10_000).collect()
    want = _brute_check(t, ("table", "scan"), (2.0, 3.0))
    assert want  # non-degenerate corpus
    assert {(r.conv_id, r.turn_idx): r.score for r in got} == want


def test_payload_check_respects_tombstones(spark, sf_dir, tmp_path):
    """payload_check is a docmap read path → the liveDocs mask applies
    (pinned invariant: every new read site masks)."""
    root = str(tmp_path / "pcidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=3, lineage_source=sf_dir)
    pre = {(r.conv_id, r.turn_idx)
           for r in IndexSearcher(spark, root)
           .payload_check(("table", "scan"), (2.0, 3.0), k=10_000).collect()}
    delete_by_query(
        spark, root, BooleanSpec(must=("table",), filters=(("role", "user"),))
    )
    post = {(r.conv_id, r.turn_idx)
            for r in IndexSearcher(spark, root)
            .payload_check(("table", "scan"), (2.0, 3.0), k=10_000).collect()}
    assert post < pre
    want = _brute_check(t, ("table", "scan"), (2.0, 3.0))
    dropped = pre - post
    assert dropped and post == set(want) - dropped
