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


# -- json.facet domain.filter ---------------------------------------------------


def test_jf_domain_filter_narrows_one_bucket_only(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    jf = ('{"all_tools": {"type": "terms", "field": "tool", "limit": 50},'
          ' "asst_tools": {"type": "terms", "field": "tool", "limit": 50,'
          ' "domain": {"filter": "role:assistant"}}}')
    out = select(s, {"q": "data", "rows": 3, "json.facet": jf})
    allc = {r.facet_value: r.cnt for r in out["facets"]["all_tools"].collect()}
    asst = {r.facet_value: r.cnt
            for r in out["facets"]["asst_tools"].collect()}
    # the filtered bucket is a strict narrowing; the sibling keeps the
    # unfiltered domain, as does numFound
    assert sum(asst.values()) < sum(allc.values())
    assert all(asst[k] <= allc[k] for k in asst)
    direct = s.facet("tool", spec=BooleanSpec(
        must=("data",), filters=(("role", "assistant"),)), limit=50)
    assert asst == {r.facet_value: r.cnt for r in direct.collect()}


def test_jf_domain_filter_raises(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError,
                       match="excludeTags, filter and/or query"):
        select(s, {"q": "data", "json.facet":
                   '{"x": {"type": "terms", "field": "tool",'
                   ' "domain": {"fg": 1}}}'})
    with pytest.raises(ValueError, match="pure filter|scoring"):
        select(s, {"q": "data", "json.facet":
                   '{"x": {"type": "terms", "field": "tool",'
                   ' "domain": {"filter": "merge"}}}'})


# -- atomic removeregex ----------------------------------------------------------


def test_atomic_removeregex_whole_value_match(spark):
    from lucene_solr_spark.query.realtime import atomic_update

    committed = spark.createDataFrame(
        [("c1", 0, ["tool_7", "tool", "extra_9"])],
        "conv_id string, turn_idx int, tags array<string>",
    )
    ops = spark.createDataFrame(
        [("c1", 0, 2, "tags", "removeregex", "tool_[0-9]+"),
         ("c1", 0, 3, "tags", "add", "tool_99"),
         ("c1", 0, 4, "tags", "removeregex", "extra_.*")],
        "conv_id string, turn_idx int, _version_ long, field string,"
        " kind string, value string",
    )
    got = atomic_update(committed, ops, fields=[], arr_fields=["tags"])
    row = got.first()
    # whole-value match: bare 'tool' survives tool_[0-9]+; the add
    # AFTER the removeregex survives it; extra_9 drops at v4
    assert row.tags == ["tool", "tool_99"]
    assert row._version_ == 4


# -- /suggest and /mlt handler front doors ---------------------------------------


def test_suggest_handler_contract(spark, sf_dir):
    from lucene_solr_spark.handler import suggest

    s = cached_searcher(spark, sf_dir)
    prefix = suggest(s, {"suggest.q": "s", "suggest.count": 3})
    rows = prefix.collect()
    assert all(r.suggestion.startswith("s") for r in rows)
    assert 0 < len(rows) <= 3
    # infix matches where prefix cannot
    infix = suggest(s, {"suggest.q": "er", "suggest.count": 5,
                        "suggest.dictionary": "infix"})
    irows = infix.collect()
    assert any(not r.suggestion.startswith("er") for r in irows)
    # weights descend within a fragment
    ws = [r.weight for r in irows]
    assert ws == sorted(ws, reverse=True)
    with pytest.raises(ValueError, match="unknown /suggest"):
        suggest(s, {"suggest.q": "s", "bogus": 1})
    with pytest.raises(ValueError, match="suggest.q"):
        suggest(s, {"suggest.count": 3})
    with pytest.raises(ValueError, match="prefix|infix"):
        suggest(s, {"suggest.q": "s", "suggest.dictionary": "fst"})


def test_mlt_handler_equals_engine(spark, sf_dir):
    from lucene_solr_spark.handler import mlt

    s = cached_searcher(spark, sf_dir)
    stored = transcripts_from_documents(spark, sf_dir)
    out = mlt(s, {"q": "id:conv00000003#2", "mlt.count": 5,
                  "mlt.maxqt": 5, "mlt.interestingTerms": "list"}, stored)
    src = stored.filter(
        "conv_id = 'conv00000003' AND turn_idx = 2").first()
    want = s.more_like_this("conv00000003", 2, src.text,
                            max_terms=5, k=5, round_to=4)
    assert _rows(out["response"]) == _rows(want)
    terms = out["interestingTerms"].collect()
    assert len(terms) == 5
    assert [t.term for t in terms] == \
        [t for t, _ in s.interesting_terms(src.text, 5)]
    with pytest.raises(ValueError, match="id:"):
        mlt(s, {"q": "merge"}, stored)
    with pytest.raises(ValueError, match="not found"):
        mlt(s, {"q": "id:convFFFFFFFF#0"}, stored)
    with pytest.raises(ValueError, match="none|list"):
        mlt(s, {"q": "id:conv00000003#2",
                "mlt.interestingTerms": "details"}, stored)


# -- /analysis handler front door -------------------------------------------------


def test_analysis_handler_stages_and_match(spark):
    from lucene_solr_spark.analyzer import porter_stem
    from lucene_solr_spark.handler import analysis

    out = analysis(spark, {
        "analysis.fieldvalue": "The merged tables are scanning data",
        "analysis.fieldtype": "text_en",
        "analysis.query": "merging scanned",
    }).collect()
    stages = {(r.part, r.stage): [x.token for x in out
                                  if (x.part, x.stage) == (r.part, r.stage)]
              for r in out}
    assert stages[("index", "tokenizer")] == \
        ["the", "merged", "tables", "are", "scanning", "data"]
    # stop words drop, positions reindex
    assert "the" not in stages[("index", "stop_filter")]
    # porter runs last
    assert porter_stem("merged") in stages[("index", "porter_filter")]
    # match marks ONLY final-stage index tokens in the query's final set
    q_final = set(stages[("query", "porter_filter")])
    for r in out:
        want = (r.part == "index" and r.stage == "porter_filter"
                and r.token in q_final)
        assert r.match == want
    assert any(r.match for r in out)  # 'merg'/'scan' intersect


def test_analysis_handler_text_general_and_raises(spark):
    from lucene_solr_spark.handler import analysis

    out = analysis(spark, {"analysis.fieldvalue": "The Big Merge"})
    assert {r.stage for r in out.collect()} == {"tokenizer"}
    assert [r.token for r in out.collect()] == ["the", "big", "merge"]
    assert not any(r.match for r in out.collect())  # no query given
    with pytest.raises(ValueError, match="unknown /analysis"):
        analysis(spark, {"analysis.fieldvalue": "x", "bogus": 1})
    with pytest.raises(ValueError, match="fieldvalue"):
        analysis(spark, {"analysis.fieldtype": "text_en"})
    with pytest.raises(ValueError, match="unknown field type"):
        analysis(spark, {"analysis.fieldvalue": "x",
                         "analysis.fieldtype": "text_fst"})


# -- facet.excludeTerms + hl.tag.pre/post ----------------------------------------


def test_facet_exclude_terms_drops_before_limit(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    base = select(s, {"q": "data", "rows": 0, "facet.field": "tool",
                      "facet.limit": 50})["facet_counts"]["tool"]
    allc = {r.facet_value: r.cnt for r in base.collect()}
    top3 = sorted(allc, key=lambda t: (-allc[t], t))[:3]
    out = select(s, {"q": "data", "rows": 0, "facet.field": "tool",
                     "facet.limit": 50,
                     "facet.excludeTerms": ",".join(top3)})
    got = {r.facet_value: r.cnt
           for r in out["facet_counts"]["tool"].collect()}
    # excluded values vanish; every surviving bucket keeps its count
    assert not set(top3) & set(got)
    assert got == {k: v for k, v in allc.items() if k not in top3}


def test_hl_tag_markers_substitute(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    stored = transcripts_from_documents(spark, sf_dir)
    base = select(s, {"q": "merge data", "rows": 5, "hl": True},
                  stored=stored)["highlighting"].collect()
    cust = select(s, {"q": "merge data", "rows": 5, "hl": True,
                      "hl.tag.pre": "[", "hl.tag.post": "]"},
                  stored=stored)["highlighting"].collect()
    assert len(base) == len(cust) > 0
    for b, c in zip(base, cust):
        assert (b.conv_id, b.turn_idx) == (c.conv_id, c.turn_idx)
        assert c.snippet == b.snippet.replace("<em>", "[").replace(
            "</em>", "]")
    assert any("[" in c.snippet for c in cust)
    # passage mode rides the same markers
    p = select(s, {"q": "merge data", "rows": 3, "hl": True,
                   "hl.snippets": 2, "hl.fragsize": 8,
                   "hl.tag.pre": "{", "hl.tag.post": "}"},
               stored=stored)["highlighting"].collect()
    assert p and all("<em>" not in r.snippet for r in p)
    assert any("{" in r.snippet for r in p)


def test_hl_tag_raises(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError, match="need hl=true"):
        select(s, {"q": "merge", "hl.tag.pre": "["})
    with pytest.raises(ValueError, match="bad hl.tag"):
        select(s, {"q": "merge", "hl": True, "hl.tag.pre": "'"})
    with pytest.raises(ValueError, match="bad hl.tag"):
        select(s, {"q": "merge", "hl": True, "hl.tag.post": ""})


# -- /terms dictionary paging -----------------------------------------------------


def test_terms_bounds_paging(spark, sf_dir):
    from lucene_solr_spark.handler import terms

    s = cached_searcher(spark, sf_dir)
    full = [r.term for r in terms(s, {
        "terms.sort": "index", "terms.limit": 1000}).collect()]
    # walk the dictionary in two pages split at a pivot term: lower
    # inclusive + upper exclusive defaults mean no gap, no overlap
    pivot = full[len(full) // 2]
    p1 = [r.term for r in terms(s, {
        "terms.upper": pivot, "terms.sort": "index",
        "terms.limit": 1000}).collect()]
    p2 = [r.term for r in terms(s, {
        "terms.lower": pivot, "terms.sort": "index",
        "terms.limit": 1000}).collect()]
    assert p1 + p2 == full
    # flipping inclusivity moves the pivot between the pages
    p1i = [r.term for r in terms(s, {
        "terms.upper": pivot, "terms.upper.incl": True,
        "terms.sort": "index", "terms.limit": 1000}).collect()]
    assert p1i == p1 + [pivot]
    with pytest.raises(ValueError, match="needs terms.lower"):
        terms(s, {"terms.lower.incl": False})


def test_terms_list_exact_stats(spark, sf_dir):
    from lucene_solr_spark.handler import terms

    s = cached_searcher(spark, sf_dir)
    # ground truth from the open dictionary walk
    full = {r.term: r.df for r in terms(s, {
        "terms.sort": "index", "terms.limit": 10000,
        "terms.mincount": 1}).collect()}
    known = sorted(full)[:3]
    got = terms(s, {"terms.list": known + ["zzz_not_a_term"]}).collect()
    # absent terms don't appear; present ones carry the dictionary df,
    # in index order, un-capped by the default limit=10
    assert [r.term for r in got] == known
    assert all(r.df == full[r.term] for r in got)
    # comma-string spelling and list spelling agree
    got_csv = terms(s, {"terms.list": ",".join(known)}).collect()
    assert [(r.term, r.df) for r in got_csv] == \
        [(r.term, r.df) for r in got]
    # ttf rides along
    t = terms(s, {"terms.list": known[0], "terms.ttf": True}).collect()
    assert t[0].ttf >= t[0].df
    # exclusive with the other narrowing modes
    with pytest.raises(ValueError, match="exclusive"):
        terms(s, {"terms.list": "a", "terms.prefix": "a"})
    with pytest.raises(ValueError, match="empty terms.list"):
        terms(s, {"terms.list": " , "})


# -- group paging (start offsets GROUPS) -------------------------------------------


def test_group_paging_walks_rank_order(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    base = {"q": "data", "group": True, "group.field": "conv_id",
            "group.format": "simple"}
    full = select(s, dict(base, rows=6))["grouped"].collect()
    ranks = [(r.group_value, r.g_rank) for r in full]
    # two pages of 3 groups re-assemble the 6-group list, gap-free
    p1 = select(s, dict(base, rows=3))["grouped"].collect()
    p2 = select(s, dict(base, rows=3, start=3))["grouped"].collect()
    assert [(r.group_value, r.g_rank) for r in p1] + \
        [(r.group_value, r.g_rank) for r in p2] == ranks
    # g_rank stays ABSOLUTE across pages (rank 4.. on page 2)
    assert [r.g_rank for r in p2] == [4, 5, 6]
    # grouped format pages the same selection
    g2 = select(s, dict(base, rows=3, start=3,
                        **{"group.format": "grouped"}))["grouped"].collect()
    assert {r.group_value for r in g2} == {r.group_value for r in p2}


# -- cursorMark through /select ----------------------------------------------------


def test_select_cursor_mark_walks_pages(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    q = {"q": "merge data", "rows": 4}
    pages, mark = [], "*"
    for _ in range(3):
        out = select(s, dict(q, cursorMark=mark))
        pages += [tuple(r) for r in out["response"].collect()]
        mark = out["nextCursorMark"]
    offset = select(s, {"q": "merge data", "rows": 12})
    assert pages == [tuple(r) for r in offset["response"].collect()]
    # exhausted cursor echoes the mark back with an empty page
    deep = select(s, dict(q, cursorMark="0.0001|zzzz|0"))
    assert deep["response"].count() == 0
    assert deep["nextCursorMark"] == "0.0001|zzzz|0"


def test_select_cursor_mark_raises(spark, sf_dir):
    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError, match="start=0"):
        select(s, {"q": "merge", "cursorMark": "*", "start": 3})
    # r5 relaxed the score-sort-only rule: FIELD sorts now cursor too
    # (never-null docvalues fields); the r4 restriction survives as
    # the nullable-field / sortMissing rejections
    with pytest.raises(ValueError, match="never-null"):
        select(s, {"q": "merge", "cursorMark": "*",
                   "sort": "tool asc"})
    with pytest.raises(ValueError, match="sortMissing"):
        select(s, {"q": "merge", "cursorMark": "*",
                   "sort": "turn_idx asc", "sortMissing": "last"})
    fielded = select(s, {"q": "merge", "cursorMark": "*", "rows": 3,
                         "sort": "turn_idx asc"})
    assert fielded["response"].count() == 3
    with pytest.raises(ValueError, match="plain doclist"):
        select(s, {"q": "merge", "cursorMark": "*", "facet.field": "role"})
    with pytest.raises(ValueError, match="malformed cursorMark"):
        select(s, {"q": "merge", "cursorMark": "not|a"})
    with pytest.raises(ValueError, match="malformed cursorMark"):
        select(s, {"q": "merge", "cursorMark": "x|y|z"})


# -- wt= response writers -----------------------------------------------------------


def test_select_wt_writers_roundtrip(spark, sf_dir):
    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    from lucene_solr_spark.sources.javabin import decode_rows
    from lucene_solr_spark.sources.xml_source import decode_xml

    s = cached_searcher(spark, sf_dir)
    plain = select(s, {"q": "merge data", "rows": 6})["response"].collect()
    want = sorted((r.conv_id, r.turn_idx, r.score) for r in plain)

    xml = select(s, {"q": "merge data", "rows": 6, "wt": "xml"})["response"]
    xb = decode_xml(xml, ["conv_id", "turn_idx", "score"]).collect()
    assert sorted((r.conv_id, int(r.turn_idx), float(r.score))
                  for r in xb) == want

    jb = select(s, {"q": "merge data", "rows": 6,
                    "wt": "javabin"})["response"]
    sch = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("score", DoubleType()),
    ])
    back = decode_rows(jb, sch).collect()
    assert sorted(map(tuple, back)) == want

    with pytest.raises(ValueError, match="wt must be"):
        select(s, {"q": "merge", "wt": "python"})


# -- extended json.facet metric kinds (sumsq/stddev/variance/missing/
#    countvals/unique) ---------------------------------------------------------


def test_facet_metrics_extended_kinds_brute(spark, sf_dir):
    """The six new FacetModule agg kinds equal a brute recompute over
    the domain frame; stddev/variance are the SAMPLE estimators on the
    null-excluded values; unique/countvals/missing are null-aware."""
    import math

    s = cached_searcher(spark, sf_dir)
    spec = BooleanSpec(must=("merge",))
    got = {r.facet_value: r for r in __import__(
        "lucene_solr_spark.query.facets", fromlist=["facet_metrics"]
    ).facet_metrics(
        s, "role", spec=spec, limit=10,
        aggs=(("sumsq", "doc_len"), ("stddev", "doc_len"),
              ("variance", "doc_len"), ("unique", "tool"),
              ("countvals", "tool"), ("missing", "tool")),
    ).collect()}
    t = transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text"))
    dom = t.filter(F.array_contains("toks", "merge")).select(
        "role", "tool", F.size("toks").alias("dl")).collect()
    by_role: dict = {}
    for r in dom:
        by_role.setdefault(r.role, []).append((r.dl, r.tool))
    assert set(got) == set(by_role)
    for role, rows in by_role.items():
        g = got[role]
        dls = [d for d, _ in rows]
        tools = [tl for _, tl in rows if tl is not None]
        assert g.cnt == len(rows)
        assert g.sumsq_doc_len == round(float(sum(d * d for d in dls)), 4)
        mean = sum(dls) / len(dls)
        var = (sum((d - mean) ** 2 for d in dls) / (len(dls) - 1)
               if len(dls) > 1 else 0.0)
        assert abs(g.variance_doc_len - var) < 1e-3
        assert abs(g.stddev_doc_len - math.sqrt(var)) < 1e-3
        assert g.unique_tool == len(set(tools))
        assert g.countvals_tool == len(tools)
        assert g.missing_tool == len(rows) - len(tools)


def test_facet_metrics_kind_contracts(spark, sf_dir):
    from lucene_solr_spark.query.facets import facet_metrics

    s = cached_searcher(spark, sf_dir)
    with pytest.raises(ValueError, match="unknown facet metric kind"):
        facet_metrics(s, "role", aggs=(("median", "doc_len"),))
    # sort may rank on any new output column
    df = facet_metrics(
        s, "role", spec=BooleanSpec(must=("merge",)), limit=2,
        aggs=(("stddev", "doc_len"),), sort="stddev_doc_len")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0].stddev_doc_len >= rows[1].stddev_doc_len


def test_select_json_facet_extended_kinds(spark, sf_dir):
    """/select json.facet accepts the new kinds (keys stay
    <kind>_<col>), routes them into the same sparse pass, and rejects
    numeric kinds on string columns."""
    from lucene_solr_spark.query.facets import facet_metrics

    s = cached_searcher(spark, sf_dir)
    resp = select(s, {
        "q": "merge", "rows": 0,
        "json.facet": {"by_role": {
            "type": "terms", "field": "role",
            "facet": {"unique_tool": "unique(tool)",
                      "stddev_doc_len": "stddev(doc_len)"},
        }},
    })
    got = {r.facet_value: (r.unique_tool, r.stddev_doc_len)
           for r in resp["facets"]["by_role"].collect()}
    want = {r.facet_value: (r.unique_tool, r.stddev_doc_len)
            for r in facet_metrics(
                s, "role", spec=BooleanSpec(must=("merge",)), limit=10,
                aggs=(("unique", "tool"), ("stddev", "doc_len")),
            ).collect()}
    assert got == want
    for bad in ("sum(tool)", "stddev(role)", "median(doc_len)"):
        with pytest.raises(ValueError, match="sub-agg"):
            select(s, {"q": "merge", "rows": 0, "json.facet": {
                "x": {"type": "terms", "field": "role",
                      "facet": {bad.split("(")[0] + "_" +
                                bad.split("(")[1][:-1]: bad}}}})


# -- /sql Parallel SQL handler ------------------------------------------------


def test_sql_parse_contracts(spark, sf_dir):
    """SQLHandler 400 analogs: everything outside the subset raises
    with a message naming the violation — nothing silently degrades."""
    from lucene_solr_spark.sql import parse_sql, sql_query

    s = cached_searcher(spark, sf_dir)
    for bad, msg in [
        ("SELECT nope FROM t", "unknown column"),
        ("SELECT COUNT(*) FROM t", "needs AS"),
        ("SELECT SUM(role) AS x FROM t", "numeric column"),
        ("SELECT role, COUNT(*) AS c FROM t GROUP BY conv_id",
         "GROUP BY supports"),
        ("SELECT role FROM t GROUP BY role", "at least one aggregate"),
        ("SELECT COUNT(*) AS c FROM t HAVING c > 1", "HAVING needs"),
        ("SELECT role, COUNT(*) AS c FROM t GROUP BY role LIMIT 0",
         "LIMIT must be"),
        ("SELECT COUNT(*) AS c, role FROM t", "cannot mix"),
        ("SELECT role FROM t WHERE text > 'x' ORDER BY ts LIMIT 1",
         "text predicates"),
        ("SELECT role FROM t WHERE ts < '2024' ORDER BY ts LIMIT 1",
         "strict <"),
        ("SELECT COUNT(DISTINCT *) AS c FROM t", "DISTINCT"),
    ]:
        with pytest.raises(ValueError, match=msg):
            parse_sql(bad)
    # plain SELECT without ORDER BY raises at execution (the /export
    # sorted-stream contract)
    with pytest.raises(ValueError, match="needs ORDER BY"):
        sql_query(s, "SELECT role FROM transcripts LIMIT 3")


def test_sql_or_group_contracts():
    """OR groups: the two pinned shapes compile to SHOULD+mm=1 /
    in_filters; everything else inside parens raises."""
    from lucene_solr_spark.sql import parse_sql

    plan = parse_sql(
        "SELECT conv_id, turn_idx FROM t WHERE text = 'merge' AND "
        "(text = 'scan' OR text = 'sort') ORDER BY ts LIMIT 5")
    spec = plan["spec"]
    assert spec.must == ("merge",)
    assert spec.should == ("scan", "sort")
    assert spec.min_should_match == 1

    plan = parse_sql(
        "SELECT role, COUNT(*) AS c FROM t WHERE "
        "(role = 'user' OR role = 'tool') GROUP BY role")
    assert plan["spec"].in_filters == (("role", ("user", "tool")),)

    for bad, msg in [
        # mixed fields in one group
        ("SELECT role FROM t WHERE (role = 'user' OR tool = 't') "
         "ORDER BY ts LIMIT 1", "one field"),
        # second text OR group would share the SHOULD bucket
        ("SELECT role FROM t WHERE (text = 'a' OR text = 'b') AND "
         "(text = 'c' OR text = 'd') ORDER BY ts LIMIT 1",
         "one text OR group"),
        # non-equality inside a group
        ("SELECT role FROM t WHERE (turn_idx < 3 OR turn_idx > 5) "
         "ORDER BY ts LIMIT 1", "only '='"),
        # AND inside parens
        ("SELECT role FROM t WHERE (role = 'user' AND tool = 't') "
         "ORDER BY ts LIMIT 1", "OR-only"),
        # multi-token text disjunct
        ("SELECT role FROM t WHERE (text = 'a b' OR text = 'c') "
         "ORDER BY ts LIMIT 1", "one\\s+term"),
    ]:
        with pytest.raises(ValueError, match=msg):
            parse_sql(bad)


def test_sql_score_mode_contracts(spark, sf_dir):
    """ORDER BY score: desc-only, needs a scoring predicate and a
    LIMIT; bare score column without score order raises."""
    from lucene_solr_spark.sql import parse_sql, sql_query

    s = cached_searcher(spark, sf_dir)
    for bad, msg in [
        ("SELECT conv_id FROM t WHERE text = 'merge' "
         "ORDER BY score ASC LIMIT 3", "DESC only"),
        ("SELECT conv_id FROM t WHERE role = 'user' "
         "ORDER BY score DESC LIMIT 3", "scoring "),
        ("SELECT conv_id FROM t WHERE text = 'merge' "
         "ORDER BY score DESC", "needs LIMIT"),
        ("SELECT conv_id, score FROM t WHERE text = 'merge' "
         "ORDER BY ts DESC LIMIT 3", "requires\\s+ORDER BY score"),
    ]:
        with pytest.raises(ValueError, match=msg):
            plan = parse_sql(bad)
            sql_query(s, bad)
    # ranked mode equals the engine's search() directly
    from lucene_solr_spark.query.model import BooleanSpec

    got = sql_query(
        s, "SELECT conv_id, turn_idx, score FROM transcripts "
           "WHERE text = 'merge' ORDER BY score DESC LIMIT 5").collect()
    want = s.search(BooleanSpec(must=("merge",), k=5),
                    round_to=4).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in got] == \
        [(r.conv_id, r.turn_idx, r.score) for r in want]


def test_sql_facet_mode_equals_engine(spark, sf_dir):
    """GROUP BY mode must equal the facet_metrics engine result
    directly (same spec, same kinds) — the SQL layer adds parsing,
    never new math."""
    from lucene_solr_spark.query.facets import facet_metrics
    from lucene_solr_spark.sql import sql_query

    s = cached_searcher(spark, sf_dir)
    got = sql_query(
        s, "SELECT role, COUNT(*) AS cnt, MIN(doc_len) AS mn "
           "FROM transcripts WHERE text = 'merge' "
           "GROUP BY role ORDER BY cnt DESC LIMIT 10").collect()
    want = {r.facet_value: (r.cnt, r.min_doc_len) for r in facet_metrics(
        s, "role", spec=BooleanSpec(must=("merge",)),
        aggs=(("min", "doc_len"),), limit=10).collect()}
    assert {r.role: (r.cnt, int(r.mn)) for r in got} == {
        k: (c, int(m)) for k, (c, m) in want.items()}


def test_sql_doclist_plan_is_take_ordered(spark, sf_dir):
    """Plain SELECT + LIMIT plans as a distributed TakeOrdered off the
    pruned docmap columns — never a global Sort, never a cartesian."""
    from lucene_solr_spark.sql import sql_query

    s = cached_searcher(spark, sf_dir)
    df = sql_query(
        s, "SELECT conv_id, turn_idx FROM transcripts "
           "WHERE role = 'user' ORDER BY ts DESC LIMIT 10")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "CartesianProduct" not in plan


# -- facet.range DATE path (DateMath gaps) -------------------------------------


def test_date_range_facet_brute_and_month_clamp(spark, sf_dir):
    """Date buckets equal a brute per-doc assignment against the
    driver-computed bounds, and a +1MONTH gap walks variable-width
    bounds with month-end clamping (the DateMathParser contract)."""
    import datetime

    from lucene_solr_spark.handler import _date_range_buckets, select
    from lucene_solr_spark.query.datemath import parse as dm

    s = cached_searcher(spark, sf_dir)
    out = select(s, {
        "q": "data", "rows": 0, "facet.range": "ts",
        "facet.range.start": "2024-01-01T00:00:00Z",
        "facet.range.end": "2024-01-02T00:00:00Z",
        "facet.range.gap": "+3HOURS",
    })
    got = {r.bucket_start: r.cnt
           for r in out["facet_ranges"]["ts"].collect()}
    t = transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text"))
    dom = t.filter(F.array_contains("toks", "data")).select("ts").collect()
    start = datetime.datetime(2024, 1, 1)
    end = datetime.datetime(2024, 1, 2)
    want: dict = {}
    for r in dom:
        ts = r.ts
        if not (start <= ts < end):
            continue
        b = start + datetime.timedelta(
            hours=3 * ((ts - start) // datetime.timedelta(hours=3)))
        want[b.strftime("%Y-%m-%d %H:%M:%S")] = want.get(
            b.strftime("%Y-%m-%d %H:%M:%S"), 0) + 1
    assert got == want and got
    # month-gap bound walk clamps: Jan 31 + 1MONTH -> Feb 29 (2024)
    assert dm("NOW+1MONTH", now=datetime.datetime(2024, 1, 31)) == \
        datetime.datetime(2024, 2, 29)
    # variable-width bounds through the bucket builder
    df = _date_range_buckets(
        s, BooleanSpec(must=("data",)), "ts",
        datetime.datetime(2024, 1, 1), datetime.datetime(2024, 3, 1),
        "+1MONTH")
    starts = [r.bucket_start for r in df.collect()]
    assert starts == ["2024-01-01 00:00:00"] or starts == [
        "2024-01-01 00:00:00", "2024-02-01 00:00:00"]


# -- FreeTextSuggester backoff --------------------------------------------------


def test_freetext_suggester_backoff(spark, sf_dir):
    """A sparse prev token (fewer than n bigram continuations) fills
    the tail with 0.4-damped unigram suggestions: bigram rows match a
    brute pair count, backoff rows never duplicate a bigram token, and
    every score matches the pinned formulas at 4dp."""
    from collections import Counter

    from lucene_solr_spark.operators.solr_battery import suggest_freetext
    from lucene_solr_spark.transcripts import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir).withColumn(
        "toks", tokens_col("text"))
    docs = [r.toks for r in t.select("toks").collect()]
    uni = Counter(tok for d in docs for tok in d)
    # pick a prev with 1..5 continuations so the backoff path fires
    pair = Counter((a, b) for d in docs for a, b in zip(d, d[1:]))
    conts: dict = {}
    for (a, b), c in pair.items():
        conts.setdefault(a, Counter())[b] = c
    prev = sorted(a for a, cs in conts.items() if 1 <= len(cs) <= 5)[0]
    got = suggest_freetext(spark, sf_dir, prev, 10).collect()
    bg = {r.token: r.score for r in got if r.model == "bigram"}
    bk = {r.token: r.score for r in got if r.model == "backoff"}
    tot = sum(conts[prev].values())
    assert bg == {w: round(c / tot, 4) for w, c in conts[prev].items()}
    assert len(got) == 10 and not (set(bg) & set(bk))
    utot = sum(uni.values())
    for w, s in bk.items():
        assert s == round(0.4 * uni[w] / utot, 4)
    # ranked on score desc, token asc
    ranks = [(-r.score, r.token) for r in got]
    assert ranks == sorted(ranks)


def test_sql_random_duel_vs_duckdb(spark, sf_dir):
    """Randomized /sql duel: random docvalues-only statements from the
    subset grammar run VERBATIM on both engines — sql_query against
    the index vs DuckDB against the transcripts CTE. Text predicates
    are excluded (they mean token-containment here, not equality), so
    the same string is valid, identically-typed SQL in both dialects."""
    import duckdb
    import numpy as np

    from lucene_solr_spark.sql import sql_query
    from lucene_solr_spark.transcripts import TRANSCRIPTS_ORACLE_CTE

    s = cached_searcher(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )

    roles = ["user", "assistant", "system", "tool"]
    for seed in range(10):
        rng = np.random.default_rng(seed)
        preds = []
        if rng.integers(0, 2):
            preds.append(f"role = '{roles[int(rng.integers(0, 4))]}'")
        if rng.integers(0, 2):
            preds.append(f"turn_idx <= {int(rng.integers(2, 8))}")
        if rng.integers(0, 2):
            r1, r2 = rng.choice(roles, 2, replace=False)
            preds.append(f"(role = '{r1}' OR role = '{r2}')")
        gb = ("role", "tool")[int(rng.integers(0, 2))]
        lim = int(rng.integers(2, 8))
        having = (f" HAVING c > {int(rng.integers(1, 5))}"
                  if rng.integers(0, 2) else "")
        where = (" WHERE " + " AND ".join(preds)) if preds else ""
        stmt = (
            f"SELECT {gb}, COUNT(*) AS c, MAX(turn_idx) AS mt "
            f"FROM transcripts{where} GROUP BY {gb}{having} "
            f"ORDER BY c DESC LIMIT {lim}"
        )
        got = [tuple(r) for r in sql_query(s, stmt).collect()]
        # the engine appends the bucket-value tiebreak; spell it out
        # for DuckDB so the LIMIT boundary is the same total order.
        # Facet-mode semantics: docs without the group field form NO
        # bucket (the engine's pinned never-a-NULL-bucket rule), so
        # the control filters them explicitly.
        preds_d = preds + [f"{gb} IS NOT NULL"]
        duck_stmt = (
            f"WITH {TRANSCRIPTS_ORACLE_CTE} "
            f"SELECT {gb}, COUNT(*) AS c, MAX(turn_idx) AS mt "
            f"FROM transcripts WHERE " + " AND ".join(preds_d)
            + f" GROUP BY {gb}{having} "
            f"ORDER BY c DESC, {gb} LIMIT {lim}"
        )
        want = [
            (r[0], int(r[1]), int(r[2]))
            for r in con.execute(duck_stmt).fetchall()
        ]
        got = [(r[0], int(r[1]), int(r[2])) for r in got]
        assert got == want, (seed, stmt, got, want)
