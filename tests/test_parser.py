"""Query parser tests (TestSolrQueryParser spirit): string syntax →
BooleanSpec IR, analyzer applied at query time, end-to-end parity with
the hand-built spec through the index engine."""

from __future__ import annotations

import pytest

from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.parser import parse


@pytest.mark.parametrize("q,want", [
    ("merge", BooleanSpec(should=("merge",), min_should_match=1)),
    ("merge sort", BooleanSpec(should=("merge", "sort"), min_should_match=1)),
    ("+merge window", BooleanSpec(must=("merge",), should=("window",))),
    ("merge -stream",
     BooleanSpec(should=("merge",), must_not=("stream",), min_should_match=1)),
    ('"table scan"', BooleanSpec(phrases=(("table", "scan"),))),
    ("role:assistant +query",
     BooleanSpec(must=("query",), filters=(("role", "assistant"),))),
    ("merge AND sort", BooleanSpec(must=("merge", "sort"))),
    ("merge OR sort", BooleanSpec(should=("merge", "sort"), min_should_match=1)),
    ("NOT stream +join", BooleanSpec(must=("join",), must_not=("stream",))),
    ('MERGE "Table SCAN"',
     BooleanSpec(should=("merge",), phrases=(("table", "scan"),))),
    # negated phrases: MUST_NOT occur, never a positive requirement
    ('-"table scan" +merge',
     BooleanSpec(must=("merge",), must_not_phrases=(("table", "scan"),))),
    ('NOT "table scan" +merge',
     BooleanSpec(must=("merge",), must_not_phrases=(("table", "scan"),))),
    # negated field filter: differs-or-missing
    ("-role:assistant +query",
     BooleanSpec(must=("query",), not_filters=(("role", "assistant"),))),
    ("NOT tool:tool_7 +data",
     BooleanSpec(must=("data",), not_filters=(("tool", "tool_7"),))),
])
def test_parse_shapes(q, want):
    got = parse(q)
    assert got.must == want.must, q
    assert got.should == want.should, q
    assert got.must_not == want.must_not, q
    assert got.phrases == want.phrases, q
    assert got.filters == want.filters, q
    assert got.must_not_phrases == want.must_not_phrases, q
    assert got.not_filters == want.not_filters, q
    assert got.min_should_match == want.min_should_match, q


def test_boost_syntax():
    got = parse("fast^2.5 slow vector^0.5")
    assert got.should == ("fast", "slow", "vector")
    assert got.boost_map == {"fast": 2.5, "vector": 0.5}


def test_negative_boost_rejected():
    """Lucene rejects boost < 0 (WAND upper bounds become unsound)."""
    with pytest.raises(ValueError, match="negative boost"):
        parse("fast^-2")
    with pytest.raises(ValueError, match="negative boost"):
        BooleanSpec(should=("fast",), boosts=(("fast", -1.0),))


def test_default_op_and():
    got = parse("merge sort", default_op="AND")
    assert got.must == ("merge", "sort")
    assert got.should == ()


def test_parse_end_to_end(spark, sf_dir, tmp_path_factory):
    """Parsed query == hand-built spec through the real engine."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.executor import IndexSearcher
    from lucene_solr_spark.transcripts import transcripts_from_documents

    root = str(tmp_path_factory.mktemp("pidx"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    s = IndexSearcher(spark, root)
    a = s.search(parse("+sort +window", k=10)).toPandas()
    b = s.search(BooleanSpec(must=("sort", "window"), k=10)).toPandas()
    assert a.equals(b)


def test_range_filter_parses():
    spec = parse("data ts:[2024-01-01T02:00:00 TO 2024-01-01T09:30:00]")
    assert spec.range_filters == (
        ("ts", "2024-01-01T02:00:00", "2024-01-01T09:30:00"),
    )
    assert spec.should == ("data",)


def test_range_open_ends_and_fields():
    assert parse("turn_idx:[* TO 3]").range_filters == (("turn_idx", None, "3"),)
    assert parse("role:[assistant TO user]").range_filters == (
        ("role", "assistant", "user"),
    )


@pytest.mark.parametrize(
    "bad",
    [
        "ts:{2024-01-01 TO 2024-01-02}",  # exclusive bounds
        "-ts:[* TO 2024-01-01]",          # negated range
        "NOT ts:[* TO 2024-01-01]",
        "score:[1 TO 2]",                 # non-rangeable field
        "ts:[broken]",                    # no TO
    ],
)
def test_range_rejects_never_inverts(bad):
    with pytest.raises(ValueError):
        parse(bad)


def test_wildcard_and_regexp_parse_to_multiterm_nodes():
    spec = parse("data s?a* /s(can|ort)/")
    assert spec.should == ("data",)
    assert spec.wildcards == ("s?a*",)
    assert spec.regexps == ("s(can|ort)",)
    assert spec.needs_rewrite
    # pure-multiterm query still gets mm=1 (disjunction semantics)
    assert parse("te*t").min_should_match == 1
    # Lucene lowercase_expanded_terms: pattern lowercased at parse
    assert parse("TE*T").wildcards == ("te*t",)


def test_negated_multiterm_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="wildcard"):
        parse("-te*t")
    with _pytest.raises(ValueError, match="regexp"):
        parse("NOT /abc/")


def test_edismax_builds_pf_spec():
    from lucene_solr_spark.query.parser import edismax

    s = edismax("Merge the DATA", mm="50%", pf_boost=2.0, k=15)
    assert s.should == ("merge", "the", "data")
    assert s.min_should_match == 1  # floor(3 * 50%) = 1
    assert s.pf_phrases == (("merge", "the", "data"),)
    assert s.pf_boost == 2.0 and s.k == 15

    s2 = edismax("merge data", mm="100%")
    assert s2.min_should_match == 2

    s3 = edismax("merge", pf=True)  # 1 term: no phrase to boost
    assert s3.pf_phrases == ()

    import pytest as _pytest
    with _pytest.raises(ValueError):
        edismax("!!! ...")  # analyzes to zero terms


def test_pf_spec_validation():
    import pytest as _pytest

    from lucene_solr_spark.query.model import BooleanSpec

    with _pytest.raises(ValueError):
        BooleanSpec(should=("a",), pf_phrases=(("a",),))  # 1-term pf
    with _pytest.raises(ValueError):
        BooleanSpec(
            should=("a", "b"), pf_phrases=(("a", "b"),), pf_boost=-1.0
        )


def test_edismax_shingled_pf():
    from lucene_solr_spark.query.parser import edismax

    s = edismax("a1 b2 c3 d4", pf=True, pf2=True, pf3=True)
    assert ("a1", "b2", "c3", "d4") in s.pf_phrases        # pf
    assert ("a1", "b2") in s.pf_phrases                    # pf2 shingles
    assert ("b2", "c3") in s.pf_phrases and ("c3", "d4") in s.pf_phrases
    assert ("a1", "b2", "c3") in s.pf_phrases              # pf3 shingles
    assert ("b2", "c3", "d4") in s.pf_phrases
    # 2-term query: pf2 would duplicate pf — deduped to one phrase
    s2 = edismax("a1 b2", pf=True, pf2=True)
    assert s2.pf_phrases == (("a1", "b2"),)


def test_mm_conditional_grammar():
    """SolrPluginUtils#calculateMinShouldMatch parity: ints, negatives,
    percentages, and the conditional 'N<val' grammar."""
    from lucene_solr_spark.query.parser import _calc_mm

    assert _calc_mm(2, 5) == 2
    assert _calc_mm("-2", 5) == 3          # all but two
    assert _calc_mm(-2, 5) == 3
    assert _calc_mm("75%", 4) == 3         # floor
    assert _calc_mm("-25%", 4) == 3        # all but floor(25% of 4)
    # conditional: below every threshold -> require all
    assert _calc_mm("3<90%", 2) == 2
    # above the threshold -> apply the val
    assert _calc_mm("3<90%", 10) == 9
    # multiple clauses: LARGEST applicable condition wins
    assert _calc_mm("2<-25% 9<-3", 8) == 6   # 2<-25%: 8 - 2 = 6
    assert _calc_mm("2<-25% 9<-3", 12) == 9  # 9<-3:  12 - 3 = 9
    # edismax clamps into [1, n]
    from lucene_solr_spark.query.parser import edismax

    assert edismax("merge data", mm="200%").min_should_match == 2
    assert edismax("merge data", mm="-5").min_should_match == 1


def test_edismax_ps_sets_pf_slop():
    from lucene_solr_spark.query.parser import edismax

    spec = edismax("merge data table", mm="2", ps=2, pf_boost=1.5)
    assert spec.pf_slop == 2
    assert spec.pf_phrases == (("merge", "data", "table"),)
    assert spec.pf_boost == 1.5
    # default stays exact
    assert edismax("merge data").pf_slop == 0


def test_terms_qparser_parses_in_filter():
    from lucene_solr_spark.query.parser import parse

    spec = parse("{!terms f=role}user, system")
    assert spec.in_filters == (("role", ("user", "system")),)
    assert not spec.must and not spec.should and not spec.filters

    with pytest.raises(ValueError, match="not filterable"):
        parse("{!terms f=text}merge")
    with pytest.raises(ValueError, match="empty terms"):
        parse("{!terms f=role}")


def test_in_filter_three_engine_consistency(spark):
    """in_filters must agree across the DataFrame engine, the
    filter_mask path, and a hand filter — incl. null never matching."""
    import pandas as pd

    from lucene_solr_spark.query.executor import filter_mask
    from lucene_solr_spark.query.model import BooleanSpec

    spec = BooleanSpec(in_filters=(("tool", ("tool_3", "tool_7")),))
    dm = pd.DataFrame({"tool": ["tool_3", None, "tool_7", "tool_9"]})
    assert list(filter_mask(dm, spec)) == [True, False, True, False]


def test_in_filter_multiselect_exclusion():
    from lucene_solr_spark.query.executor import _exclude_filter_fields
    from lucene_solr_spark.query.model import BooleanSpec

    spec = BooleanSpec(
        must=("data",), in_filters=(("role", ("user",)),)
    )
    out = _exclude_filter_fields(spec, ("role",))
    assert out is not None and out.in_filters == ()
    # filter-only spec excluded entirely -> MatchAll domain (None)
    only = BooleanSpec(in_filters=(("role", ("user",)),))
    assert _exclude_filter_fields(only, ("role",)) is None


def test_field_star_parses_as_exists_filter():
    """'tool:*' is FieldValueQuery (field has a value), '-tool:*' is
    the missing idiom — never an equality with the literal '*'."""
    from lucene_solr_spark.query.parser import parse

    spec = parse("data tool:*")
    assert spec.exists_filters == ("tool",)
    assert spec.filters == ()
    neg = parse("data -tool:*")
    assert neg.missing_filters == ("tool",)
    assert neg.not_filters == ()


def test_one_field_qparsers():
    """{!term} / {!prefix} / {!field} local-params plugins: raw-value
    term filter, never-analyzed prefix, analyzed term-or-phrase."""
    import pytest

    from lucene_solr_spark.query.parser import parse

    t = parse("{!term f=tool}tool_3")
    assert t.filters == (("tool", "tool_3"),) and not t.scoring_terms
    # raw value on the text field = one index term, no analysis
    assert parse("{!term f=text}Merge").must == ("Merge",)

    p = parse("{!prefix f=text}mer")
    assert p.wildcards == ("mer*",) and p.needs_rewrite

    f1 = parse("{!field f=text}Merge")
    assert f1.must == ("merge",) and f1.phrases == ()
    f2 = parse("{!field f=text}Table Scan")
    assert f2.phrases == (("table", "scan"),) and f2.must == ()
    assert parse("{!field f=role}assistant").filters == \
        (("role", "assistant"),)

    with pytest.raises(ValueError, match="undefined field"):
        parse("{!term f=nope}x")
    with pytest.raises(ValueError, match="text field"):
        parse("{!prefix f=tool}mer")
    with pytest.raises(ValueError, match="zero terms"):
        parse("{!field f=text}...")
    with pytest.raises(ValueError, match="wants a value"):
        parse("{!term f=tool}")
