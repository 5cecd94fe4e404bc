"""S4 (XML update format) and S5 (javabin) source/sink codecs.

Javabin gate = golden byte vectors (pins the wire layout so a matching
read/write bug pair cannot hide) + randomized nested round-trips +
distributed round-trip. XML gate = escaping, null-field omission, and
distributed round-trip against the original table.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.sources import javabin
from lucene_solr_spark.sources.javabin import (
    NamedList,
    SolrDocument,
    SolrDocumentList,
    decode_rows,
    dumps,
    encode_rows,
    loads,
)
from lucene_solr_spark.sources.xml_source import decoded, encode_xml
from lucene_solr_spark.transcripts import transcripts_from_documents

_SPARK: list = []


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    if not _SPARK:
        _SPARK.append(spark)
    yield

# ---------------------------------------------------------------------------
# javabin — golden vectors (format version 2 wire layout)
# ---------------------------------------------------------------------------

GOLDEN = [
    (None, b"\x02\x00"),
    (True, b"\x02\x01"),
    (False, b"\x02\x02"),
    (5, bytes([2, javabin.SINT | 5])),
    # 20 = 0b10100: low 4 bits in tag + 0x10 continuation, vint(1)
    (20, bytes([2, javabin.SINT | 0x10 | 0x04, 0x01])),
    (-3, b"\x02\x06\xff\xff\xff\xfd"),
    (1.5, b"\x02\x05?\xf8\x00\x00\x00\x00\x00\x00"),
    ("ab", bytes([2, javabin.STR | 2]) + b"ab"),
    ([1], bytes([2, javabin.ARR | 1, javabin.SINT | 1])),
    (
        {"a": 1},
        bytes(
            [2, javabin.ORDERED_MAP | 1, javabin.EXTERN_STRING | 0,
             javabin.STR | 1]
        )
        + b"a"
        + bytes([javabin.SINT | 1]),
    ),
    (b"\x00\xff", bytes([2, javabin.BYTEARR, 2, 0x00, 0xFF])),
]


@pytest.mark.parametrize("obj,wire", GOLDEN, ids=[repr(o)[:20] for o, _ in GOLDEN])
def test_javabin_golden_vectors(obj, wire):
    assert dumps(obj) == wire
    assert loads(wire) == obj


def test_javabin_extern_string_backref():
    # second occurrence of the key must be a 1-byte back-reference
    wire = dumps([{"k": 1}, {"k": 2}])
    assert wire.count(b"k") == 1
    assert bytes([javabin.EXTERN_STRING | 1]) in wire
    assert loads(wire) == [{"k": 1}, {"k": 2}]


def test_javabin_long_string_size_escape():
    s = "x" * 100  # size 100 > 0x1f → tag escape + vint(100 - 31)
    wire = dumps(s)
    assert wire[1] == javabin.STR | 0x1F and wire[2] == 100 - 0x1F
    assert loads(wire) == s


def test_javabin_solrdoclist_roundtrip():
    docs = [SolrDocument(id="a", score=1.5), SolrDocument(id="b", n=3)]
    lst = SolrDocumentList(docs, num_found=240, start=10, max_score=9.75)
    got = loads(dumps(lst))
    assert isinstance(got, SolrDocumentList)
    assert (got.num_found, got.start, got.max_score) == (240, 10, 9.75)
    assert list(got) == [dict(d) for d in docs]


def test_javabin_named_list_allows_repeats():
    nl = NamedList([("facet", 1), ("facet", 2), (None if False else "q", "x")])
    got = loads(dumps(nl))
    assert isinstance(got, NamedList) and list(got) == list(nl)


def test_javabin_date_millis():
    d = datetime.datetime(2024, 3, 1, 12, 30, 45, 123000)
    assert loads(dumps(d)) == d  # whole millis survive exactly


_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_values = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=6),
        st.dictionaries(st.text(max_size=10), inner, max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=150, deadline=None)
@given(_values)
def test_javabin_roundtrip_random(v):
    assert loads(dumps(v)) == v


# ---------------------------------------------------------------------------
# distributed round-trips over the real table
# ---------------------------------------------------------------------------


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_xml_distributed_roundtrip(spark, sf_dir):
    t = transcripts_from_documents(spark, sf_dir)
    back = decoded(encode_xml(t), t.schema)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in t.schema.fields
    ]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert _sorted_rows(back, cols) == _sorted_rows(t, cols)


def test_xml_escapes_markup(spark):
    df = spark.createDataFrame(
        [("a<b&c>d\"'", None)], "text string, tool string"
    )
    back = decoded(encode_xml(df), df.schema).collect()[0]
    assert back.text == "a<b&c>d\"'"
    assert back.tool is None  # omitted element → null


def test_xml_quotes_in_field_names(spark):
    """ADVICE r2: a '"' inside a FIELD NAME sits in attribute position
    and must be quoted with quoteattr, else the payload is malformed."""
    df = spark.createDataFrame([("v1", "v2")], ['a"b', "c<d&e"])
    back = decoded(encode_xml(df), df.schema).collect()[0]
    assert back['a"b'] == "v1"
    assert back["c<d&e"] == "v2"


def test_javabin_distributed_roundtrip(spark, sf_dir):
    t = transcripts_from_documents(spark, sf_dir)
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    sub = t.select(*cols)
    back = decode_rows(encode_rows(sub), sub.schema)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in sub.schema.fields
    ]
    assert _sorted_rows(back, cols) == _sorted_rows(sub, cols)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_xml_roundtrip_random_text(texts):
    """Any XML-legal text survives encode→parse byte-identically
    (control chars are not XML-representable — excluded, as Solr's
    XMLLoader would reject them too)."""
    spark = _SPARK[0]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    back = decoded(encode_xml(df), df.schema)
    assert sorted(r.text or "" for r in back.collect()) == sorted(texts)
