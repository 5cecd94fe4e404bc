"""Dueling tokenizers (SURVEY §5): the pinned analyzer's three
implementations must agree on every input — Lucene's same-analyzer-at-
index-and-query-time invariant depends on it."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import tokenize_one, tokenize_pandas, tokens_col

CASES = [
    "the fast key order sort table scan",
    "Hello, World!  MIXED case 42x7",
    "",
    "   ",
    "---punct...only!!!",
    "unicode 中文 mixed merge tokens",
    "a",
    "trailing space ",
    " leading",
    "tab\tand\nnewline split",
]


@pytest.mark.parametrize("text", CASES)
def test_pandas_vs_scalar(text):
    assert tokenize_pandas(pd.Series([text])).iloc[0] == tokenize_one(text)


def test_catalyst_vs_pandas(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, text string")
    got = {r.id: r.toks for r in df.select("id", tokens_col("text").alias("toks")).collect()}
    want = tokenize_pandas(pd.Series(CASES))
    for i, _ in enumerate(CASES):
        assert got[i] == want.iloc[i], CASES[i]


def test_null_handling(spark):
    df = spark.createDataFrame([(1, None)], "id int, text string")
    row = df.select(tokens_col("text").alias("t")).collect()[0]
    assert row.t is None  # Catalyst null-propagates; pandas path fillna('')
    assert tokenize_pandas(pd.Series([None])).iloc[0] == []


# --- token-filter chain (analysis extension points, SURVEY §2.7) ---

from lucene_solr_spark.analyzer import (  # noqa: E402
    chain,
    edge_ngram_filter,
    s_stem_filter,
    shingle_filter,
    stop_filter,
)


def test_filter_chain_composition():
    texts = pd.Series(["The Tables and Queries", None, "a"])
    out = chain(stop_filter, s_stem_filter)(texts)
    assert out.tolist() == [["table", "query"], [], []]  # 'a' is a stop word


def test_edge_ngram():
    out = edge_ngram_filter(pd.Series([["merge"]]), 2, 4).tolist()
    assert out == [["me", "mer", "merg"]]  # maxGram=4 < len(token)


def test_shingles():
    out = shingle_filter(pd.Series([["a", "b", "c"]]), 2).tolist()
    assert out == [["a b", "b c"]]


def test_analyze_stages_lists_each_stage():
    from lucene_solr_spark.analyzer import (
        analyze_stages,
        s_stem_filter,
        stop_filter,
    )

    stages = analyze_stages("The Merges and the Tables!", stop_filter, s_stem_filter)
    assert [name for name, _ in stages] == [
        "tokenizer", "stop_filter", "s_stem_filter"
    ]
    assert stages[0][1] == ["the", "merges", "and", "the", "tables"]
    assert stages[1][1] == ["merges", "tables"]  # stops removed
    assert stages[2][1] == ["merge", "table"]  # s-stemmed


# --- Porter stemmer + ASCII folding (r4: VERDICT item 3) ------------

from lucene_solr_spark.analyzer import (  # noqa: E402
    ascii_fold,
    porter_filter,
    porter_stem,
)

#: Classic Porter vectors (the 1980 paper's step examples traced
#: through the FULL algorithm, plus repo-vocabulary words).
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "meetings": "meet",
    "electricity": "electr", "electrical": "electr",
    "generalization": "gener", "oscillators": "oscil",
    "controlling": "control", "roll": "roll",
    "adoption": "adopt", "adjustment": "adjust",
    "dependent": "depend", "formalize": "formal",
    # repo vocabulary (drives the oracle CASE map)
    "customer": "custom", "merge": "merg", "query": "queri",
    "table": "tabl", "value": "valu", "key": "kei",
    "filter": "filter", "order": "order", "vector": "vector",
    "window": "window", "line": "line",
}


@pytest.mark.parametrize("word,want", sorted(PORTER_VECTORS.items()))
def test_porter_vectors(word, want):
    assert porter_stem(word) == want


def test_porter_filter_vectorized():
    toks = pd.Series([["merges", "running", "tables"], []])
    out = porter_filter(toks)
    assert out.iloc[0] == ["merg", "run", "tabl"]
    assert out.iloc[1] == []


def test_porter_vocab_covers_testdata():
    """The oracle's CASE map is generated from PORTER_VOCAB; every
    token actually present in any sf dir must be in that list (else
    the oracle's ELSE-identity branch could silently diverge)."""
    import os

    import duckdb

    from lucene_solr_spark.registry import PORTER_VOCAB

    vocab = set(PORTER_VOCAB)
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        toks = {
            r[0]
            for r in con.execute(
                "SELECT DISTINCT unnest(regexp_extract_all(lower(text), "
                f"'[a-z0-9]+')) FROM parquet_scan('{path}')"
            ).fetchall()
        }
        assert toks <= vocab, sorted(toks - vocab)


FRENCH_MINIMAL_VECTORS = {
    # canonical -aux plural normalization (FrenchMinimalStemmer)
    "chevaux": "cheval", "aux": "aux",
    # sequential s/r/e strips + doubled-letter removal
    "customers": "custom", "customer": "custom", "querelle": "querel",
    "tables": "tabl", "table": "table",  # len<6 guard
    # the r-check precedes the e-check: stripping 'e' exposes an 'r'
    # that is NOT re-examined (single left-to-right pass)
    "filtre": "filtr", "filtres": "filtr",
    "the": "the", "merge": "merge",
    # x without 'au' context just drops
    "chevaix": "chevai",
}


@pytest.mark.parametrize("word,want", sorted(FRENCH_MINIMAL_VECTORS.items()))
def test_french_minimal_vectors(word, want):
    from lucene_solr_spark.analyzer import french_minimal_stem

    assert french_minimal_stem(word) == want


GERMAN_LIGHT_VECTORS = {
    # umlaut fold + step1 'e[mnrs]' / 'ern' / trailing-e rules
    "häuser": "haus", "kindern": "kind", "filter": "filt",
    "tage": "tag", "buches": "buch",
    # 's' only strips after an stEnding consonant ('r' is not one)
    "customers": "customers", "rings": "ring",
    # step2 'est' / 'st' after stEnding
    "kleinest": "klein",
    "the": "the",
}


@pytest.mark.parametrize("word,want", sorted(GERMAN_LIGHT_VECTORS.items()))
def test_german_light_vectors(word, want):
    from lucene_solr_spark.analyzer import german_light_stem

    assert german_light_stem(word) == want


def test_language_chain_filters_vectorized():
    """Both non-English filters run per-batch memoized like Porter,
    and the French elision stop set drops surviving article tokens
    (the post-apostrophe-split ElisionFilter analog)."""
    from lucene_solr_spark.analyzer import (
        FRENCH_ELISION,
        french_minimal_filter,
        german_light_filter,
        stop_filter,
    )

    toks = pd.Series([["l", "avions", "chevaux"], []])
    kept = stop_filter(toks, FRENCH_ELISION)
    assert kept.iloc[0] == ["avions", "chevaux"]
    assert french_minimal_filter(kept).iloc[0] == ["avion", "cheval"]
    assert german_light_filter(pd.Series([["häuser", "tage"]])).iloc[0] == [
        "haus", "tag",
    ]


def test_language_stem_fuzz_total_and_shrinking():
    """French minimal + German light stems are total over the token
    alphabet and never lengthen (the Porter fuzz contract extended to
    the new chains — both feed vocab-generated oracle CASE maps)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_spark.analyzer import french_minimal_stem, german_light_stem

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                   min_size=0, max_size=18))
    def run(w):
        for stem in (french_minimal_stem, german_light_stem):
            s = stem(w)
            assert isinstance(s, str) and len(s) <= len(w)

    run()


def test_ascii_fold_matches_duckdb():
    """ascii_fold (NFKD + strip combining) must agree with the oracle
    spelling strip_accents() on Latin input — the dueling-spellings
    invariant extended to the char-filter stage."""
    import duckdb

    cases = [
        "café naïve señor Über fiancée",
        "déjà vu — à côté",
        "plain ascii stays",
        "ångström øre",  # ø is NOT a combining-mark accent: both keep or both fold
    ]
    con = duckdb.connect()
    for s in cases:
        duck = con.execute("SELECT strip_accents(?)", [s]).fetchone()[0]
        ours = ascii_fold(pd.Series([s])).iloc[0]
        assert ours == duck, (s, ours, duck)


def test_chain_char_filter_order():
    """char filters run BEFORE the tokenizer: accented letters fold
    into their token instead of splitting it."""
    got = chain(char_filters=(ascii_fold,))(pd.Series(["café x"])).iloc[0]
    assert got == ["cafe", "x"]
    # without the fold the accent splits the token
    assert chain()(pd.Series(["café x"])).iloc[0] == ["caf", "x"]


def test_porter_fuzz_total_and_shrinking():
    """Porter must be total over lowercase alphanumeric tokens (never
    raises, returns a str) and never lengthens its input — fuzzed via
    hypothesis over the token alphabet."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                   min_size=0, max_size=18))
    def run(w):
        out = porter_stem(w)
        assert isinstance(out, str)
        assert len(out) <= len(w)
        if len(w) <= 2:
            assert out == w  # short-token guard

    run()


# --- Soundex (PhoneticFilter analog, r4) ------------------------------

@pytest.mark.parametrize("word,want", [
    # commons-codec US_ENGLISH reference vectors (lowercased)
    ("robert", "r163"), ("rupert", "r163"),
    ("ashcraft", "a261"), ("ashcroft", "a261"),  # HW rule
    ("tymczak", "t522"),   # vowel resets the dedupe window
    ("pfister", "p236"),   # first-letter code dedupes the 'f'
    ("honeyman", "h555"),
    ("merge", "m620"), ("marge", "m620"), ("march", "m620"),
    ("a", "a000"),
    ("tool7", "tool7"), ("42", "42"),  # non-alpha pass through
    ("", ""),
])
def test_soundex_vectors(word, want):
    from lucene_solr_spark.analyzer import soundex_code

    assert soundex_code(word) == want


def test_soundex_filter_vectorized():
    import pandas as pd

    from lucene_solr_spark.analyzer import soundex_filter

    out = soundex_filter(pd.Series([["merge", "tool7"], [], ["robert"]]))
    assert list(out) == [["m620", "tool7"], [], ["r163"]]


def test_soundex_oracle_case_map_is_total_over_vocab():
    """Every vocab word must round-trip through the generated CASE map
    (same guard philosophy as the Porter oracle: corpus tokens outside
    PORTER_VOCAB would make the oracle silently wrong — covered by
    test_porter_vocab_covers_testdata)."""
    from lucene_solr_spark.analyzer import soundex_code
    from lucene_solr_spark.registry import PORTER_VOCAB

    for w in PORTER_VOCAB:
        code = soundex_code(w)
        assert code != w and len(code) == 4, (w, code)


# --- CommonGrams (CommonGramsFilter analog, r4) ------------------------

def test_common_grams_index_side_injects_bigrams():
    import pandas as pd

    from lucene_solr_spark.analyzer import common_grams_filter

    out = common_grams_filter(pd.Series([
        ["the", "merge", "scan"],       # common left
        ["merge", "the", "scan"],       # common middle: both pairs
        ["fast", "scan"],               # no common word: unigrams only
        ["the"],                        # lone common word
        [],
    ]))
    assert list(out) == [
        ["the", "the_merge", "merge", "scan"],
        ["merge", "merge_the", "the", "the_scan", "scan"],
        ["fast", "scan"],
        ["the"],
        [],
    ]


def test_common_grams_query_side_contracts_pairs():
    import pandas as pd

    from lucene_solr_spark.analyzer import common_grams_query_filter

    out = common_grams_query_filter(pd.Series([
        ["the", "merge", "scan"],   # -> bigram + untouched tail
        ["merge", "the", "scan"],   # overlapping bigrams, both emitted
        ["fast", "scan"],           # untouched
        ["the"],                    # lone common word passes through
    ]))
    assert list(out) == [
        ["the_merge", "scan"],
        ["merge_the", "the_scan"],
        ["fast", "scan"],
        ["the"],
    ]


def test_common_grams_query_vocab_is_index_subset():
    """Every token the query filter can emit is in the index filter's
    output vocabulary for the same text (the searchability contract)."""
    import pandas as pd

    from hypothesis import given
    from hypothesis import strategies as st

    from lucene_solr_spark.analyzer import (
        common_grams_filter,
        common_grams_query_filter,
    )

    words = st.sampled_from(["the", "a", "merge", "scan", "fast", "of"])

    @given(st.lists(words, max_size=6))
    def prop(ts):
        idx = set(common_grams_filter(pd.Series([ts]))[0])
        q = set(common_grams_query_filter(pd.Series([ts]))[0])
        assert q <= idx, (ts, q, idx)

    prop()


def test_common_grams_bigram_iff_adjacent():
    """Semantic pin: for a pair (w1, w2) with either member common,
    the bigram token is in a doc's INDEX stream iff the doc contains
    w1 immediately followed by w2 — i.e. the query filter's single
    term lookup decides exactly the exact-adjacency phrase."""
    import pandas as pd

    from hypothesis import given
    from hypothesis import strategies as st

    from lucene_solr_spark.analyzer import common_grams_filter

    words = st.sampled_from(["the", "a", "merge", "scan", "of"])

    @given(st.lists(words, min_size=0, max_size=8), words, words)
    def prop(doc, w1, w2):
        from lucene_solr_spark.analyzer import ENGLISH_STOP_WORDS

        if w1 not in ENGLISH_STOP_WORDS and w2 not in ENGLISH_STOP_WORDS:
            return  # no bigram is formed for an all-content pair
        idx = common_grams_filter(pd.Series([doc]))[0]
        adjacent = any(
            doc[i] == w1 and doc[i + 1] == w2
            for i in range(len(doc) - 1)
        )
        assert ((w1 + "_" + w2) in idx) == adjacent, (doc, w1, w2, idx)

    prop()


# --- Metaphone (commons-codec analog, r4) ------------------------------

@pytest.mark.parametrize("word,want", [
    # pinned commons-codec branch choices, hand-derived from the rule
    # cascade (lowercased): initial CH + vowel -> K, other CH -> X,
    # SCH -> K, silent KN/GH, WR drops W, TH -> '0' (theta)
    ("character", "krkt"), ("teach", "tx"), ("school", "skl"),
    ("schedule", "sktl"), ("knight", "nt"), ("wright", "rt"),
    ("xavier", "sfr"), ("thompson", "0mps"),
    ("merge", "mrj"), ("mirge", "mrj"),  # front-vowel-softened G
    ("marge", "mrj"), ("lodge", "lj"),   # DGE -> J
    ("why", ""), ("ae", "e"), ("a", "a"),
    ("tool7", "tool7"), ("42", "42"), ("", ""),  # pass-through
])
def test_metaphone_vectors(word, want):
    from lucene_solr_spark.analyzer import metaphone_code

    assert metaphone_code(word) == want


def test_metaphone_filter_vectorized():
    import pandas as pd

    from lucene_solr_spark.analyzer import metaphone_filter

    out = metaphone_filter(pd.Series([["merge", "tool7"], [], ["teach"]]))
    assert list(out) == [["mrj", "tool7"], [], ["tx"]]


def test_metaphone_fuzz_total_and_bounded():
    """Property: metaphone_code is total over lowercase-alpha tokens —
    <= 4 chars, all from the code alphabet (consonant codes + the
    theta '0' + a single leading vowel). NOTE deliberately weaker
    than the Soundex doubling property: Metaphone context windows see
    THROUGH doubled letters ('loddge' is not 'lodge'), matching the
    commons-codec scan order."""
    from hypothesis import given
    from hypothesis import strategies as st

    from lucene_solr_spark.analyzer import metaphone_code

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                   max_size=12))
    def prop(w):
        c = metaphone_code(w)
        if len(w) == 1:
            assert c == w  # commons-codec length-1 early return
            return
        assert len(c) <= 4 and set(c) <= set("abcdefhijklmnoprstuwxy0")
        # vowels survive only in position 0
        assert all(ch not in "aeiou" for ch in c[1:])

    prop()


# --- WordDelimiterFilter analog (r4) ----------------------------------

def test_word_delimiter_splits_runs():
    import pandas as pd

    from lucene_solr_spark.analyzer import word_delimiter_filter

    out = word_delimiter_filter(
        pd.Series([["tool7", "merge", "a1b2"], ["42"], []])
    )
    assert list(out) == [["tool", "7", "merge", "a", "1", "b", "2"],
                         ["42"], []]


def test_word_delimiter_matches_duckdb_flatten():
    """The DuckDB spelling (flatten(list_transform(..., regexp runs)))
    must agree with the pandas filter on arbitrary alnum tokens."""
    import duckdb
    import pandas as pd

    from lucene_solr_spark.analyzer import word_delimiter_filter

    toks = ["tool7", "a1b2c3", "merge", "0x2f" "99bottles", "q"]
    got = list(word_delimiter_filter(pd.Series([toks])))[0]
    want = duckdb.sql(
        "SELECT flatten(list_transform($1::VARCHAR[], "
        "t -> regexp_extract_all(t, '[a-z]+|[0-9]+')))",
        params=[toks],
    ).fetchone()[0]
    assert got == want


# --- HTML strip char filter + multi-word synonyms (r4) ----------------

def test_html_strip_removes_tags_and_entities():
    import pandas as pd

    from lucene_solr_spark.analyzer import chain, html_strip

    run = chain(char_filters=(html_strip,))
    out = list(run(pd.Series(
        ['<p class="doc">merge sort</p> &amp; <br/> table&#39;s scan',
         None, "plain"]
    )))
    assert out[0] == ["merge", "sort", "table", "s", "scan"]
    assert out[1] == [] and out[2] == ["plain"]


def test_multiword_synonym_contraction_cases():
    import pandas as pd

    from lucene_solr_spark.analyzer import multiword_synonym_filter

    f = multiword_synonym_filter({("table", "scan"): "tablescan"})
    cases = {
        ("table", "scan"): ["tablescan"],
        ("table", "table", "scan"): ["table", "tablescan"],
        ("table", "scan", "scan"): ["tablescan", "scan"],
        ("table", "scan", "table", "scan"): ["tablescan", "tablescan"],
        ("scan", "table"): ["scan", "table"],   # order matters
        (): [],
    }
    got = list(f(pd.Series([list(k) for k in cases])))
    assert got == list(cases.values())


def test_multiword_synonym_longest_rule_wins():
    import pandas as pd

    from lucene_solr_spark.analyzer import multiword_synonym_filter

    f = multiword_synonym_filter({
        ("a", "b"): "ab", ("a", "b", "c"): "abc",
    })
    assert list(f(pd.Series([["a", "b", "c"], ["a", "b", "d"]]))) == [
        ["abc"], ["ab", "d"]
    ]


def test_soundex_fuzz_total_and_shape():
    """Property: soundex_code is total over arbitrary lowercase-alpha
    tokens — always letter + 3 digits, first char preserved, and
    doubling a letter never changes the code (adjacent-dedupe)."""
    from hypothesis import given
    from hypothesis import strategies as st

    from lucene_solr_spark.analyzer import soundex_code

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                   max_size=12))
    def prop(w):
        c = soundex_code(w)
        assert len(c) == 4 and c[0] == w[0] and c[1:].isdigit()
        # doubling any single letter is code-invariant
        for i in range(len(w)):
            assert soundex_code(w[:i] + w[i] + w[i:]) == c

    prop()


def test_word_delimiter_fuzz_concat_invariant():
    """Property: concatenating the split runs reproduces the token,
    and every run is homogeneous (all-alpha or all-digit)."""
    from hypothesis import given
    from hypothesis import strategies as st

    import pandas as pd

    from lucene_solr_spark.analyzer import word_delimiter_filter

    @given(st.lists(st.text(alphabet="abc012", min_size=1, max_size=8),
                    max_size=5))
    def prop(toks):
        [parts] = list(word_delimiter_filter(pd.Series([toks])))
        assert "".join(parts) == "".join(toks)
        assert all(p.isalpha() or p.isdigit() for p in parts)

    prop()


# --- round-4 session: reverse_filter + keyword_marker ----------------------

def test_reverse_filter_is_involution_and_matches_plain_chain():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_spark.analyzer import chain, reverse_filter

    rev_chain = chain(reverse_filter)
    plain = chain()

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def run(text):
        s = pd.Series([text])
        revd = rev_chain(s).iloc[0]
        toks = plain(s).iloc[0]
        # reversed chain == token-wise reversal of the plain chain
        assert revd == [t[::-1] for t in toks]
        # involution: reversing the reversed stream restores the plain
        assert reverse_filter(pd.Series([revd])).iloc[0] == toks

    run()


def test_keyword_marker_protects_exactly_the_listed_words():
    from lucene_solr_spark.analyzer import keyword_marker, porter_stem

    km = keyword_marker({"merge", "value"})
    toks = pd.Series([["merge", "merging", "value", "tables", "data"]])
    out = km(toks).iloc[0]
    assert out[0] == "merge"          # protected: surface form kept
    assert out[2] == "value"          # protected
    assert out[1] == porter_stem("merging")  # unprotected: stems
    assert out[3] == porter_stem("tables")
    assert out[4] == porter_stem("data")
    # a protected word whose stem WOULD differ is the discriminator
    assert porter_stem("merge") != "merge"


def test_mapping_char_filter_order_and_validation():
    import pandas as pd
    from lucene_solr_spark import analyzer as an

    # longest source wins: ':-(' must rewrite before ':)' could eat
    # its first two chars... (':)' is not a prefix of ':-(' but the
    # order contract is pinned regardless)
    f = an.mapping_char_filter({":)": " happy ", ":-(": " sad "})
    out = f(pd.Series(["a :) b :-( c", None]))
    assert out.tolist() == ["a  happy  b  sad  c", ""]
    # a target containing a source would make sequential replace
    # rescan output where Lucene's automaton does not — rejected
    with pytest.raises(ValueError, match="contains source"):
        an.mapping_char_filter({"a": "bab", "b": "x"})


def test_pattern_replace_char_filter_no_rescan():
    import pandas as pd
    from lucene_solr_spark import analyzer as an

    f = an.pattern_replace_char_filter(r"([0-9]+)-([0-9]+)", r"\1\2")
    # leftmost non-overlapping, output never rescanned: 3-4-5 → 34-5
    assert f(pd.Series(["3-4-5"])).tolist() == ["34-5"]
    # chain end-to-end: char filters run BEFORE tokenization
    ch = an.chain(char_filters=(
        an.mapping_char_filter({":)": " happy "}), f))
    assert ch(pd.Series(["ok :) 12-34"])).tolist() == [
        ["ok", "happy", "1234"]]


def test_commongrams_index_bigram_equals_plain_phrase(spark, sf_dir):
    """END-TO-END equivalence: on the CommonGrams index, the ONE-term
    bigram query the query filter emits for a common-word phrase must
    match exactly the docs the PLAIN index matches for the exact
    phrase — the phrase-speed trade changes the plan, never the match
    set. (Scores differ by design — the chained stream has its own
    stats — so the duel compares match SETS.)"""
    from lucene_solr_spark.query.model import BooleanSpec
    from lucene_solr_spark.registry import (
        cached_commongrams_searcher,
        cached_searcher,
    )

    cg = cached_commongrams_searcher(spark, sf_dir)
    plain = cached_searcher(spark, sf_dir)
    for w1, w2 in [("the", "merge"), ("a", "scan"), ("the", "table")]:
        got = {
            (r.conv_id, r.turn_idx)
            for r in cg.docset(
                BooleanSpec(must=(f"{w1}_{w2}",))).collect()
        }
        want = {
            (r.conv_id, r.turn_idx)
            for r in plain.docset(
                BooleanSpec(must=(w1, w2), phrases=((w1, w2),))
            ).collect()
        }
        assert got == want, (w1, w2, len(got), len(want))
        assert got, (w1, w2)  # non-vacuous: the phrase occurs


def test_metaphone_index_matches_brute_sound_class(spark, sf_dir):
    """END-TO-END: searching a Metaphone code on the chained index
    matches exactly the docs containing ANY surface token of that
    sound class (brute pandas recomputation)."""
    import pandas as pd

    from lucene_solr_spark.analyzer import metaphone_code, tokenize_pandas
    from lucene_solr_spark.query.model import BooleanSpec
    from lucene_solr_spark.registry import cached_metaphone_searcher
    from lucene_solr_spark.transcripts import transcripts_from_documents

    s = cached_metaphone_searcher(spark, sf_dir)
    code = metaphone_code("merge")  # mrj
    got = {
        (r.conv_id, r.turn_idx)
        for r in s.docset(BooleanSpec(must=(code,))).collect()
    }
    rows = transcripts_from_documents(spark, sf_dir).select(
        "conv_id", "turn_idx", "text").collect()
    toks = tokenize_pandas(pd.Series([r.text for r in rows]))
    want = {
        (rows[i].conv_id, rows[i].turn_idx)
        for i, ts in enumerate(toks)
        if any(metaphone_code(t) == code for t in ts)
    }
    assert got == want and got
