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
