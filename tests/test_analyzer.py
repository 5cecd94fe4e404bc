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
