"""Pinned analysis chain (SURVEY §2.7, analysis-chain row).

The reference's invariant — the SAME analyzer runs at index time and
query time (``lucene/core/src/java/org/apache/lucene/analysis/Analyzer.java``,
``StandardTokenizer`` + ``LowerCaseFilter``) — is preserved by pinning ONE
tokenizer definition used everywhere:

    lowercase → split on runs of [a-z0-9] (ASCII word chars)

Three equivalent implementations are provided and tested against each
other (dueling, SURVEY §5):

- :data:`tokens_col` — pure Catalyst ``Column`` expression (JVM-side,
  whole-stage-codegen; used by the brute-force DataFrame scorer M1),
- :func:`tokenize_pandas` — vectorized pandas (Arrow UDF path; used by
  the ``mapInPandas`` segment builder),
- the DuckDB oracle spelling ``regexp_extract_all(lower(x),'[a-z0-9]+')``
  (see :data:`DUCKDB_TOKENIZE`).

Stemming / synonyms / ngrams are extension points (pass a different
``token_filter``), not part of the pinned CORE chain — mirroring that
Solr schemas choose their filter chain per field type
(``solr/core/src/java/org/apache/solr/schema/TextField.java``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: The single source of truth for what a token is.
TOKEN_PATTERN = r"[a-z0-9]+"

#: Its complement, for split-based spellings.
NON_TOKEN_PATTERN = r"[^a-z0-9]+"

#: DuckDB oracle spelling of the same tokenizer (string template, col name in {}).
DUCKDB_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z0-9]+')"

_COMPILED = re.compile(TOKEN_PATTERN)


def tokens_col(col: str | Column) -> Column:
    """Catalyst-native tokenizer: ``string -> array<string>``.

    Stays inside whole-stage codegen (split + filter on the JVM); this
    is the hot-path spelling for DataFrame-only queries.
    """
    c = F.col(col) if isinstance(col, str) else col
    # split() on the complement pattern can yield leading/trailing ''.
    return F.filter(F.split(F.lower(c), NON_TOKEN_PATTERN), lambda x: x != "")


def tokenize_pandas(text: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer: Series[str] -> Series[list[str]].

    Used inside mapInPandas segment builds — no per-row Python beyond
    pandas' optimized str machinery (input_hint mandate).
    """
    return text.fillna("").str.lower().str.findall(_COMPILED)


def tokenize_one(text: str) -> list[str]:
    """Scalar tokenizer for driver-side query strings (not a data path)."""
    return _COMPILED.findall((text or "").lower())
