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


# ---------------------------------------------------------------------------
# Token-filter chain (SURVEY §2.7 analysis-chain extension points).
#
# Solr schemas compose <analyzer> chains per field type
# (TextField + TokenFilterFactory SPI); ours compose vectorized
# pandas-level filters over the token Series. An index built with a
# filter chain records its analyzer_version in the manifest, and the
# SAME chain must run at query time (the Analyzer invariant).
# ---------------------------------------------------------------------------

#: Lucene's classic English stop set (StopAnalyzer#ENGLISH_STOP_WORDS_SET)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def stop_filter(toks: pd.Series, stopwords: frozenset[str] = ENGLISH_STOP_WORDS) -> pd.Series:
    """StopFilter: drop stop words (vectorized list comprehension over
    the exploded form would shuffle; per-list filter is C-speed via map)."""
    sw = stopwords
    return toks.map(lambda ts: [t for t in ts if t not in sw])


def edge_ngram_filter(toks: pd.Series, min_gram: int = 2, max_gram: int = 5) -> pd.Series:
    """EdgeNGramTokenFilter: emit leading n-grams per token (the
    search-as-you-type index shape)."""
    lo, hi = min_gram, max_gram
    return toks.map(
        lambda ts: [t[:n] for t in ts for n in range(lo, min(len(t), hi) + 1)]
    )


def shingle_filter(toks: pd.Series, size: int = 2, sep: str = " ") -> pd.Series:
    """ShingleFilter: emit word n-grams of `size` (phrase pre-join)."""
    k = size
    return toks.map(
        lambda ts: [sep.join(ts[i : i + k]) for i in range(len(ts) - k + 1)]
    )


_S_SUFFIXES = ("sses", "ies", "ss")


def s_stem_filter(toks: pd.Series) -> pd.Series:
    """Minimal English s-stemmer (EnglishMinimalStemFilter semantics:
    plural 's' removal, not full Porter — the documented light option)."""

    def stem(t: str) -> str:
        if t.endswith("sses"):
            return t[:-2]
        if t.endswith("ies") and len(t) > 4:
            return t[:-3] + "y"
        if t.endswith("s") and not t.endswith(("ss", "us", "is")) and len(t) > 3:
            return t[:-1]
        return t

    return toks.map(lambda ts: [stem(t) for t in ts])


def synonym_filter(mapping: dict[str, object], expand: bool = False):
    """SynonymGraphFilter analog, single-token rules (VERDICT r2 item
    3 — the most common analyzer customization in real Solr).

    Two Solr modes:

    - ``expand=False`` (contraction, ``foo => bar``): each token maps
      to its canonical form — ``mapping[tok] -> str``. doc_len is
      unchanged; distinct surface forms merge into one posting.
    - ``expand=True`` (``foo, bar`` with expand=true): each token
      emits itself plus its synonyms — ``mapping[tok] -> list[str]``
      appended in rule order. doc_len grows, exactly like Lucene's
      index-time expansion (stacked tokens share a position in real
      Lucene; our flat token stream appends instead, a documented
      simplification that keeps BM25 length normalization honest).

    Multi-word (graph) rules are out of scope — they need the full
    token-graph machinery; single-token rules cover the dominant use.

    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         synonym/SynonymGraphFilter.java, SolrSynonymParser.java
    """
    m = dict(mapping)
    if expand:
        def run(toks: pd.Series) -> pd.Series:
            return toks.map(
                lambda ts: [x for t in ts for x in (t, *m.get(t, ()))]
            )
    else:
        def run(toks: pd.Series) -> pd.Series:
            return toks.map(lambda ts: [m.get(t, t) for t in ts])

    run.__name__ = "synonym_filter"
    return run


def chain(*filters):
    """Compose token filters into one analyzer stage: tokenize →
    filter_1 → ... → filter_n (Analyzer/TokenStream pipeline)."""

    def run(text: pd.Series) -> pd.Series:
        toks = tokenize_pandas(text)
        for f in filters:
            toks = f(toks)
        return toks

    return run


def analyze_stages(text: str, *filters) -> list[tuple[str, list[str]]]:
    """/analysis/field debug surface: the token stream AFTER each stage
    of the chain — (stage_name, tokens) per stage, starting with the
    tokenizer. Driver-side by design (it's a one-string admin/debug
    call, like Solr's FieldAnalysisRequestHandler).

    ref: solr/core/src/java/org/apache/solr/handler/
         FieldAnalysisRequestHandler.java (per-stage token listing)"""
    import pandas as pd

    toks = tokenize_pandas(pd.Series([text]))
    out = [("tokenizer", list(toks.iloc[0]))]
    for f in filters:
        toks = f(toks)
        name = getattr(f, "__name__", None) or type(f).__name__
        if name == "<lambda>":
            name = f"stage_{len(out)}"
        out.append((name, list(toks.iloc[0])))
    return out
