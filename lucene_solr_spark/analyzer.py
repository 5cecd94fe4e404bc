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


def common_grams_filter(
    toks: pd.Series, common: frozenset[str] = ENGLISH_STOP_WORDS
) -> pd.Series:
    """CommonGramsFilter (index side): keep every unigram and ALSO
    inject a ``left_right`` bigram for each adjacent pair where either
    member is a common word — the phrase-speed trade: common-word
    phrases become single posting lists. Our list model appends the
    bigram right after its left member (Lucene overlays it with
    posInc=0; self-consistent here because query + oracle run the
    SAME chain under the analyzer_version gate).
    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
    commongrams/CommonGramsFilter.java"""
    cw = common

    def run(ts: list[str]) -> list[str]:
        out: list[str] = []
        n = len(ts)
        for i, t in enumerate(ts):
            out.append(t)
            if i + 1 < n and (t in cw or ts[i + 1] in cw):
                out.append(t + "_" + ts[i + 1])
        return out

    return toks.map(run)


def common_grams_query_filter(
    toks: pd.Series, common: frozenset[str] = ENGLISH_STOP_WORDS
) -> pd.Series:
    """CommonGramsQueryFilter (query side): emit ONLY the bigrams for
    common-word pairs and drop the unigrams they absorbed; tokens that
    join no bigram pass through (a lone common word still emits
    itself). 'the merge scan' -> ['the_merge', 'scan'].
    ref: lucene/analysis/common/.../commongrams/CommonGramsQueryFilter.java"""
    cw = common

    def run(ts: list[str]) -> list[str]:
        n = len(ts)
        pair = [
            i + 1 < n and (ts[i] in cw or ts[i + 1] in cw)
            for i in range(n)
        ]
        out: list[str] = []
        for i, t in enumerate(ts):
            if pair[i]:
                out.append(t + "_" + ts[i + 1])
            elif not (i > 0 and pair[i - 1]):
                out.append(t)
        return out

    return toks.map(run)


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


# ---------------------------------------------------------------------------
# Porter stemmer (PorterStemFilter analog): the original 1980 algorithm
# ("An algorithm for suffix stripping", M.F. Porter, Program 14(3)),
# which is what the reference's English chain applies by default.
# ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
#      PorterStemFilter.java (wraps PorterStemmer.java, the original
#      algorithm — including abli→able, not the later bli→ble revision)
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in C?(VC){m}V? — the count of vowel→consonant transitions."""
    m, prev_cons = 0, None
    for i in range(len(w)):
        cons = _is_cons(w, i)
        if prev_cons is False and cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_cvc(w: str) -> bool:
    """*o: stem ends cons-vowel-cons, final cons not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def porter_stem(w: str) -> str:
    """One token through the original Porter algorithm (steps 1a-5b)."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stem = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stem = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stem = w[:-3]
        if stem is not None:
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif (
                len(w) >= 2
                and w[-1] == w[-2]
                and _is_cons(w, len(w) - 1)
                and w[-1] not in "lsz"
            ):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue  # (*S or *T) ION only
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


def porter_filter(toks: pd.Series) -> pd.Series:
    """PorterStemFilter: full Porter stemming per token (memoized per
    batch — vocabulary is tiny relative to token volume)."""
    cache: dict[str, str] = {}

    def stem(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = porter_stem(t)
        return s

    return toks.map(lambda ts: [stem(t) for t in ts])


# ---------------------------------------------------------------------------
# Non-English light stemmers (the per-language analysis chains under
# lucene/analysis/common). Same wiring as Porter: pandas token-Series
# filters composed via chain(), index pinned by analyzer_version, and
# the DuckDB oracle CASE map generated from the SAME scalar stemmer
# over the pinned corpus vocabulary (the vocab-subset guard in
# tests/test_analyzer.py covers every chain that uses the pattern).
# ---------------------------------------------------------------------------

#: Tokens the FrenchAnalyzer's ElisionFilter would have consumed as
#: "l'" / "qu'" prefixes. Our [a-z0-9]+ tokenizer splits on the
#: apostrophe, so the elided article survives as its own 1-2 char
#: token — dropping those tokens is the stream-level equivalent.
#: ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
#:      util/ElisionFilter.java (FrenchAnalyzer#DEFAULT_ARTICLES)
FRENCH_ELISION = frozenset("l m t qu n s j d c".split())


def french_minimal_stem(w: str) -> str:
    """One token through Lucene's French *minimal* stemmer: plural
    'x' normalization (chevaux → cheval), then strip at most one each
    of trailing s, r, e, é, and a doubled final letter — only on
    words of length >= 6.

    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         fr/FrenchMinimalStemFilter.java (FrenchMinimalStemmer, the
         Savoy minimal French stemmer)"""
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-2] + "l"
        return w[:-1]
    n = len(w)
    if w[n - 1] == "s":
        n -= 1
    if w[n - 1] == "r":
        n -= 1
    if w[n - 1] == "e":
        n -= 1
    if w[n - 1] == "é":  # é
        n -= 1
    if w[n - 1] == w[n - 2] and w[n - 1].isalpha():
        n -= 1
    return w[:n]


def french_minimal_filter(toks: pd.Series) -> pd.Series:
    """FrenchMinimalStemFilter (memoized per batch like Porter)."""
    cache: dict[str, str] = {}

    def stem(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = french_minimal_stem(t)
        return s

    return toks.map(lambda ts: [stem(t) for t in ts])


def german_light_stem(w: str) -> str:
    """One token through Lucene's German light stemmer (Savoy):
    umlaut/diacritic normalization, then two suffix-strip passes —
    step 1 removes 'ern' / 'e[mnrs]' / final 'e' / 's' after a valid
    consonant, step 2 removes 'est' / 'st' after a valid consonant.

    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         de/GermanLightStemFilter.java (GermanLightStemmer)"""
    w = w.translate(_GERMAN_FOLD)
    n = len(w)
    # step 1
    if n > 5 and w.endswith("ern"):
        n -= 3
    elif n > 4 and w[n - 2] == "e" and w[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and w[n - 1] == "e":
        n -= 1
    elif n > 3 and w[n - 1] == "s" and w[n - 2] in _ST_ENDING:
        n -= 1
    w = w[:n]
    # step 2
    if n > 5 and w.endswith("est"):
        n -= 3
    elif n > 4 and w.endswith("st") and w[n - 3] in _ST_ENDING:
        n -= 2
    return w[:n]


#: Valid consonants before a strippable s/st (GermanLightStemmer#stEnding)
_ST_ENDING = frozenset("bdfghklmnt")
_GERMAN_FOLD = str.maketrans(
    {"ä": "a", "ö": "o", "ü": "u", "ß": "s"}
)


def german_light_filter(toks: pd.Series) -> pd.Series:
    """GermanLightStemFilter (memoized per batch like Porter)."""
    cache: dict[str, str] = {}

    def stem(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = german_light_stem(t)
        return s

    return toks.map(lambda ts: [stem(t) for t in ts])


# ---------------------------------------------------------------------------
# Multi-word synonym contraction (SynonymGraphFilter's raison d'être:
# "data base => database"). Leftmost scan over the token stream; an
# occurrence of the source n-gram collapses to the single target
# token (consuming its positions — downstream doc_len/phrases count
# the contracted stream). Source n-grams cannot self-overlap after a
# match because the match consumes all its tokens.
# ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
#      synonym/SynonymGraphFilter.java (contraction side)
# ---------------------------------------------------------------------------


def multiword_synonym_filter(rules: dict[tuple[str, ...], str]):
    """rules: {(src_tok, ...): target}. Longest-rule-first leftmost
    replacement, single pass."""
    ordered = sorted(rules.items(), key=lambda kv: -len(kv[0]))

    def run(toks: pd.Series) -> pd.Series:
        def rewrite(ts: list[str]) -> list[str]:
            out, i, n = [], 0, len(ts)
            while i < n:
                for src, dst in ordered:
                    m = len(src)
                    if i + m <= n and tuple(ts[i:i + m]) == src:
                        out.append(dst)
                        i += m
                        break
                else:
                    out.append(ts[i])
                    i += 1
            return out

        return toks.map(rewrite)

    return run


# ---------------------------------------------------------------------------
# HTML stripping (HTMLStripCharFilter analog) — a CHAR filter: tags
# and character entities are replaced with spaces BEFORE tokenization
# so markup never becomes terms and adjacent text never fuses across
# a tag boundary. The pinned subset: <...> tags (incl. attributes)
# and &name;/&#nn; entities; script/style content removal is out of
# scope (the corpus enrichment emits none).
# ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
#      charfilter/HTMLStripCharFilter.java
# ---------------------------------------------------------------------------

_HTML_MARKUP = re.compile(r"<[^>]*>|&#?[A-Za-z0-9]+;")


def html_strip(text: pd.Series) -> pd.Series:
    """Replace tags/entities with spaces (keeps token boundaries)."""
    return text.fillna("").str.replace(_HTML_MARKUP, " ", regex=True)


# ---------------------------------------------------------------------------
# Bounded-stream filters: LengthFilter (drop tokens outside a length
# band) and LimitTokenCountFilter (truncate the stream after N
# tokens — consumeAllTokens=false, the Lucene default: nothing past
# the limit is read). Both parameterized factories like
# synonym_filter; positions/doc_len downstream count the SURVIVORS.
# ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
#      miscellaneous/LengthFilter.java, LimitTokenCountFilter.java
# ---------------------------------------------------------------------------


def length_filter(min_len: int = 2, max_len: int = 20):
    """Keep tokens with min_len <= len <= max_len (both inclusive,
    LengthFilter contract)."""

    def run(toks: pd.Series) -> pd.Series:
        return toks.map(
            lambda ts: [t for t in ts if min_len <= len(t) <= max_len]
        )

    return run


def limit_token_count_filter(max_count: int):
    """Truncate each doc's token stream after max_count tokens."""

    def run(toks: pd.Series) -> pd.Series:
        return toks.map(lambda ts: ts[:max_count])

    return run


# ---------------------------------------------------------------------------
# Word-delimiter splitting (WordDelimiterFilter analog). The pinned
# tokenizer already splits on punctuation, so the remaining intra-word
# boundary is the letter↔digit transition: each token splits into its
# maximal letter / digit runs, emitted in order (generateWordParts +
# generateNumberParts + splitOnNumerics, preserveOriginal=false; the
# graph filter's stacked positions flatten to a linear stream here —
# doc_len and downstream positions count the PARTS).
# ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
#      miscellaneous/WordDelimiterGraphFilter.java
# ---------------------------------------------------------------------------

_WD_RUNS = re.compile("[a-z]+|[0-9]+")


def word_delimiter_filter(toks: pd.Series) -> pd.Series:
    """Split every token at letter↔digit transitions ('tool7' →
    'tool', '7'); all-letter / all-digit tokens pass through as the
    single run they are."""
    cache: dict[str, list[str]] = {}

    def split(t: str) -> list[str]:
        s = cache.get(t)
        if s is None:
            s = cache[t] = _WD_RUNS.findall(t)
        return s

    return toks.map(lambda ts: [p for t in ts for p in split(t)])


def keyword_marker(protected, stem=None):
    """KeywordMarkerFilter + stemmer in one stage: tokens in the
    ``protected`` set pass through unstemmed (KeywordAttribute set ⇒
    downstream stemmers skip); everything else runs the wrapped
    stemmer (default Porter). Lucene models this as two chained
    filters sharing a per-token attribute; with vectorized list-map
    stages the attribute IS the conditional.

    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         miscellaneous/SetKeywordMarkerFilter.java (+ KeywordAttribute
         honored by en/PorterStemFilter.java)
    """
    prot = frozenset(protected)
    stem_fn = stem or porter_stem
    cache: dict[str, str] = {}

    def keyword_marked_stem(toks: pd.Series) -> pd.Series:
        def enc(t: str) -> str:
            if t in prot:
                return t
            s = cache.get(t)
            if s is None:
                s = cache[t] = stem_fn(t)
            return s

        return toks.map(lambda ts: [enc(t) for t in ts])

    return keyword_marked_stem


def stemmer_override(overrides: dict[str, str], stem=None):
    """StemmerOverrideFilter + stemmer in one stage: tokens with an
    override map to their PINNED custom stem and are keyword-marked
    (the wrapped stemmer skips them — StemmerOverrideFilter sets
    KeywordAttribute exactly so); everything else runs the wrapped
    stemmer (default Porter). The dictionary-driven cousin of
    :func:`keyword_marker`: protect says "don't stem", override says
    "stem to THIS".

    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         miscellaneous/StemmerOverrideFilter.java (+ KeywordAttribute
         honored by en/PorterStemFilter.java)
    """
    ovr = dict(overrides)
    stem_fn = stem or porter_stem
    cache: dict[str, str] = {}

    def override_stem(toks: pd.Series) -> pd.Series:
        def enc(t: str) -> str:
            o = ovr.get(t)
            if o is not None:
                return o
            s = cache.get(t)
            if s is None:
                s = cache[t] = stem_fn(t)
            return s

        return toks.map(lambda ts: [enc(t) for t in ts])

    return override_stem


def reverse_filter(toks: pd.Series) -> pd.Series:
    """ReversedWildcardFilter analog: index every token REVERSED so a
    leading wildcard (``*ow``) becomes a PREFIX scan (``wo*``) over the
    reversed term dictionary — prefix predicates prune on the
    term-sorted dictionary's Parquet row-group min/max stats, where a
    ``LIKE '%ow'`` suffix scan must read the whole dictionary. Solr
    stores marker-prefixed reversed duplicates alongside the originals
    in ONE field; we keep the reversed stream as its own
    analyzer_version-gated chain index instead (no marker byte, no
    doubled posting volume — the caller picks the index by query
    shape). Reversal is a bijection on tokens, so df / tf / doc_len —
    and therefore BM25 — are identical to the forward index's.

    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         reverse/ReverseStringFilter.java + solr/core/src/java/org/
         apache/solr/analysis/ReversedWildcardFilterFactory.java
    """
    cache: dict[str, str] = {}

    def rev(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = t[::-1]
        return s

    return toks.map(lambda ts: [rev(t) for t in ts])


# ---------------------------------------------------------------------------
# Phonetic encoding (PhoneticFilter + commons-codec Soundex analog).
# American Soundex with the commons-codec refinements: H and W are
# skipped WITHOUT resetting the previous consonant code (consonants
# separated by h/w code once), vowels reset it. inject=false (the
# code REPLACES the token — one posting list per sound class); the
# one-analyzer-everywhere rule keeps codes lowercase ('m620', not
# 'M620'). Tokens containing non-letters pass through unchanged (the
# encoder is letters-only, PhoneticFilter's skip-unencodable path).
# ref: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
#      phonetic/PhoneticFilter.java (+ commons-codec
#      org.apache.commons.codec.language.Soundex US_ENGLISH)
# ---------------------------------------------------------------------------

_SOUNDEX_CODE = {}
for _chars, _code in (
    ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
    ("l", "4"), ("mn", "5"), ("r", "6"), ("aeiouy", "0"),
):
    for _c in _chars:
        _SOUNDEX_CODE[_c] = _code


def soundex_code(w: str) -> str:
    """4-char lowercase Soundex code of an all-letters token; tokens
    with any non-letter are returned unchanged."""
    if not w or not w.isalpha():
        return w
    out = [w[0]]
    last = _SOUNDEX_CODE.get(w[0], "0")
    for ch in w[1:]:
        if ch in "hw":
            continue  # HW rule: skip, previous code stays live
        code = _SOUNDEX_CODE.get(ch, "0")
        if code != "0" and code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code  # vowels (code 0) reset the dedupe window
    return "".join(out).ljust(4, "0")


def soundex_filter(toks: pd.Series) -> pd.Series:
    """PhoneticFilter(Soundex, inject=false): replace each token with
    its phonetic class code (memoized per batch)."""
    cache: dict[str, str] = {}

    def enc(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = soundex_code(t)
        return s

    return toks.map(lambda ts: [enc(t) for t in ts])


# ---------------------------------------------------------------------------
# Metaphone (PhoneticFilter + commons-codec Metaphone analog) — the
# consonant-class sibling of Soundex: Lawrence Philips' 1990 rule
# cascade with the commons-codec refinements, 4-char cap, inject=false
# (codes REPLACE tokens, lowercase per the one-analyzer rule). Pinned
# branch choices follow commons-codec, notably word-initial "CH" +
# vowel -> K ("character" -> krkt) while every other CH -> X
# ("teach" -> tx). Tokens with non-letters pass through unchanged.
# ref: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
#      phonetic/PhoneticFilter.java (+ commons-codec
#      org.apache.commons.codec.language.Metaphone)
# ---------------------------------------------------------------------------

_MP_VOWELS = "aeiou"
_MP_FRONTV = "eiy"   # front vowels soften C/G
_MP_VARSON = "csptg"  # H is silent after these


def metaphone_code(w: str, max_len: int = 4) -> str:
    """Metaphone code of an all-letters token (commons-codec rule
    cascade, lowercase); non-letter tokens are returned unchanged."""
    if not w or not w.isalpha():
        return w
    if len(w) == 1:
        return w
    # initial-pair transforms: AE/GN/KN/PN/WR drop the first letter,
    # WH -> W, initial X -> S
    if w[0] in "agkpw" and (
        (w[0] == "a" and w[1] == "e")
        or (w[0] in "gkp" and w[1] == "n")
        or (w[0] == "w" and w[1] == "r")
    ):
        w = w[1:]
    elif w[0] == "w" and w[1] == "h":
        w = "w" + w[2:]
    elif w[0] == "x":
        w = "s" + w[1:]
    n, wdsz = 0, len(w)
    code: list[str] = []

    def at(i: int) -> str:
        return w[i] if 0 <= i < wdsz else ""

    def vowel(i: int) -> bool:
        return at(i) in _MP_VOWELS

    def region(s: str) -> bool:
        return w[n:n + len(s)] == s

    while len(code) < max_len and n < wdsz:
        c = w[n]
        if c != "c" and at(n - 1) == c:  # dedupe doubles except C
            n += 1
            continue
        if c in _MP_VOWELS:
            if n == 0:
                code.append(c)
        elif c == "b":
            if not (n == wdsz - 1 and at(n - 1) == "m"):  # terminal MB
                code.append("b")
        elif c == "c":
            if at(n - 1) == "s" and at(n + 1) in _MP_FRONTV:
                pass  # SCE/SCI/SCY: C silent
            elif region("cia"):
                code.append("x")
            elif at(n + 1) in _MP_FRONTV:
                code.append("s")  # CE/CI/CY
            elif at(n - 1) == "s" and at(n + 1) == "h":
                code.append("k")  # SCH
            elif at(n + 1) == "h":
                # the pinned commons-codec branch: initial CH + vowel
                # after the H -> K, all other CH -> X
                code.append("k" if n == 0 and wdsz >= 3 and vowel(2)
                            else "x")
            else:
                code.append("k")
        elif c == "d":
            if at(n + 1) == "g" and at(n + 2) in _MP_FRONTV \
                    and n + 1 < wdsz - 1:
                code.append("j")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("t")
        elif c == "g":
            if at(n + 1) == "h" and n + 1 == wdsz - 1:
                pass  # terminal GH silent
            elif at(n + 1) == "h" and n + 1 < wdsz - 1 \
                    and not vowel(n + 2):
                pass  # GH before consonant silent
            elif n > 0 and (region("gn") or region("gned")):
                pass  # silent GN / GNED
            else:
                hard = at(n - 1) == "g"
                if at(n + 1) in _MP_FRONTV and not hard:
                    code.append("j")
                else:
                    code.append("k")
        elif c == "h":
            if n == wdsz - 1:
                pass  # terminal H silent
            elif n > 0 and at(n - 1) in _MP_VARSON:
                pass  # CH/SH/PH/TH/GH groups own the H
            elif vowel(n + 1):
                code.append("h")
        elif c in "fjlmnr":
            code.append(c)
        elif c == "k":
            if at(n - 1) != "c":
                code.append("k")
        elif c == "p":
            code.append("f" if at(n + 1) == "h" else "p")
        elif c == "q":
            code.append("k")
        elif c == "s":
            code.append("x" if region("sh") or region("sio")
                        or region("sia") else "s")
        elif c == "t":
            if region("tia") or region("tio"):
                code.append("x")
            elif region("tch"):
                pass  # silent in TCH
            elif region("th"):
                code.append("0")  # theta
            else:
                code.append("t")
        elif c == "v":
            code.append("f")
        elif c in "wy":
            if n < wdsz - 1 and vowel(n + 1):
                code.append(c)
        elif c == "x":
            code.extend("ks")
        elif c == "z":
            code.append("s")
        n += 1
    return "".join(code[:max_len])


def metaphone_filter(toks: pd.Series) -> pd.Series:
    """PhoneticFilter(Metaphone, inject=false): replace each token
    with its Metaphone class code (memoized per batch)."""
    cache: dict[str, str] = {}

    def enc(t: str) -> str:
        s = cache.get(t)
        if s is None:
            s = cache[t] = metaphone_code(t)
        return s

    return toks.map(lambda ts: [enc(t) for t in ts])


# ---------------------------------------------------------------------------
# ASCII folding (ASCIIFoldingFilter analog) — a CHAR filter here: the
# pinned tokenizer splits on [^a-z0-9], so accented letters must fold
# BEFORE tokenization to join their tokens (Lucene folds after its
# Unicode-aware tokenizer; same net tokens for Latin-1 input).
# ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
#      miscellaneous/ASCIIFoldingFilter.java
# ---------------------------------------------------------------------------

_COMBINING = re.compile("[̀-ͯ]")


def ascii_fold(text: pd.Series) -> pd.Series:
    """Fold accented Latin chars to ASCII (NFKD + strip combining
    marks) — the DuckDB twin is ``strip_accents()``."""
    return text.fillna("").str.normalize("NFKD").str.replace(
        _COMBINING, "", regex=True
    )


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


def mapping_char_filter(mapping: dict[str, str]):
    """MappingCharFilter analog — literal source → target rewrites on
    the raw text BEFORE tokenization. Pinned contract: sequential
    literal replaces in (longest source first, then lexical) order,
    output never rescanned per replace. Lucene's automaton matches
    every source simultaneously left-to-right; sequential replace is
    identical whenever no target contains another source — the
    factory rejects mappings outside that configuration so the
    divergence can't appear silently. Targets that could FUSE with
    neighboring text into another source are the caller's contract
    (pad targets with spaces, as the normMap examples in Solr's
    mapping-FoldToASCII.txt effectively do for multi-char sources).
    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         charfilter/MappingCharFilter.java"""
    ordered = sorted(mapping.items(), key=lambda kv: (-len(kv[0]), kv[0]))
    for _, tgt in ordered:
        for src, _ in ordered:
            if src in tgt:
                raise ValueError(
                    f"mapping target {tgt!r} contains source {src!r}: "
                    "sequential replace would rescan output where "
                    "Lucene's automaton does not")

    def run(text: pd.Series) -> pd.Series:
        text = text.fillna("")
        for src, tgt in ordered:
            text = text.str.replace(src, tgt, regex=False)
        return text

    return run


def pattern_replace_char_filter(pattern: str, replacement: str):
    """PatternReplaceCharFilter analog: one global regex rewrite of
    the raw text before tokenization — leftmost, non-overlapping,
    replaced output never rescanned (java.util.regex replaceAll ≡
    python re.sub ≡ RE2 'g' for patterns kept inside the common
    dialect; backreferences spelled \\1 both sides).
    ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
         pattern/PatternReplaceCharFilter.java"""
    rx = re.compile(pattern)

    def run(text: pd.Series) -> pd.Series:
        return text.fillna("").str.replace(rx, replacement, regex=True)

    return run


def chain(*filters, char_filters=()):
    """Compose an analyzer stage: char_filter_1 → ... → tokenize →
    filter_1 → ... → filter_n (Analyzer/TokenStream pipeline;
    ``char_filters`` are CharFilter analogs running on the raw text
    before the tokenizer, e.g. :func:`ascii_fold`)."""

    def run(text: pd.Series) -> pd.Series:
        for cf in char_filters:
            text = cf(text)
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
