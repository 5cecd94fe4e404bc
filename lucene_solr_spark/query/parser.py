"""Query-string parser → :class:`BooleanSpec` (SURVEY §2.2 P16).

A compact recursive-descent parser for the Lucene classic-syntax
subset the engine executes — the re-expression of
``lucene/queryparser/classic/QueryParser.jj`` (javacc grammar) and
Solr's ``QParser``/``ExtendedDismaxQParser`` front door:

    merge sort             two SHOULD terms (default OR, mm honors q.op)
    +merge window          MUST + SHOULD      (Occur prefixes)
    merge -stream          SHOULD + MUST_NOT
    "table scan"           exact PhraseQuery
    -"table scan"          NEGATED phrase (MUST_NOT occur)
    role:assistant         field FILTER (non-scoring fq, StrField match)
    -role:assistant        negated filter (differs-or-missing matches)
    merge AND sort         boolean operators (AND → both MUST)
    merge OR sort          explicit OR
    fast^2                 per-term boost (boost < 0 → ValueError,
                           BoostQuery/WAND soundness)
    s?a*                   WildcardQuery (unrewritten; the searcher's
                           dictionary-scan rewrite expands it)
    /s(can|ort)/           RegexpQuery (whole-term anchored, ditto)

Query-time text analysis uses the SAME pinned analyzer as indexing
(``Analyzer`` invariant): every bare term and phrase word passes
through :func:`tokenize_one` before hitting the index, so e.g.
``MERGE`` and ``merge`` are one term.
"""

from __future__ import annotations

import re

from lucene_solr_spark.analyzer import tokenize_one
from lucene_solr_spark.query.model import BooleanSpec

#: fields that parse as non-scoring filters (our StrField schema)
FILTER_FIELDS = ("role", "tool")

#: fields rangeable via ``field:[lo TO hi]`` (native-typed compare)
RANGE_FIELDS = ("role", "tool", "ts", "turn_idx")

_TOKEN_RE = re.compile(
    r"""
    (?P<phrase>[+-]?"[^"]*")
  | (?P<range>[+-]?[A-Za-z_][A-Za-z0-9_]*:[\[{][^\]}]*[\]}])
  | (?P<field>[+-]?[A-Za-z_][A-Za-z0-9_]*:[^\s]+)
  | (?P<op>AND|OR|NOT)(?=\s|$)
  | (?P<term>[+-]?[^\s]+)
    """,
    re.VERBOSE,
)

_RANGE_BODY = re.compile(r"^\[(.*?)\s+TO\s+(.*?)\]$", re.IGNORECASE)

#: ``{!terms f=field}v1,v2,...`` — TermsQParser local-params form: the
#: ENTIRE remainder is the comma-separated value list (values are raw
#: field values, NOT analyzed — StrField semantics).
_TERMS_QPARSER = re.compile(r"^\{!terms\s+f=([A-Za-z_][A-Za-z0-9_]*)\}(.*)$")

#: ``{!term f=field}value`` / ``{!prefix f=field}frag`` /
#: ``{!field f=field}value`` — the three single-field qparser plugins.
_ONE_FIELD_QPARSER = re.compile(
    r"^\{!(term|prefix|field)\s+f=([A-Za-z_][A-Za-z0-9_]*)\}(.*)$", re.S
)


def parse(query: str, k: int = 10, default_op: str = "OR") -> BooleanSpec:
    """Parse a query string into the normalized BooleanSpec IR.

    default_op='AND' mirrors Solr's ``q.op=AND`` (all bare terms MUST);
    'OR' leaves bare terms SHOULD with min_should_match=1 when no MUST
    clause exists (Lucene BooleanQuery semantics).

    The TermsQParser local-params form ``{!terms f=field}v1,v2`` parses
    the whole input as one set-membership filter (TermInSetQuery) —
    Solr hands the full remainder to the plugin, so no other clauses
    can follow.
    ref: solr/core/src/java/org/apache/solr/search/TermsQParserPlugin.java
    """
    mt = _TERMS_QPARSER.match(query.strip())
    if mt:
        fld, body = mt.group(1), mt.group(2)
        if fld not in FILTER_FIELDS:
            raise ValueError(f"field {fld!r} is not filterable")
        vals = tuple(v.strip() for v in body.split(",") if v.strip())
        if not vals:
            raise ValueError(f"empty terms list: {query!r}")
        return BooleanSpec(in_filters=((fld, vals),), k=k)

    m1 = _ONE_FIELD_QPARSER.match(query.strip())
    if m1:
        plugin, fld, body = m1.group(1), m1.group(2), m1.group(3)
        if not body:
            raise ValueError(f"{{!{plugin}}} wants a value: {query!r}")
        if plugin == "term":
            # TermQParserPlugin: ONE TermQuery on the RAW value — no
            # analysis, ever (the StrField/docvalues filter form; on
            # the text field the value must already be an index term).
            # ref: solr/core/src/java/org/apache/solr/search/
            #      TermQParserPlugin.java
            if fld in FILTER_FIELDS:
                return BooleanSpec(filters=((fld, body),), k=k)
            if fld == "text":
                return BooleanSpec(must=(body,), k=k)
            raise ValueError(f"undefined field {fld!r}")
        if plugin == "prefix":
            # PrefixQParserPlugin: PrefixQuery with NO analysis of the
            # fragment; text-field only (docvalues fields have no term
            # dictionary to expand against). Rides the multiterm
            # rewrite like wildcard 'frag*'.
            # ref: solr/core/src/java/org/apache/solr/search/
            #      PrefixQParserPlugin.java
            if fld != "text":
                raise ValueError(
                    f"{{!prefix}} wants the indexed text field, got {fld!r}")
            return BooleanSpec(wildcards=(body.lower() + "*",), k=k)
        # FieldQParserPlugin: the value runs the FIELD's analyzer —
        # one token → TermQuery, many → PhraseQuery (exact adjacency).
        # ref: solr/core/src/java/org/apache/solr/search/
        #      FieldQParserPlugin.java
        if fld in FILTER_FIELDS:
            return BooleanSpec(filters=((fld, body),), k=k)
        if fld != "text":
            raise ValueError(f"undefined field {fld!r}")
        toks = tuple(tokenize_one(body))
        if not toks:
            raise ValueError(f"{{!field}} value analyzed to zero terms")
        if len(toks) == 1:
            return BooleanSpec(must=toks, k=k)
        return BooleanSpec(phrases=(toks,), k=k)

    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    phrases: list[tuple[str, ...]] = []
    must_not_phrases: list[tuple[str, ...]] = []
    filters: list[tuple[str, str]] = []
    not_filters: list[tuple[str, str]] = []
    boosts: list[tuple[str, float]] = []
    range_filters: list[tuple[str, str | None, str | None]] = []
    exists_filters: list[str] = []
    missing_filters: list[str] = []
    wildcards: list[str] = []
    regexps: list[str] = []

    pending_op: str | None = None
    prev_bare: str | None = None  # last bare SHOULD term (for AND join)
    negate_next = False

    for m in _TOKEN_RE.finditer(query):
        kind = m.lastgroup
        tok = m.group()
        if kind == "op":
            if tok == "NOT":
                negate_next = True
            else:
                pending_op = tok
            continue

        occur = ""
        if tok[0] in "+-":
            occur, tok = tok[0], tok[1:]
        if negate_next:
            occur, negate_next = "-", False

        if kind == "range":
            # field:[lo TO hi] — unsupported range shapes RAISE (the
            # accept-and-invert trap: silently tokenizing '[a TO b]'
            # as OR terms answered the opposite question).
            fld, _, body = tok.partition(":")
            if occur == "-":
                raise ValueError(f"negated range not supported: {tok!r}")
            if body.startswith("{") or body.endswith("}"):
                raise ValueError(
                    f"exclusive range bounds not supported: {tok!r}"
                )
            mb = _RANGE_BODY.match(body)
            if not mb:
                raise ValueError(f"malformed range: {tok!r}")
            if fld not in RANGE_FIELDS:
                raise ValueError(f"field {fld!r} is not rangeable")
            lo, hi = (
                None if v.strip() == "*" else v.strip() for v in mb.groups()
            )
            range_filters.append((fld, lo, hi))
            prev_bare = None
        elif kind == "phrase":
            words = tuple(
                w for part in tok.strip('"').split() for w in tokenize_one(part)
            )
            if words:
                # '-"a b"' / 'NOT "a b"' is a NEGATED phrase — Lucene
                # MUST_NOT occur, never a positive requirement.
                (must_not_phrases if occur == "-" else phrases).append(words)
            prev_bare = None
        elif kind == "field":
            fld, _, val = tok.partition(":")
            if val == "*" and fld in FILTER_FIELDS:
                # 'tool:*' → FieldValueQuery (field has a value);
                # '-tool:*' → missing. NOT an equality with literal
                # '*' (the accept-and-invert trap this guard closes) —
                # Solr's getWildcardQuery special-cases the bare star.
                (missing_filters if occur == "-"
                 else exists_filters).append(fld)
            elif fld in FILTER_FIELDS:
                # '-role:assistant' → negated filter (differs-or-missing)
                (not_filters if occur == "-" else filters).append((fld, val))
            else:  # unknown field → treat value as a term on the text
                for w in tokenize_one(val):
                    (must_not if occur == "-" else should).append(w)
            prev_bare = None
        elif kind == "term" and len(tok) > 2 and tok.startswith("/") and tok.endswith("/"):
            # /regex/ — RegexpQuery (whole-term anchored at rewrite)
            if occur == "-":
                raise ValueError(f"negated regexp not supported: {tok!r}")
            regexps.append(tok[1:-1].lower())
            prev_bare = None
        elif kind == "term" and ("*" in tok or "?" in tok):
            # WildcardQuery — lowercased like Lucene's
            # lowercase_expanded_terms (the index terms are lowercase)
            if occur == "-":
                raise ValueError(f"negated wildcard not supported: {tok!r}")
            wildcards.append(tok.lower())
            prev_bare = None
        else:  # bare term (with optional ^boost, BoostQuery syntax)
            boost = None
            if "^" in tok:
                tok, _, bs = tok.partition("^")
                try:
                    boost = float(bs)
                except ValueError:
                    boost = None
            words = tokenize_one(tok)
            if not words:
                continue
            if boost is not None:
                boosts.extend((w, boost) for w in words)
            for w in words:
                if occur == "+":
                    must.append(w)
                elif occur == "-":
                    must_not.append(w)
                elif pending_op == "AND" or default_op == "AND":
                    # AND joins: promote both operands to MUST
                    if pending_op == "AND" and prev_bare is not None:
                        if prev_bare in should:
                            should.remove(prev_bare)
                        if prev_bare not in must:
                            must.append(prev_bare)
                    must.append(w)
                else:
                    should.append(w)
            prev_bare = words[-1] if occur == "" else None
        pending_op = None

    # multiterm expansions are SHOULD clauses post-rewrite, so they
    # count toward "has optional clauses" for the mm default
    mm = 1 if ((should or wildcards or regexps) and not must and not phrases) else 0
    return BooleanSpec(
        must=tuple(dict.fromkeys(must)),
        should=tuple(dict.fromkeys(should)),
        must_not=tuple(dict.fromkeys(must_not)),
        phrases=tuple(phrases),
        min_should_match=mm,
        filters=tuple(filters),
        must_not_phrases=tuple(must_not_phrases),
        not_filters=tuple(not_filters),
        k=k,
        boosts=tuple(boosts),
        range_filters=tuple(range_filters),
        exists_filters=tuple(dict.fromkeys(exists_filters)),
        missing_filters=tuple(dict.fromkeys(missing_filters)),
        wildcards=tuple(dict.fromkeys(wildcards)),
        regexps=tuple(dict.fromkeys(regexps)),
    )


def _calc_mm(mm: int | str, n_optional: int) -> int:
    """Solr mm spec (SolrPluginUtils#calculateMinShouldMatch): an int,
    a negative int (n_optional − |mm|), a percentage ('75%', floor of
    n×pct; negative per spec = all-but-floor), or the CONDITIONAL
    grammar 'N<val N<val …' — each clause applies its val when
    n_optional > N; the clause with the LARGEST applicable N wins;
    with no applicable clause all optionals are required."""
    if isinstance(mm, str):
        mm = mm.strip()
        if "<" in mm:
            best_n, best_val = -1, None
            for clause in mm.split():
                cond, val = clause.split("<", 1)
                n = int(cond)
                if n_optional > n and n > best_n:
                    best_n, best_val = n, val
            if best_val is None:
                return n_optional  # below every threshold: require all
            return _calc_mm(best_val, n_optional)
        if mm.endswith("%"):
            pct = float(mm[:-1])
            if pct < 0:  # '-25%': all but floor(n*|pct|)
                return n_optional - int(n_optional * -pct // 100)
            return int(n_optional * pct // 100)
        mm = int(mm)
    if mm < 0:  # '-2': all but 2
        return max(0, n_optional + mm)
    return int(mm)


def edismax(
    query: str,
    k: int = 10,
    mm: int | str = 1,
    pf: bool = True,
    pf2: bool = False,
    pf3: bool = False,
    pf_boost: float = 1.0,
    ps: int = 0,
) -> BooleanSpec:
    """edismax front door (single-field subset): the analyzed query
    terms become a SHOULD disjunction under ``mm`` (int or 'N%'), and
    — like Solr's ``pf`` — the WHOLE query, as one exact phrase, is
    added as an optional phrase-boost clause (docs where the terms
    appear contiguously in query order rank higher; matching is
    unchanged). ``pf2``/``pf3`` add the query's consecutive bigram/
    trigram shingles as additional optional phrases (edismax
    addShingledPhraseQueries). Multi-field qf/tie lives in the
    relational battery (q_dismax); this engine indexes one text field.

    ref: solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java
    (pf/pf2/pf3 handling: U.parseFieldBoosts + addShingledPhraseQueries),
    solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java
    (calculateMinShouldMatch)."""
    terms = tuple(tokenize_one(query))
    if not terms:
        raise ValueError("edismax query analyzed to zero terms")
    should = tuple(dict.fromkeys(terms))
    pf_phrases: list[tuple[str, ...]] = []
    if pf and len(terms) >= 2:
        pf_phrases.append(terms)
    for flag, n in ((pf2, 2), (pf3, 3)):
        if flag and len(terms) > n:  # == n would duplicate the pf phrase
            pf_phrases.extend(
                terms[i : i + n] for i in range(len(terms) - n + 1)
            )
    return BooleanSpec(
        should=should,
        # Solr clamps the computed mm into [1, #optional clauses]
        # (SolrPluginUtils: result > optionalClauseCount ? count : result)
        min_should_match=max(1, min(len(should), _calc_mm(mm, len(should)))),
        pf_phrases=tuple(dict.fromkeys(pf_phrases)),
        pf_boost=pf_boost,
        pf_slop=ps,  # edismax ps: phrase-boost slop
        k=k,
    )
