"""/select SearchHandler front door — the request surface a reference
user actually calls: one params dict composing q + q.op + fq list +
start/rows paging + fl projection + facet.field list over the same
components the dedicated operators attest individually.

ref: solr/core/src/java/org/apache/solr/handler/component/
SearchHandler.java (the component pipeline: QueryComponent →
FacetComponent), solr/core/src/java/org/apache/solr/search/
QParser.java (q/fq parsing), SolrReturnFields.java (fl=).

Subset contract (raise on anything outside it, like Solr's 400s on
bad params): ``q`` parses through the classic parser (q.op honored)
or, under ``defType=edismax``, the edismax front door (mm/pf/ps
honored, q.op rejected — mm owns the clause arithmetic); each ``fq``
must parse to a PURE filter (field:value, ranges, IN sets, exists/
missing, negations — a scoring fq would change ranking semantics
silently, so it is rejected); ``sort`` is ``score desc`` (default) or
``<docvalues-field> asc|desc`` with the engine's pinned (conv_id,
turn_idx) tiebreak; ``start``/``rows`` page the ranked doclist;
``facet.field`` fans out to the index facet engine over the SAME
filtered domain as the doclist; ``json.facet`` accepts the JSON
Facet API subset the engine executes (terms buckets with one
``avg(col)`` sub-agg, query buckets as pure filters).
"""

from __future__ import annotations

import re
from dataclasses import replace

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.parser import edismax, parse

#: params this handler understands — anything else is a hard error
#: (Solr rejects unknown critical params rather than guessing)
_KNOWN = {
    "q", "q.op", "fq", "sort", "start", "rows", "fl",
    "facet", "facet.field", "facet.limit", "facet.sort",
    "facet.mincount", "facet.prefix", "facet.offset", "hl", "hl.fl",
    "defType", "mm", "pf", "ps", "json.facet",
}

#: docvalues columns a field sort may key on (SortSpecParsing resolves
#: sort fields against the schema the same way; anything else is a 400)
_SORTABLE = {"conv_id", "turn_idx", "role", "tool", "ftok", "ts", "doc_len"}

#: ord-indexed fields the facet engines bucket on / numeric docvalues
#: a JSON-Facet sub-agg may aggregate (schema resolution, 400 outside)
_FACETABLE = {"role", "tool", "ftok"}
_AGG_COLS = {"doc_len", "turn_idx"}


def _pure_filter(spec: BooleanSpec, raw: str) -> BooleanSpec:
    """Reject an fq that carries scoring clauses."""
    if (spec.must or spec.should or spec.must_not or spec.phrases
            or spec.must_not_phrases):
        raise ValueError(f"fq must be a pure filter, got scoring: {raw!r}")
    return spec


def _merge_filters(spec: BooleanSpec, f_spec: BooleanSpec) -> BooleanSpec:
    """Fold a pure filter's constraints into ``spec`` (fq semantics)."""
    return replace(
        spec,
        filters=spec.filters + f_spec.filters,
        not_filters=spec.not_filters + f_spec.not_filters,
        range_filters=spec.range_filters + f_spec.range_filters,
        in_filters=spec.in_filters + f_spec.in_filters,
        exists_filters=spec.exists_filters + f_spec.exists_filters,
        missing_filters=spec.missing_filters + f_spec.missing_filters,
    )


def _parse_json_facets(jf) -> dict:
    """Normalize a ``json.facet`` request (JSON string or dict) into
    {name: ("terms", field, limit, metric_col|None, sort)} /
    {name: ("query", filter BooleanSpec)} — the JSON Facet API subset
    the index engine executes: terms buckets with at most one
    ``avg(<numeric docvalues>)`` sub-agg (named ``avg_<col>``, the
    engine's output column), bucket sort by count or that metric, and
    query buckets that must be pure filters. Anything else raises
    like FacetModule's SyntaxErrors.

    ref: solr/core/src/java/org/apache/solr/search/facet/
    FacetRequest.java (parse), FacetFieldProcessor, QueryFacet."""
    if isinstance(jf, str):
        import json

        jf = json.loads(jf)
    if not isinstance(jf, dict):
        raise ValueError("json.facet must be a JSON object")
    out: dict = {}
    for name, req in jf.items():
        if not isinstance(req, dict) or "type" not in req:
            raise ValueError(f"json.facet {name!r}: object with 'type' "
                             f"required, got {req!r}")
        ftype = req["type"]
        if ftype == "terms":
            unknown = set(req) - {"type", "field", "limit", "facet", "sort"}
            if unknown:
                raise ValueError(
                    f"json.facet {name!r}: unknown keys {sorted(unknown)}")
            fld = req.get("field")
            if fld not in _FACETABLE:
                raise ValueError(f"json.facet {name!r}: field must be one "
                                 f"of {sorted(_FACETABLE)}, got {fld!r}")
            metric = None
            subs = req.get("facet", {})
            if subs:
                if len(subs) != 1:
                    raise ValueError(f"json.facet {name!r}: at most one "
                                     "sub-aggregation is supported")
                (agg_name, agg), = subs.items()
                m = re.fullmatch(r"avg\((\w+)\)", str(agg))
                if not m or m.group(1) not in _AGG_COLS:
                    raise ValueError(
                        f"json.facet {name!r}: sub-agg must be "
                        f"avg(<{ '|'.join(sorted(_AGG_COLS)) }>), "
                        f"got {agg!r}")
                metric = m.group(1)
                if agg_name != f"avg_{metric}":
                    raise ValueError(
                        f"json.facet {name!r}: the sub-agg key names the "
                        f"output column — use 'avg_{metric}'")
            sort = req.get("sort", "count")
            if sort not in ("count",) and (
                    metric is None or sort != f"avg_{metric} desc"):
                raise ValueError(f"json.facet {name!r}: sort must be "
                                 f"'count' or '<sub-agg name> desc'")
            out[name] = (
                "terms", fld, int(req.get("limit", 10)), metric,
                "metric" if sort != "count" else "count",
            )
        elif ftype == "query":
            unknown = set(req) - {"type", "q"}
            if unknown:
                raise ValueError(
                    f"json.facet {name!r}: unknown keys {sorted(unknown)}")
            raw = req.get("q")
            if not raw:
                raise ValueError(f"json.facet {name!r}: 'q' required")
            out[name] = (
                "query", _pure_filter(parse(raw, default_op="AND"), raw),
            )
        elif ftype == "range":
            unknown = set(req) - {"type", "field", "start", "end", "gap"}
            if unknown:
                raise ValueError(
                    f"json.facet {name!r}: unknown keys {sorted(unknown)}")
            fld = req.get("field")
            if fld not in _AGG_COLS:
                raise ValueError(f"json.facet {name!r}: range field must "
                                 f"be one of {sorted(_AGG_COLS)}, got "
                                 f"{fld!r}")
            try:
                start_v = int(req["start"])
                end_v = int(req["end"])
                gap = int(req["gap"])
            except (KeyError, TypeError, ValueError):
                raise ValueError(f"json.facet {name!r}: integer start/"
                                 "end/gap required") from None
            if gap <= 0 or end_v <= start_v:
                raise ValueError(f"json.facet {name!r}: need gap > 0 and "
                                 "end > start")
            out[name] = ("range", fld, start_v, end_v, gap)
        else:
            raise ValueError(
                f"json.facet {name!r}: unsupported type {ftype!r} "
                "(terms | query)")
    return out


def parse_select_params(params: dict) -> tuple[BooleanSpec, dict]:
    """params dict → (combined BooleanSpec, normalized options)."""
    unknown = set(params) - _KNOWN
    if unknown:
        raise ValueError(f"unknown /select params: {sorted(unknown)}")
    if "q" not in params:
        raise ValueError("missing required param: q")
    start = int(params.get("start", 0))
    rows = int(params.get("rows", 10))
    if start < 0 or rows < 0:
        raise ValueError(f"start/rows must be >= 0: {start}/{rows}")
    sort = params.get("sort", "score desc")
    if sort == "score desc":
        sort_key = None  # ranked doclist, the default
    else:
        parts = sort.split()
        if (len(parts) != 2 or parts[0] not in _SORTABLE
                or parts[1] not in ("asc", "desc")):
            raise ValueError(
                f"unsupported sort: {sort!r} (score desc or "
                f"<docvalues field> asc|desc)")
        sort_key = (parts[0], parts[1] == "asc")
    def_type = params.get("defType", "lucene")
    if def_type == "edismax":
        if "q.op" in params:
            raise ValueError("q.op is not a defType=edismax param — "
                             "mm owns the optional-clause arithmetic")
        spec = edismax(
            params["q"], k=start + rows,
            mm=params.get("mm", 1),
            pf=bool(params.get("pf", True)),
            ps=int(params.get("ps", 0)),
        )
    elif def_type == "lucene":
        if {"mm", "pf", "ps"} & set(params):
            raise ValueError("mm/pf/ps need defType=edismax")
        spec = parse(
            params["q"], k=start + rows,
            default_op=params.get("q.op", "OR"),
        )
    else:
        raise ValueError(f"unknown defType: {def_type!r}")
    fqs = params.get("fq", [])
    if isinstance(fqs, str):
        fqs = [fqs]
    for raw in fqs:
        spec = _merge_filters(
            spec, _pure_filter(parse(raw, default_op="AND"), raw)
        )
    facet_fields = params.get("facet.field", [])
    if isinstance(facet_fields, str):
        facet_fields = [facet_fields]
    if facet_fields and not params.get("facet", True):
        facet_fields = []
    hl = bool(params.get("hl", False))
    if hl and params.get("hl.fl", "text") != "text":
        raise ValueError("hl.fl supports the analyzed text field only")
    facet_sort = params.get("facet.sort", "count")
    if facet_sort not in ("count", "index"):
        raise ValueError(f"facet.sort must be count|index: {facet_sort!r}")
    facet_mincount = int(params.get("facet.mincount", 1))
    if facet_mincount < 1:
        raise ValueError("facet.mincount must be >= 1 (the engine's "
                         "facet contract never emits zero buckets)")
    facet_offset = int(params.get("facet.offset", 0))
    if facet_offset < 0:
        raise ValueError(f"facet.offset must be >= 0: {facet_offset}")
    opts = {
        "start": start, "rows": rows,
        "fl": params.get("fl"),
        "facet_fields": list(facet_fields),
        "facet_limit": int(params.get("facet.limit", 10)),
        "facet_sort": facet_sort,
        "facet_mincount": facet_mincount,
        "facet_prefix": params.get("facet.prefix"),
        "facet_offset": facet_offset,
        "hl": hl,
        "sort": sort_key,
        "json_facets": (
            _parse_json_facets(params["json.facet"])
            if "json.facet" in params else {}
        ),
    }
    return spec, opts


def select(searcher, params: dict, stored: DataFrame | None = None) -> dict:
    """Run the composed request; returns ``{"response": DataFrame,
    "numFound": int, "facet_counts": {field: DataFrame}}``.

    Paging stays distributed-bounded: the engine retrieves the
    start+rows head (what Solr's distributed merge heap holds), and
    the offset slices with one row_number window over those ≤
    start+rows rows — never a global sort, never a driver collect.
    A field sort orders the match DocSet by index docvalues instead
    of score (keys join the pruned docmap columns, the limit turns
    the order into a distributed TakeOrdered top-k — still never a
    global sort). numFound is the full DocSet count (Solr's
    numFound), one bounded count job over the same masked domain.
    Facets run the index sparse-counting engine over the SAME spec
    (hits + fq), so multi-component responses stay
    one-domain-consistent."""
    spec, o = parse_select_params(params)
    if o["sort"] is None:
        head = searcher.search(spec, round_to=4)
        order = [F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")]
    else:
        fld, asc = o["sort"]
        key = F.asc(fld) if asc else F.desc(fld)
        order = [key, F.asc("conv_id"), F.asc("turn_idx")]
        dm_cols = ["conv_id", "turn_idx"] + (
            [fld] if fld not in ("conv_id", "turn_idx") else []
        )
        head = (
            searcher.docmap().select(*dm_cols)
            .join(searcher.docset(spec), ["conv_id", "turn_idx"])
            .orderBy(*order)
            .limit(o["start"] + o["rows"])
        )
    w = Window.orderBy(*order)
    paged = head.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") > o["start"]
    )
    page = paged.drop("rn").orderBy(*order)
    page_keys = paged.select("conv_id", "turn_idx", "rn")
    if o["fl"]:
        page = page.select(*o["fl"])
    out: dict = {
        "response": page,
        "numFound": searcher.docset(spec).count(),
        "facet_counts": {},
    }
    for fld in o["facet_fields"]:
        out["facet_counts"][fld] = searcher.facet(
            fld, spec=spec, limit=o["facet_limit"],
            mincount=o["facet_mincount"], sort=o["facet_sort"],
            prefix=o["facet_prefix"], offset=o["facet_offset"],
        )
    if o["json_facets"]:
        # JSON Facet API leg (FacetModule): every bucket runs over the
        # SAME q+fq domain as the doclist; terms buckets ride the index
        # sparse engines (metric sub-aggs fold into the same per-segment
        # pass), query buckets are one bounded DocSet count each
        from lucene_solr_spark.query.facets import facet_metrics

        out["facets"] = {}
        for name, req in o["json_facets"].items():
            if req[0] == "terms":
                _, fld, limit, metric, sort = req
                if metric is None:
                    out["facets"][name] = searcher.facet(
                        fld, spec=spec, limit=limit
                    )
                else:
                    out["facets"][name] = facet_metrics(
                        searcher, fld, metric=metric, spec=spec,
                        limit=limit, sort=sort,
                    )
            elif req[0] == "range":
                # numeric range buckets off the docvalues column over
                # the domain (RangeFacetProcessor); non-empty buckets
                # only (the engine's range-facet contract), bounded by
                # (end-start)/gap rows
                _, fld, start_v, end_v, gap = req
                c = F.col(fld)
                out["facets"][name] = (
                    searcher.docmap().select("conv_id", "turn_idx", fld)
                    .join(searcher.docset(spec), ["conv_id", "turn_idx"])
                    .filter((c >= start_v) & (c < end_v))
                    .groupBy(
                        (F.floor((c - start_v) / gap) * gap + start_v)
                        .cast("long").alias("bucket_start")
                    )
                    .agg(F.count("*").cast("long").alias("cnt"))
                    .orderBy("bucket_start")
                )
            else:
                out["facets"][name] = searcher.docset(
                    _merge_filters(spec, req[1])
                ).count()
    if o["hl"]:
        # highlight leg (DefaultSolrHighlighter in the /select flow):
        # ONLY the page's rows join back to stored fields (broadcast of
        # <= rows keys), every scoring-term occurrence marks token-level
        # from the same analyzer stream the matcher used
        if stored is None:
            raise ValueError("hl=true needs the stored-fields frame")
        from lucene_solr_spark.analyzer import tokens_col

        terms = list(dict.fromkeys(
            spec.scoring_terms + tuple(t for ph in spec.phrases for t in ph)
        ))
        toks = tokens_col("text")
        mark = F.transform(
            toks,
            lambda tk: F.when(
                tk.isin(*terms),
                F.concat(F.lit("<em>"), tk, F.lit("</em>")),
            ).otherwise(tk),
        ) if terms else toks  # filter-only q: nothing to mark
        out["highlighting"] = (
            stored.join(
                F.broadcast(page_keys),
                ["conv_id", "turn_idx"],
            )
            .select(
                "conv_id", "turn_idx",
                F.array_join(mark, " ").alias("snippet"), "rn",
            )
            .orderBy("rn")
            .drop("rn")
        )
    return out
