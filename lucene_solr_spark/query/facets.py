"""SOLR-5894-style high-cardinality faceting (SURVEY §2.4 A1-A3, §3.3).

The fork's signature path, re-expressed Spark-first:

- **Sparse per-segment ordinal counting** (``SparseDocValuesFacets`` /
  ``SparseCounterPool`` in the fork's ``solr/core/src/java/org/apache/
  solr/request/sparse/``): each segment counts facet ordinals over ONLY
  the docs matching the query domain — ``np.unique(ords[hits],
  return_counts=True)`` touches exactly the hit ordinals, never
  allocating or iterating a dense O(#unique-terms) counter. This is the
  vectorized analog of the sparse counter + touched-list.
- **Two-phase distributed merge-and-refine** (``FacetComponent`` /
  ``DistribFieldFacet``): phase 1 takes each segment's top
  ``limit*1.5+10`` candidate ordinals (the reference's over-request
  factor), merges them into a global candidate term set; phase 2
  "refines" by summing each candidate's exact count from every
  segment's partial counts. Only candidate terms and per-segment tops
  cross the shuffle — never the full term cardinality, which is what
  makes the plan survive a 100x scale-up of facet cardinality.

Counting and matching happen in ONE cogrouped ``applyInPandas`` pass
over (postings, docmap) — the hit DocSet never leaves the executor;
what shuffles is ``(seg_id, term_ord, cnt)`` partials (tiny).

Physical plan::

    postings(term ∈ domain terms)  ─┐ cogroup by seg_id
    docmap(doc_ord, <field>_ord)   ─┘ → applyInPandas(sparse count)
      → join dicts(seg_id, term_ord → term)        [facet ord→term lookup]
      → phase 1: Window per seg, rank ≤ 1.5k+10 → candidate terms
      → phase 2: semi-join candidates → groupBy(term).sum(cnt)
      → orderBy(cnt desc, term) limit k
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_solr_spark.query.executor import postings_task_columns
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.scorer import match_segment

PARTIAL_SCHEMA = "seg_id int, term_ord int, cnt long"


@dataclass(frozen=True)
class FacetRequest:
    """facet.field request (``SimpleFacets#getFacetFieldCounts`` params:
    facet.limit / facet.mincount / facet.sort / facet.prefix /
    facet.missing)."""

    field: str  # one of the docvalues-like ordinal fields (role/tool/ftok)
    limit: int = 10
    mincount: int = 1
    #: facet.sort: "count" (count desc, value asc — default) or
    #: "index" (value asc, the ordinal/index order)
    sort: str = "count"
    #: facet.prefix: only values starting with this prefix
    prefix: str | None = None
    #: facet.contains: only values containing this substring
    #: (case-sensitive, like the reference default)
    contains: str | None = None
    #: facet.contains.ignoreCase: case-fold BOTH sides of the
    #: contains test (SimpleFacets' SubstringBytesRefFilter ignoreCase)
    contains_ignore_case: bool = False
    #: facet.matches: only values whose WHOLE value matches this regex
    #: (SimpleFacets' RegexBytesRefFilter — Pattern.matches, not find;
    #: pattern must stay in the Java∩python∩RE2 dialect so all three
    #: engines agree)
    matches: str | None = None
    #: facet.excludeTerms: drop these exact values from the buckets
    #: BEFORE ranking/limit (SimpleFacets' excludeTerms list) — the
    #: negative-membership sibling of prefix/contains
    exclude_terms: tuple[str, ...] = ()
    #: facet.missing: append a NULL-valued row counting domain docs
    #: with no value for the field (ord == -1)
    missing: bool = False
    #: facet.offset: skip the first N buckets of the ranked list
    #: (facet paging); the phase-1 over-request window widens to
    #: offset+limit so refine stays exact through the skipped head
    offset: int = 0
    #: group.facet=true analog (SimpleFacets#getGroupedCounts): count
    #: each GROUP once per bucket instead of each doc. Only the
    #: segment-local block key (conv_id) is supported — conversations
    #: never span segments (hash-partitioned build), so per-segment
    #: distinct-group counts SUM to the exact global distinct count
    #: with no extra shuffle (the same locality block joins rely on).
    group_by: str | None = None


def _overrequest(limit: int) -> int:
    """Phase-1 per-shard over-request: the reference's limit*1.5+10
    (``FacetComponent.DistribFieldFacet``)."""
    return int(limit * 1.5) + 10


def segment_partials(searcher, req: FacetRequest, spec: BooleanSpec | None) -> DataFrame:
    """Per-segment sparse ordinal counts: (seg_id, term_ord, cnt).

    No docmap shuffle: each counting task reads its OWN segment's
    ordinal column straight from the segment Parquet (the per-segment
    docvalues access of ``DocValuesFacets#getCounts``). With a query
    domain, only the term-pruned postings rows shuffle; with a
    MatchAllDocs domain, only a seg_id list does.
    """
    ord_col = f"{req.field}_ord"
    seg_dirs = searcher.seg_dir_by_id
    want_missing = req.missing
    has_deletes = bool(searcher.deleted_keys)  # drives column reads
    deleted_bc = searcher._deleted_bc  # broadcast mask (None = no-op)
    if req.group_by not in (None, "conv_id"):
        # only the segment-local block key sums correctly (see
        # FacetRequest.group_by); anything else would need a global
        # distinct shuffle — refuse rather than silently overcount.
        raise ValueError(f"group_by={req.group_by!r}: only conv_id is "
                         "segment-local")
    grouped = req.group_by is not None

    def _count_ords(
        seg_id: int,
        hits: np.ndarray | None,
        ords: np.ndarray,
        groups: np.ndarray | None = None,
    ) -> pd.DataFrame:
        if hits is not None:
            ords = ords[hits]
            if groups is not None:
                groups = groups[hits]
        neg = ords < 0
        if groups is None:
            n_missing = int(neg.sum())
            uniq, cnt = np.unique(ords[~neg], return_counts=True)  # sparse
        else:
            # group.facet: one count per DISTINCT (ord, group) pair —
            # factorize group ids once, dedupe composite keys, count
            # per ord. Segment-local groups make the cross-segment sum
            # exact (FacetRequest.group_by).
            codes = pd.factorize(groups)[0].astype(np.int64)
            n_missing = int(len(np.unique(codes[neg]))) if neg.any() else 0
            vals, gcodes = ords[~neg].astype(np.int64), codes[~neg]
            if len(vals):
                stride = int(codes.max()) + 1
                uk = np.unique(vals * stride + gcodes)
                uniq, cnt = np.unique(uk // stride, return_counts=True)
            else:
                uniq = np.empty(0, np.int64)
                cnt = np.empty(0, np.int64)
        if want_missing and n_missing:
            # facet.missing: one extra partial per segment, ord -1
            uniq = np.append(uniq, -1)
            cnt = np.append(cnt, n_missing)
        return pd.DataFrame(
            {
                "seg_id": np.full(len(uniq), seg_id, np.int32),
                "term_ord": uniq.astype(np.int32),
                "cnt": cnt.astype(np.int64),
            }
        )

    if spec is None:
        seg_df = searcher.seg_driver()

        def count_all(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.executor import apply_deletes

            seg_id = int(pdf["seg_id"].iloc[0])
            cols = [ord_col] + (["conv_id", "turn_idx"] if has_deletes else [])
            if grouped and "conv_id" not in cols:
                cols.append("conv_id")
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=cols
            ).to_pandas()
            ords = dm[ord_col].to_numpy().astype(np.int64)
            live = apply_deletes(None, dm, deleted_bc.value if deleted_bc else None)
            hits = None if live is None else np.flatnonzero(live)
            groups = dm["conv_id"].to_numpy() if grouped else None
            return _count_ords(seg_id, hits, ords, groups)

        return seg_df.groupBy("seg_id").applyInPandas(count_all, PARTIAL_SCHEMA)

    ds_bc = searcher._docset_cached_bc(spec)
    if ds_bc is not None:
        # queryResultCache hit (see IndexSearcher.cache_docset): the
        # domain's per-segment hit bitsets are already broadcast, so
        # the sparse pass skips match_segment, the postings read AND
        # the fq docvalues columns — each task unpacks its bits and
        # bincounts the ord column (liveDocs baked into the bits)
        seg_df = searcher.seg_driver()

        def count_cached(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            bits, n = ds_bc.get(seg_id)
            hits = np.flatnonzero(np.unpackbits(
                np.frombuffer(bits, np.uint8), count=n
            ))
            cols = [ord_col] + (["conv_id"] if grouped else [])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=cols
            ).to_pandas()
            groups = dm["conv_id"].to_numpy() if grouped else None
            return _count_ords(
                seg_id, hits, dm[ord_col].to_numpy().astype(np.int64),
                groups,
            )

        return seg_df.groupBy("seg_id").applyInPandas(
            count_cached, PARTIAL_SCHEMA
        )

    from lucene_solr_spark.query.executor import apply_deletes, filter_cols, filter_mask

    lookup = list(spec.lookup_terms)
    pure_negative = not spec.scoring_terms
    dm_cols = filter_cols(spec, ["doc_ord", "doc_len", ord_col])
    if has_deletes:
        dm_cols += [c for c in ("conv_id", "turn_idx") if c not in dm_cols]
    if grouped and "conv_id" not in dm_cols:
        dm_cols.append("conv_id")

    def count_hits(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        seg_id = int(pdf["seg_id"].iloc[0])
        dm = pq.read_table(
            f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
        ).to_pandas()  # written sorted by doc_ord
        n_docs = len(dm)
        allowed = apply_deletes(
            filter_mask(dm, spec), dm, deleted_bc.value if deleted_bc else None
        )
        if pure_negative:
            term_rows = {}
            if lookup:
                post_tbl = pq.read_table(
                    f"{seg_dirs[seg_id]}/postings.parquet",
                    filters=[("term", "in", lookup)],
                    columns=postings_task_columns(spec),
                ).to_pandas()
                term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
        else:
            term_rows = {r["term"]: r for _, r in pdf.iterrows()}
        max_dl = int(dm["doc_len"].max()) if n_docs else 0
        hits = match_segment(spec, term_rows, n_docs, allowed, max_dl)
        groups = dm["conv_id"].to_numpy() if grouped else None
        return _count_ords(
            seg_id, hits, dm[ord_col].to_numpy(np.int64), groups
        )

    # pure-negative / filter-only domains must visit EVERY segment
    # (term-pruned postings would silently drop term-free segments);
    # the seg-id driver guarantees that, tasks read their own postings.
    driver = (
        searcher.seg_driver() if pure_negative
        else searcher.postings().filter(F.col("term").isin(lookup))
    )
    return driver.groupBy("seg_id").applyInPandas(count_hits, PARTIAL_SCHEMA)


def _with_terms(searcher, partials: DataFrame, field: str) -> DataFrame:
    """Ordinal→term lookup (``lookupOrd``): join per-segment dicts."""
    dicts = searcher.dicts().filter(F.col("field") == field).select(
        "seg_id", "term_ord", "term"
    )
    return partials.join(dicts, ["seg_id", "term_ord"], "inner")


_METRIC_KINDS = (
    "sum", "avg", "min", "max",          # SumAgg / AvgAgg / MinMaxAgg
    "sumsq", "stddev", "variance",       # SumsqAgg / StddevAgg / VarianceAgg
    "missing", "countvals",              # MissingAgg / CountValsAgg
    "unique",                            # UniqueAgg (exact, dict-bounded)
)
#: kinds whose column must be numeric (read as float64; NULL-aware —
#: missing values are EXCLUDED from the aggregate, the Solr contract)
_NUM_KINDS = ("sum", "avg", "min", "max", "sumsq", "stddev", "variance")
#: separator for per-segment UniqueAgg value sets (never appears in
#: docvalues strings)
_USEP = "\x1f"


def facet_metrics(
    searcher,
    field: str,
    metric: str = "doc_len",
    spec: BooleanSpec | None = None,
    limit: int = 10,
    sort: str = "count",
    aggs: tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """JSON-Facet bucket METRICS through the index engine (FacetModule
    SumAgg/AvgAgg/MinMaxAgg riding the terms facet): per bucket of
    ``field``, count + any number of sum/avg/min/max sub-aggregates
    over numeric docvalues columns of the query domain — computed
    inside the SAME per-segment sparse pass as the counts (np.unique
    inverse + weighted bincount / ufunc.at over hit ordinals only),
    merged as algebraic partials (Σcnt, Σsum → avg; per-segment
    min/max → global min/max). Only (seg_id, term_ord, cnt, partials)
    rows ever shuffle — one narrow row per (segment, bucket).

    ``aggs`` is a tuple of (kind, column) with kind ∈ sum|avg|min|max|
    sumsq|stddev|variance|missing|countvals|unique; the legacy
    single-metric form (``metric=col``) means ``aggs=(("avg", col),)``.
    Output columns are Solr-keyed ``<kind>_<col>`` (floats rounded 4dp
    — the pinned cross-engine rule; missing/countvals/unique are
    longs). ``sort`` is "count", an output column name (ranked desc on
    the round), or the legacy "metric" (the first agg's column).

    NULL semantics match Solr's FacetModule: missing values are
    EXCLUDED from every numeric aggregate (avg/stddev/variance divide
    by the non-missing count), ``missing`` counts them, ``countvals``
    counts the rest. ``stddev``/``variance`` are the SAMPLE (n-1)
    estimators, 0.0 when fewer than 2 values (AggUtil.stdDev).
    ``unique`` is EXACT via per-segment value SETS (UniqueAgg's
    per-shard set exchange) — right for dict-bounded docvalues fields;
    a high-cardinality column should use the hll/approx path instead
    (q_json_facet_approx).

    ref: solr/core/src/java/org/apache/solr/search/facet/SumAgg.java,
         AvgAgg.java, MinMaxAgg.java, SumsqAgg.java, StddevAgg.java,
         VarianceAgg.java, MissingAgg.java, CountValsAgg.java,
         UniqueAgg.java, FacetFieldProcessor (metrics-per-bucket).
    """
    if aggs is None:
        aggs = (("avg", metric),)
    for kind, _col in aggs:
        if kind not in _METRIC_KINDS:
            raise ValueError(f"unknown facet metric kind: {kind!r}")
    #: per-segment partial columns needed: Σx per sum/avg/stddev/
    #: variance column, Σx² per sumsq/stddev/variance column, one
    #: min/max per respective column, non-null + null counts where
    #: the kind needs them, one packed value set per unique column
    sum_cols = tuple(dict.fromkeys(
        c for k, c in aggs
        if k in ("sum", "avg", "stddev", "variance")))
    sq_cols = tuple(dict.fromkeys(
        c for k, c in aggs if k in ("sumsq", "stddev", "variance")))
    min_cols = tuple(dict.fromkeys(c for k, c in aggs if k == "min"))
    max_cols = tuple(dict.fromkeys(c for k, c in aggs if k == "max"))
    nv_cols = tuple(dict.fromkeys(
        c for k, c in aggs
        if k in ("avg", "stddev", "variance", "countvals")))
    ms_cols = tuple(dict.fromkeys(c for k, c in aggs if k == "missing"))
    uq_cols = tuple(dict.fromkeys(c for k, c in aggs if k == "unique"))
    num_cols = tuple(dict.fromkeys(
        c for k, c in aggs if k in _NUM_KINDS))
    metric_cols = tuple(dict.fromkeys(c for _, c in aggs))
    partial_cols = (
        [(f"s_{c}", "double") for c in sum_cols]
        + [(f"ss_{c}", "double") for c in sq_cols]
        + [(f"mn_{c}", "double") for c in min_cols]
        + [(f"mx_{c}", "double") for c in max_cols]
        + [(f"nv_{c}", "long") for c in nv_cols]
        + [(f"ms_{c}", "long") for c in ms_cols]
        + [(f"u_{c}", "string") for c in uq_cols]
    )
    partial_schema = "seg_id int, term_ord int, cnt long, " + ", ".join(
        f"{p} {t}" for p, t in partial_cols
    )
    ord_col = f"{field}_ord"
    seg_dirs = searcher.seg_dir_by_id
    deleted_bc = searcher._deleted_bc
    has_deletes = bool(searcher.deleted_keys)

    from lucene_solr_spark.query.executor import (
        apply_deletes,
        filter_cols,
        filter_mask,
    )

    if spec is not None and spec.needs_rewrite:
        spec = searcher.rewrite(spec)
    ds_bc = searcher._docset_cached_bc(spec) if spec is not None else None
    lookup = list(spec.lookup_terms) if spec is not None else []
    pure_negative = spec is not None and not spec.scoring_terms
    base_cols = ["doc_ord", "doc_len", ord_col]
    base_cols += [c for c in metric_cols if c not in base_cols]
    if ds_bc is not None:
        # queryResultCache hit: the hit bits replace match_segment —
        # only the ord and metric columns are ever read
        dm_cols = list(dict.fromkeys([ord_col, *metric_cols]))
    else:
        dm_cols = (
            filter_cols(spec, base_cols) if spec is not None
            else list(base_cols)
        )
        if has_deletes:
            dm_cols += [
                c for c in ("conv_id", "turn_idx") if c not in dm_cols
            ]

    def run_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        seg_id = int(pdf["seg_id"].iloc[0])
        dm = pq.read_table(
            f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
        ).to_pandas()
        n_docs = len(dm)
        ords = dm[ord_col].to_numpy(np.int64)
        # numeric kinds read float64 (nulls → NaN, masked out below);
        # missing/countvals/unique read the raw values + a null mask
        vals = {c: dm[c].to_numpy(np.float64) for c in num_cols}
        nulls = {c: dm[c].isna().to_numpy() for c in metric_cols}
        objs = {c: dm[c].to_numpy(object) for c in uq_cols}
        if ds_bc is not None:
            bits, n = ds_bc.get(seg_id)
            hits = np.flatnonzero(np.unpackbits(
                np.frombuffer(bits, np.uint8), count=n
            ))
        elif spec is None:
            live = apply_deletes(
                None, dm, deleted_bc.value if deleted_bc else None
            )
            hits = None if live is None else np.flatnonzero(live)
        else:
            allowed = apply_deletes(
                filter_mask(dm, spec),
                dm,
                deleted_bc.value if deleted_bc else None,
            )
            if pure_negative:
                term_rows = {}
                if lookup:
                    post_tbl = pq.read_table(
                        f"{seg_dirs[seg_id]}/postings.parquet",
                        filters=[("term", "in", lookup)],
                        columns=postings_task_columns(spec),
                    ).to_pandas()
                    term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
            else:
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            max_dl = int(dm["doc_len"].max()) if n_docs else 0
            hits = match_segment(spec, term_rows, n_docs, allowed, max_dl)
        if hits is not None:
            ords = ords[hits]
            vals = {c: v[hits] for c, v in vals.items()}
            nulls = {c: v[hits] for c, v in nulls.items()}
            objs = {c: v[hits] for c, v in objs.items()}
        else:
            nulls, objs = dict(nulls), dict(objs)
        keep = ords >= 0
        ords = ords[keep]
        vals = {c: v[keep] for c, v in vals.items()}
        nulls = {c: v[keep] for c, v in nulls.items()}
        objs = {c: v[keep] for c, v in objs.items()}
        uniq, inv = np.unique(ords, return_inverse=True)
        data = {
            "seg_id": np.full(len(uniq), seg_id, np.int32),
            "term_ord": uniq.astype(np.int32),
            "cnt": np.bincount(inv).astype(np.int64),
        }
        nb = len(uniq)

        def _clean(c, fill):
            # null-excluding numeric view (Solr aggs skip missing vals)
            return np.where(nulls[c], fill, np.nan_to_num(vals[c]))

        for c in sum_cols:
            data[f"s_{c}"] = np.bincount(
                inv, weights=_clean(c, 0.0), minlength=nb)
        for c in sq_cols:
            v = _clean(c, 0.0)
            data[f"ss_{c}"] = np.bincount(inv, weights=v * v, minlength=nb)
        for c in min_cols:
            arr = np.full(nb, np.inf)
            np.minimum.at(arr, inv, _clean(c, np.inf))
            data[f"mn_{c}"] = arr
        for c in max_cols:
            arr = np.full(nb, -np.inf)
            np.maximum.at(arr, inv, _clean(c, -np.inf))
            data[f"mx_{c}"] = arr
        for c in nv_cols:
            data[f"nv_{c}"] = np.bincount(
                inv, weights=~nulls[c], minlength=nb).astype(np.int64)
        for c in ms_cols:
            data[f"ms_{c}"] = np.bincount(
                inv, weights=nulls[c], minlength=nb).astype(np.int64)
        for c in uq_cols:
            # UniqueAgg per-shard value SET, packed one string per
            # bucket (dict-bounded docvalues cardinality)
            sets = [set() for _ in range(nb)]
            nn = ~nulls[c]
            for i, v in zip(inv[nn], objs[c][nn]):
                sets[i].add(str(v))
            data[f"u_{c}"] = [_USEP.join(sorted(s)) for s in sets]
        return pd.DataFrame(data)

    if spec is None or pure_negative or ds_bc is not None:
        driver = searcher.seg_driver()
    else:
        driver = searcher.postings().filter(F.col("term").isin(lookup))
    partials = driver.groupBy("seg_id").applyInPandas(
        run_seg, partial_schema
    )
    parts = _with_terms(searcher, partials, field)
    merge_aggs = [F.sum("cnt").alias("cnt")]
    merge_aggs += [F.sum(f"s_{c}").alias(f"s_{c}") for c in sum_cols]
    merge_aggs += [F.sum(f"ss_{c}").alias(f"ss_{c}") for c in sq_cols]
    merge_aggs += [F.min(f"mn_{c}").alias(f"mn_{c}") for c in min_cols]
    merge_aggs += [F.max(f"mx_{c}").alias(f"mx_{c}") for c in max_cols]
    merge_aggs += [F.sum(f"nv_{c}").alias(f"nv_{c}") for c in nv_cols]
    merge_aggs += [F.sum(f"ms_{c}").alias(f"ms_{c}") for c in ms_cols]
    # UniqueAgg merge: union of the per-segment value sets
    merge_aggs += [
        F.collect_list(f"u_{c}").alias(f"ul_{c}") for c in uq_cols
    ]
    out_cols = [F.col("term").alias("facet_value"), F.col("cnt")]

    def _var(c):
        # sample variance from algebraic partials (Σx, Σx², n);
        # 0.0 below 2 values — the AggUtil.stdDev contract
        n, s, ss = F.col(f"nv_{c}"), F.col(f"s_{c}"), F.col(f"ss_{c}")
        return F.when(
            n > 1, (ss - s * s / n) / (n - 1)
        ).otherwise(F.lit(0.0))

    for kind, c in aggs:
        if kind == "unique":
            merged = F.array_distinct(F.filter(
                F.flatten(F.transform(
                    F.col(f"ul_{c}"), lambda x: F.split(x, _USEP)
                )),
                lambda v: v != F.lit(""),
            ))
            out_cols.append(
                F.size(merged).cast("long").alias(f"unique_{c}"))
            continue
        if kind in ("missing", "countvals"):
            src = F.col(f"ms_{c}" if kind == "missing" else f"nv_{c}")
            out_cols.append(src.cast("long").alias(f"{kind}_{c}"))
            continue
        src = {
            "sum": F.col(f"s_{c}"),
            "avg": F.when(
                F.col(f"nv_{c}") > 0,
                F.col(f"s_{c}") / F.col(f"nv_{c}")),
            "min": F.col(f"mn_{c}"),
            "max": F.col(f"mx_{c}"),
            "sumsq": F.col(f"ss_{c}"),
            "variance": _var(c),
            "stddev": F.sqrt(_var(c)),
        }[kind]
        out_cols.append(F.round(src, 4).alias(f"{kind}_{c}"))
    out = parts.groupBy("term").agg(*merge_aggs).select(*out_cols)
    # JSON Facet `sort` by a bucket metric (FacetFieldProcessor
    # sortVariable): rank on the ROUNDED value so the limit boundary
    # is engine-independent, facet_value tiebreak. "metric" is the
    # legacy spelling of the first agg's output column.
    sort_col = (
        f"{aggs[0][0]}_{aggs[0][1]}" if sort == "metric" else sort
    )
    if sort_col != "count" and sort_col not in out.columns:
        raise ValueError(f"unknown facet sort column: {sort!r}")
    order = (
        [F.desc(sort_col), F.asc("facet_value")]
        if sort_col != "count"
        else [F.desc("cnt"), F.asc("facet_value")]
    )
    return out.orderBy(*order).limit(limit)


def facet_pivot(
    searcher,
    f1: str,
    f2: str,
    spec: BooleanSpec | None = None,
    limit1: int = 3,
    limit2: int = 2,
) -> DataFrame:
    """Hierarchical pivot facet over the index docvalues
    (``PivotFacetProcessor``): top `limit1` values of f1 by count,
    within each the top `limit2` values of f2.

    Per-segment sparse PAIR counting: one ``np.unique`` over the
    packed (ord1, ord2) key of hit docs — only touched pairs leave the
    executor, so shuffle width is bounded by distinct co-occurring
    pairs, not field-cardinality product. Rows with either value
    missing (ord -1) are excluded, Lucene missing semantics."""
    o1, o2 = f"{f1}_ord", f"{f2}_ord"
    seg_dirs = searcher.seg_dir_by_id
    has_deletes = bool(searcher.deleted_keys)
    deleted_bc = searcher._deleted_bc
    pair_schema = "seg_id int, ord1 int, ord2 int, cnt long"

    def count_pairs(seg_id: int, hits: np.ndarray | None,
                    a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
        if hits is not None:
            a, b = a[hits], b[hits]
        m = (a >= 0) & (b >= 0)
        key = a[m].astype(np.int64) * (1 << 31) + b[m]
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "seg_id": np.full(len(uniq), seg_id, np.int32),
            "ord1": (uniq >> 31).astype(np.int32),
            "ord2": (uniq & ((1 << 31) - 1)).astype(np.int32),
            "cnt": cnt.astype(np.int64),
        })

    if spec is None:
        seg_df = searcher.seg_driver()

        def run_all(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.executor import apply_deletes

            seg_id = int(pdf["seg_id"].iloc[0])
            cols = [o1, o2] + (["conv_id", "turn_idx"] if has_deletes else [])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=cols
            ).to_pandas()
            live = apply_deletes(None, dm, deleted_bc.value if deleted_bc else None)
            hits = None if live is None else np.flatnonzero(live)
            return count_pairs(
                seg_id, hits,
                dm[o1].to_numpy().astype(np.int64),
                dm[o2].to_numpy().astype(np.int64),
            )

        pairs = seg_df.groupBy("seg_id").applyInPandas(run_all, pair_schema)
    elif (ds_bc := searcher._docset_cached_bc(spec)) is not None:
        # queryResultCache hit: the broadcast hit bits replace
        # match_segment — only the two ord columns are read
        def run_cached(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            bits, n = ds_bc.get(seg_id)
            hits = np.flatnonzero(np.unpackbits(
                np.frombuffer(bits, np.uint8), count=n
            ))
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=[o1, o2]
            ).to_pandas()
            return count_pairs(
                seg_id, hits,
                dm[o1].to_numpy(np.int64), dm[o2].to_numpy(np.int64),
            )

        pairs = searcher.seg_driver().groupBy("seg_id").applyInPandas(
            run_cached, pair_schema
        )
    else:
        from lucene_solr_spark.query.executor import apply_deletes, filter_cols, filter_mask

        lookup = list(spec.lookup_terms)
        pure_negative = not spec.scoring_terms
        dm_cols = filter_cols(spec, ["doc_ord", "doc_len", o1, o2])
        if has_deletes:
            dm_cols += [c for c in ("conv_id", "turn_idx") if c not in dm_cols]

        def run_hits(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(  # fq domain
                filter_mask(dm, spec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            if pure_negative:
                term_rows = {}
                if lookup:
                    post_tbl = pq.read_table(
                        f"{seg_dirs[seg_id]}/postings.parquet",
                        filters=[("term", "in", lookup)],
                        columns=postings_task_columns(spec),
                    ).to_pandas()
                    term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
            else:
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            hits = match_segment(
                spec, term_rows, len(dm), allowed,
                int(dm["doc_len"].max()) if len(dm) else 0,
            )
            return count_pairs(
                seg_id, hits,
                dm[o1].to_numpy(np.int64), dm[o2].to_numpy(np.int64),
            )

        driver = (
            searcher.seg_driver() if pure_negative
            else searcher.postings().filter(F.col("term").isin(lookup))
        )
        pairs = driver.groupBy("seg_id").applyInPandas(run_hits, pair_schema)

    d1 = searcher.dicts().filter(F.col("field") == f1).select(
        "seg_id", F.col("term_ord").alias("ord1"), F.col("term").alias("v1")
    )
    d2 = searcher.dicts().filter(F.col("field") == f2).select(
        "seg_id", F.col("term_ord").alias("ord2"), F.col("term").alias("v2")
    )
    named = (
        pairs.join(d1, ["seg_id", "ord1"]).join(d2, ["seg_id", "ord2"])
        .groupBy("v1", "v2").agg(F.sum("cnt").alias("cnt"))
    )
    top1 = (
        named.groupBy("v1").agg(F.sum("cnt").alias("t1"))
        .orderBy(F.desc("t1"), "v1").limit(limit1)
    )
    w = Window.partitionBy("v1").orderBy(F.desc("cnt"), F.asc("v2"))
    return (
        named.join(F.broadcast(top1), "v1")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= limit2)
        .select("v1", "v2", "cnt", "t1")
        .orderBy(F.desc("t1"), "v1", F.desc("cnt"), "v2")
        .drop("t1")
    )


def facet_pivot3(
    searcher,
    f1: str,
    f2: str,
    f3: str,
    spec: BooleanSpec | None = None,
    limit1: int = 3,
    limit2: int = 2,
    limit3: int = 2,
) -> DataFrame:
    """Three-level pivot facet (``facet.pivot=f1,f2,f3`` —
    PivotFacetProcessor recursion depth 3): top `limit1` values of f1
    by count, within each the top `limit2` of f2, within each the top
    `limit3` of f3.

    Same sparse shape as :func:`facet_pivot`, one level deeper: ONE
    ``np.unique`` per segment over the packed (ord1, ord2, ord3)
    int64 key (21 bits per ordinal — ords are docvalues-dictionary
    indices, far below 2^21 for any facetable field) — shuffle width
    stays bounded by distinct co-occurring TRIPLES, never the
    cardinality product; docs missing any of the three values are
    excluded (Lucene missing semantics, matching the 2-level pivot).

    ref: solr/core/src/java/org/apache/solr/handler/component/
    PivotFacetProcessor.java (doPivots recursion)."""
    o1, o2, o3 = f"{f1}_ord", f"{f2}_ord", f"{f3}_ord"
    seg_dirs = searcher.seg_dir_by_id
    has_deletes = bool(searcher.deleted_keys)
    deleted_bc = searcher._deleted_bc
    triple_schema = "seg_id int, ord1 int, ord2 int, ord3 int, cnt long"
    _B21 = (1 << 21) - 1

    def count_triples(seg_id: int, hits: np.ndarray | None,
                      a: np.ndarray, b: np.ndarray,
                      c: np.ndarray) -> pd.DataFrame:
        if hits is not None:
            a, b, c = a[hits], b[hits], c[hits]
        m = (a >= 0) & (b >= 0) & (c >= 0)
        key = ((a[m].astype(np.int64) << 42)
               | (b[m].astype(np.int64) << 21) | c[m])
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "seg_id": np.full(len(uniq), seg_id, np.int32),
            "ord1": (uniq >> 42).astype(np.int32),
            "ord2": ((uniq >> 21) & _B21).astype(np.int32),
            "ord3": (uniq & _B21).astype(np.int32),
            "cnt": cnt.astype(np.int64),
        })

    if spec is None:
        def run_all(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            from lucene_solr_spark.query.executor import apply_deletes

            seg_id = int(pdf["seg_id"].iloc[0])
            cols = [o1, o2, o3] + (
                ["conv_id", "turn_idx"] if has_deletes else [])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=cols
            ).to_pandas()
            live = apply_deletes(
                None, dm, deleted_bc.value if deleted_bc else None)
            hits = None if live is None else np.flatnonzero(live)
            return count_triples(
                seg_id, hits,
                dm[o1].to_numpy(np.int64), dm[o2].to_numpy(np.int64),
                dm[o3].to_numpy(np.int64),
            )

        triples = searcher.seg_driver().groupBy("seg_id").applyInPandas(
            run_all, triple_schema)
    else:
        from lucene_solr_spark.query.executor import (
            apply_deletes, filter_cols, filter_mask,
        )

        lookup = list(spec.lookup_terms)
        pure_negative = not spec.scoring_terms
        dm_cols = filter_cols(spec, ["doc_ord", "doc_len", o1, o2, o3])
        if has_deletes:
            dm_cols += [c for c in ("conv_id", "turn_idx")
                        if c not in dm_cols]

        def run_hits(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, spec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            if pure_negative:
                term_rows = {}
                if lookup:
                    post_tbl = pq.read_table(
                        f"{seg_dirs[seg_id]}/postings.parquet",
                        filters=[("term", "in", lookup)],
                        columns=postings_task_columns(spec),
                    ).to_pandas()
                    term_rows = {
                        r["term"]: r for _, r in post_tbl.iterrows()}
            else:
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            hits = match_segment(
                spec, term_rows, len(dm), allowed,
                int(dm["doc_len"].max()) if len(dm) else 0,
            )
            return count_triples(
                seg_id, hits,
                dm[o1].to_numpy(np.int64), dm[o2].to_numpy(np.int64),
                dm[o3].to_numpy(np.int64),
            )

        driver = (
            searcher.seg_driver() if pure_negative
            else searcher.postings().filter(F.col("term").isin(lookup))
        )
        triples = driver.groupBy("seg_id").applyInPandas(
            run_hits, triple_schema)

    dicts = searcher.dicts()
    named = triples
    for n, fld in ((1, f1), (2, f2), (3, f3)):
        d = dicts.filter(F.col("field") == fld).select(
            "seg_id", F.col("term_ord").alias(f"ord{n}"),
            F.col("term").alias(f"v{n}"),
        )
        named = named.join(d, ["seg_id", f"ord{n}"])
    named = named.groupBy("v1", "v2", "v3").agg(F.sum("cnt").alias("cnt"))
    top1 = (
        named.groupBy("v1").agg(F.sum("cnt").alias("t1"))
        .orderBy(F.desc("t1"), "v1").limit(limit1)
    )
    # level-2 pick WITHIN the surviving v1 buckets (PivotFacet's
    # per-parent recursion): totals per (v1, v2), top limit2 each
    lvl2 = (
        named.join(F.broadcast(top1), "v1")
        .groupBy("v1", "v2").agg(F.sum("cnt").alias("t2"))
    )
    w2 = Window.partitionBy("v1").orderBy(F.desc("t2"), F.asc("v2"))
    top2 = (
        lvl2.withColumn("rk2", F.row_number().over(w2))
        .filter(F.col("rk2") <= limit2)
        .select("v1", "v2", "t2")
    )
    w3 = Window.partitionBy("v1", "v2").orderBy(F.desc("cnt"), F.asc("v3"))
    return (
        named.join(F.broadcast(top2), ["v1", "v2"])
        .withColumn("rk3", F.row_number().over(w3))
        .filter(F.col("rk3") <= limit3)
        .orderBy("v1", F.desc("t2"), "v2", F.desc("cnt"), "v3")
        .select("v1", "v2", "v3", "cnt")
    )


def facet_nested(
    searcher,
    f1: str,
    f2: str,
    spec: BooleanSpec | None = None,
    limit1: int = 3,
    limit2: int = 2,
) -> DataFrame:
    """One level of JSON-Facet sub-faceting with metrics
    (``solr/core/src/java/org/apache/solr/search/facet/FacetModule.java``
    nested-bucket shape): top `limit1` f1 buckets by domain count,
    inside each the top `limit2` f2 sub-buckets, each sub-bucket
    carrying count + avg(doc_len) (an ``AggValueSource`` metric riding
    the same partial rows).

    Physical: per-segment sparse (ord1, ord2) pair counting like
    :func:`facet_pivot`, but (a) docs missing f2 still count toward
    their f1 bucket (ord2 = -1 partials survive, Lucene bucket-count
    semantics: the sub-facet only narrows its own sub-domain), and
    (b) each partial carries Σ doc_len so any algebraic metric merges
    associatively — only touched (pair, cnt, sum) rows shuffle."""
    o1, o2 = f"{f1}_ord", f"{f2}_ord"
    seg_dirs = searcher.seg_dir_by_id
    pair_schema = "seg_id int, ord1 int, ord2 int, cnt long, sum_dl long"

    def count_pairs(seg_id: int, hits: np.ndarray | None,
                    a: np.ndarray, b: np.ndarray, dl: np.ndarray) -> pd.DataFrame:
        if hits is not None:
            a, b, dl = a[hits], b[hits], dl[hits]
        m = a >= 0  # keep ord2 == -1: counts toward the parent bucket
        a, b, dl = a[m], b[m], dl[m]
        key = a.astype(np.int64) * (1 << 31) + (b + 1)  # -1 → 0
        order = np.argsort(key, kind="stable")
        key_s, dl_s = key[order], dl[order]
        starts = (
            np.nonzero(np.diff(key_s, prepend=key_s[0] - 1))[0]
            if len(key_s) else np.empty(0, np.int64)
        )
        uniq = key_s[starts]
        cnt = np.diff(np.append(starts, len(key_s)))
        sums = (
            np.add.reduceat(dl_s, starts) if len(key_s)
            else np.empty(0, np.int64)
        )
        return pd.DataFrame({
            "seg_id": np.full(len(uniq), seg_id, np.int32),
            "ord1": (uniq >> 31).astype(np.int32),
            "ord2": ((uniq & ((1 << 31) - 1)) - 1).astype(np.int32),
            "cnt": cnt.astype(np.int64),
            "sum_dl": sums.astype(np.int64),
        })

    from lucene_solr_spark.query.executor import apply_deletes, filter_cols, filter_mask

    dm_base = ["doc_ord", "doc_len", o1, o2]
    has_deletes = bool(searcher.deleted_keys)
    deleted_bc = searcher._deleted_bc

    if spec is None:
        seg_df = searcher.seg_driver()

        def run_all(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            cols = ["doc_len", o1, o2] + (
                ["conv_id", "turn_idx"] if has_deletes else []
            )
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=cols
            ).to_pandas()
            live = apply_deletes(None, dm, deleted_bc.value if deleted_bc else None)
            hits = None if live is None else np.flatnonzero(live)
            return count_pairs(
                seg_id, hits,
                dm[o1].to_numpy().astype(np.int64),
                dm[o2].to_numpy().astype(np.int64),
                dm["doc_len"].to_numpy().astype(np.int64),
            )

        pairs = seg_df.groupBy("seg_id").applyInPandas(run_all, pair_schema)
    elif (ds_bc := searcher._docset_cached_bc(spec)) is not None:
        # queryResultCache hit: bits replace match_segment; only the
        # ord pair + the metric column are read
        def run_cached(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            bits, n = ds_bc.get(seg_id)
            hits = np.flatnonzero(np.unpackbits(
                np.frombuffer(bits, np.uint8), count=n
            ))
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet",
                columns=["doc_len", o1, o2],
            ).to_pandas()
            return count_pairs(
                seg_id, hits,
                dm[o1].to_numpy(np.int64), dm[o2].to_numpy(np.int64),
                dm["doc_len"].to_numpy(np.int64),
            )

        pairs = searcher.seg_driver().groupBy("seg_id").applyInPandas(
            run_cached, pair_schema
        )
    else:
        lookup = list(spec.lookup_terms)
        pure_negative = not spec.scoring_terms
        dm_cols = filter_cols(spec, dm_base)
        if has_deletes:
            dm_cols += [c for c in ("conv_id", "turn_idx") if c not in dm_cols]

        def run_hits(pdf: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as pq

            seg_id = int(pdf["seg_id"].iloc[0])
            dm = pq.read_table(
                f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
            ).to_pandas()
            allowed = apply_deletes(
                filter_mask(dm, spec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            if pure_negative:
                term_rows = {}
                if lookup:
                    post_tbl = pq.read_table(
                        f"{seg_dirs[seg_id]}/postings.parquet",
                        filters=[("term", "in", lookup)],
                        columns=postings_task_columns(spec),
                    ).to_pandas()
                    term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
            else:
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            hits = match_segment(
                spec, term_rows, len(dm), allowed,
                int(dm["doc_len"].max()) if len(dm) else 0,
            )
            return count_pairs(
                seg_id, hits,
                dm[o1].to_numpy(np.int64), dm[o2].to_numpy(np.int64),
                dm["doc_len"].to_numpy(np.int64),
            )

        driver = (
            searcher.seg_driver() if pure_negative
            else searcher.postings().filter(F.col("term").isin(lookup))
        )
        pairs = driver.groupBy("seg_id").applyInPandas(run_hits, pair_schema)

    d1 = searcher.dicts().filter(F.col("field") == f1).select(
        "seg_id", F.col("term_ord").alias("ord1"), F.col("term").alias("v1")
    )
    d2 = searcher.dicts().filter(F.col("field") == f2).select(
        "seg_id", F.col("term_ord").alias("ord2"), F.col("term").alias("v2")
    )
    named = pairs.join(d1, ["seg_id", "ord1"])
    top1 = (
        named.groupBy("v1").agg(F.sum("cnt").alias("cnt1"))
        .orderBy(F.desc("cnt1"), "v1").limit(limit1)
    )
    sub = (
        named.filter(F.col("ord2") >= 0)
        .join(d2, ["seg_id", "ord2"])
        .groupBy("v1", "v2")
        .agg(F.sum("cnt").alias("cnt2"), F.sum("sum_dl").alias("sum_dl"))
    )
    w = Window.partitionBy("v1").orderBy(F.desc("cnt2"), F.asc("v2"))
    return (
        sub.join(F.broadcast(top1), "v1")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= limit2)
        .select(
            "v1", "cnt1", "v2", "cnt2",
            F.round(F.col("sum_dl") / F.col("cnt2"), 4).alias("avg_dl"),
        )
        .orderBy(F.desc("cnt1"), "v1", F.desc("cnt2"), "v2")
    )


def use_refine(searcher, req: FacetRequest, refine: bool, method: str) -> bool:
    """The facet method choice (SimpleFacets' enum/fc heuristic
    analog). refine=False or mincount>1 always means the exact
    single-shuffle path (mincount exactness: ADVICE r2). Under
    method='auto', low-cardinality fields also route exact: when the
    field's whole dictionary fits in HALF the phase-1 over-request
    window, every term is a phase-1 candidate anyway, so the persist +
    per-segment ranking is pure overhead (measured 1.30 s → 0.73 s on
    the role facet at sf0.1). method='refine' forces the two-phase
    path (tests pin refine ≡ exact on every field with it)."""
    if not refine or req.mincount > 1:
        return False
    if method == "refine":
        return True
    return (searcher.field_cardinality(req.field) * 2
            > _overrequest(req.offset + req.limit))


def facet_field(
    searcher,
    req: FacetRequest,
    spec: BooleanSpec | None = None,
    refine: bool = True,
    method: str = "auto",
) -> DataFrame:
    """Distributed facet counts: (facet_value, cnt), top `limit`.

    refine=True runs the reference's two-phase merge-and-refine (A3);
    refine=False is the exact single-shuffle groupBy (the control both
    the tests and the DuckDB oracle compare against). For mincount<=1
    both paths are exact; with mincount>1 phase-1's per-segment
    ranking could let sub-mincount singletons crowd qualifying buckets
    out of the over-request window (ADVICE r2), so mincount>1 requests
    are routed through the exact single-shuffle path.

    facet.sort honors count (default) vs index order — phase-1
    over-request ranks per segment in the SAME order, Solr's refine
    contract; facet.prefix narrows before ranking; facet.missing
    appends a trailing NULL bucket (never subject to limit/sort).
    """
    # MatchAll-domain partials are snapshot-stable → served from the
    # searcher's UnInvertedField-style cache (one tiny persisted
    # (seg_id, term_ord, cnt) frame per field; a new snapshot means a
    # new searcher, so staleness is impossible). Query-domain partials
    # are computed per call as before.
    cached: list[DataFrame] = []  # call-owned persisted frames to free
    cache_key = (
        (req.field, req.group_by, req.missing) if spec is None else None
    )
    raw = searcher._facet_cache.get(cache_key) if cache_key else None
    if raw is None:
        raw = segment_partials(searcher, req, spec)
        if cache_key is not None:
            raw = raw.persist()  # cache-owned: lives with the searcher
            # concurrent serving threads may race the population;
            # setdefault keeps exactly one persisted frame alive
            prior = searcher._facet_cache.setdefault(cache_key, raw)
            if prior is not raw:
                raw.unpersist()
                raw = prior
        elif req.missing:
            raw = raw.persist()  # both the buckets and the miss row
            cached.append(raw)
    # ord -1 (missing) partials have no dictionary row → inner join
    # keeps them out of the term buckets automatically
    parts = _with_terms(searcher, raw, req.field)
    if req.prefix is not None:
        parts = parts.filter(F.col("term").startswith(req.prefix))
    if req.contains is not None:
        if req.contains_ignore_case:
            parts = parts.filter(
                F.lower(F.col("term")).contains(req.contains.lower()))
        else:
            parts = parts.filter(F.col("term").contains(req.contains))
    if req.matches is not None:
        # whole-value match (Pattern.matches): anchor explicitly —
        # Catalyst rlike is a find/substring match
        parts = parts.filter(F.col("term").rlike(f"^(?:{req.matches})$"))
    if req.exclude_terms:
        parts = parts.filter(~F.col("term").isin(*req.exclude_terms))
    rank_order = (
        [F.desc("cnt"), F.asc("term")] if req.sort == "count" else [F.asc("term")]
    )

    refine = use_refine(searcher, req, refine, method)
    if refine:
        # phase 1 (per-segment top ranking) and phase 2 (exact counts
        # for candidates) both consume the partials; persisting them
        # runs the sparse counting pass ONCE instead of twice (~40%
        # off MatchAll high-cardinality facet latency). The cached
        # rows are tiny — (seg_id, term_ord, cnt) partials only.
        parts = parts.persist()
        cached.append(parts)
        over = _overrequest(req.offset + req.limit)
        w = Window.partitionBy("seg_id").orderBy(*rank_order)
        cands = (
            parts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= over)
            .select("term")
            .distinct()
        )
        # Phase 2 refinement: exact counts for candidate terms only.
        refined = parts.join(F.broadcast(cands), "term", "left_semi")
        agg = refined.groupBy("term").agg(F.sum("cnt").alias("cnt"))
    else:
        agg = parts.groupBy("term").agg(F.sum("cnt").alias("cnt"))

    out_order = (
        [F.desc("cnt"), F.asc("facet_value")] if req.sort == "count"
        else [F.asc("facet_value")]
    )
    out = agg.filter(F.col("cnt") >= req.mincount).select(
        F.col("term").alias("facet_value"), "cnt"
    ).orderBy(*out_order)
    if req.offset:
        out = out.offset(req.offset)
    out = out.limit(req.limit)
    if req.missing:
        miss = (
            raw.filter(F.col("term_ord") == -1)
            .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("cnt"))
            .select(F.lit(None).cast("string").alias("facet_value"), "cnt")
        )
        out = out.unionByName(miss)
    if cached:
        # The facet result is bounded (<= limit+1 rows); materialize it
        # now so the persisted partials can be freed immediately — a
        # long-lived serving searcher must not accumulate cached
        # partial frames across facet calls (ADVICE r2).
        rows = out.collect()
        for df in cached:
            df.unpersist()
        out = searcher.spark.createDataFrame(rows, out.schema)
    return out


RELATEDNESS_PARTIAL_SCHEMA = "seg_id int, term_ord int, fg long, bg long"


def facet_relatedness(
    searcher,
    field: str,
    fg_spec: BooleanSpec,
    limit: int = 10,
    min_fg: int = 0,
) -> DataFrame:
    """JSON Facet ``relatedness()`` — the Semantic Knowledge Graph
    aggregate: per bucket of ``field``, how related the bucket is to a
    FOREGROUND query domain vs the BACKGROUND corpus.

    Pinned formula (the fork's z-approximation; both popularities are
    normalized by the BACKGROUND size, which is intentional there)::

        fg_pop      = fg_count / bg_size
        bg_pop      = bg_count / bg_size
        relatedness = (fg_pop - bg_pop) / sqrt(fg_pop + bg_pop)
                      (0.0 when fg_pop + bg_pop == 0)

    The score is bounded in [-1, 1]. Buckets rank by the ROUNDED
    relatedness (engine-independent limit boundary), bucket value
    tiebreak.

    Physical — ONE seg-driver fan-out, like significant_terms: every
    segment task reads its OWN docmap (and only the fg spec's
    term-pruned postings rows via a parquet predicate), computes the
    fg hit DocSet once, then counts bucket ordinals over BOTH domains
    in the same vectorized pass. Only (seg_id, term_ord, fg, bg)
    partials plus one sizes row per segment ever shuffle — bucket
    cardinality bounds the shuffle, never corpus size. The seg driver
    (not the postings groupBy) is load-bearing: segments with zero fg
    matches still contribute background counts.

    ref: solr/core/src/java/org/apache/solr/search/facet/RelatednessAgg.java
         (computeRelatedness; fg/bg set comparison per bucket)
    """
    from lucene_solr_spark.query.executor import (
        apply_deletes,
        filter_cols,
        filter_mask,
    )

    if fg_spec.needs_rewrite:
        fg_spec = searcher.rewrite(fg_spec)
    ord_col = f"{field}_ord"
    seg_dirs = searcher.seg_dir_by_id
    deleted_bc = searcher._deleted_bc
    has_deletes = bool(searcher.deleted_keys)
    lookup = list(fg_spec.lookup_terms)
    dm_cols = filter_cols(fg_spec, ["doc_ord", "doc_len", ord_col])
    if has_deletes:
        dm_cols += [c for c in ("conv_id", "turn_idx") if c not in dm_cols]
    lspec = fg_spec

    def run_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        seg_id = int(pdf["seg_id"].iloc[0])
        dm = pq.read_table(
            f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
        ).to_pandas()
        n_docs = len(dm)
        ords = dm[ord_col].to_numpy(np.int64)
        live = apply_deletes(None, dm, deleted_bc.value if deleted_bc else None)
        if live is None:
            bg_ords, bg_size = ords, n_docs
        else:
            bg_ords, bg_size = ords[live], int(live.sum())
        allowed = apply_deletes(
            filter_mask(dm, lspec), dm,
            deleted_bc.value if deleted_bc else None,
        )
        term_rows = {}
        if lookup:
            post_tbl = pq.read_table(
                f"{seg_dirs[seg_id]}/postings.parquet",
                filters=[("term", "in", lookup)],
                columns=postings_task_columns(lspec),
            ).to_pandas()
            term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
        max_dl = int(dm["doc_len"].max()) if n_docs else 0
        hits = match_segment(lspec, term_rows, n_docs, allowed, max_dl)
        fg_ords = ords[hits]
        fg_size = int(len(hits))
        # one sparse pass over each domain's touched ordinals
        bg_u, bg_c = np.unique(bg_ords[bg_ords >= 0], return_counts=True)
        fg_u, fg_c = np.unique(fg_ords[fg_ords >= 0], return_counts=True)
        # fg ords ⊆ bg ords (fg hits are masked to the live domain), so
        # one searchsorted scatter aligns the columns — vectorized,
        # never a python loop over bucket cardinality
        fg_col = np.zeros(len(bg_u), np.int64)
        if len(fg_u):
            fg_col[np.searchsorted(bg_u, fg_u)] = fg_c
        # sizes row: term_ord -2 carries (fg_size, bg_size)
        uniq = np.append(bg_u, -2)
        fg_out = np.append(fg_col, fg_size)
        bg_out = np.append(bg_c, bg_size)
        return pd.DataFrame(
            {
                "seg_id": np.full(len(uniq), seg_id, np.int32),
                "term_ord": uniq.astype(np.int32),
                "fg": fg_out.astype(np.int64),
                "bg": bg_out.astype(np.int64),
            }
        )

    partials = searcher.seg_driver().groupBy("seg_id").applyInPandas(
        run_seg, RELATEDNESS_PARTIAL_SCHEMA
    )
    partials = partials.persist()
    sizes = (
        partials.filter(F.col("term_ord") == -2)
        .agg(F.sum("bg").alias("bg_size"))
    )
    named = _with_terms(
        searcher, partials.filter(F.col("term_ord") >= 0), field
    )
    agg = named.groupBy("term").agg(
        F.sum("fg").alias("fg_count"), F.sum("bg").alias("bg_count")
    )
    fg_pop = F.col("fg_count") / F.col("bg_size")
    bg_pop = F.col("bg_count") / F.col("bg_size")
    rel = F.when(
        F.col("fg_count") + F.col("bg_count") == 0, F.lit(0.0)
    ).otherwise((fg_pop - bg_pop) / F.sqrt(fg_pop + bg_pop))
    out = (
        agg.join(F.broadcast(sizes))
        .filter(F.col("fg_count") >= min_fg)
        .select(
            F.col("term").alias("facet_value"),
            "fg_count",
            "bg_count",
            F.round(rel, 4).alias("relatedness"),
        )
        .orderBy(F.desc("relatedness"), F.asc("facet_value"))
        .limit(limit)
    )
    # bounded result (<= limit rows): materialize so the persisted
    # partials free immediately (same discipline as facet_field)
    rows = out.collect()
    partials.unpersist()
    return searcher.spark.createDataFrame(rows, out.schema)


def facet_block_domain(
    searcher,
    field: str,
    spec: BooleanSpec,
    limit: int = 10,
) -> DataFrame:
    """JSON Facet ``domain: {blockChildren: ...}`` widening: facet over
    ALL turns of every conversation that contains a matching turn —
    the child-domain broadening of the block-join domain changes.

    Segment-local exactness: conversations never span segments
    (hash-partitioned build), so each segment task widens its OWN hit
    set to full conv blocks with one vectorized isin — no cross-segment
    conv-id shuffle, no join. Only bucket-count partials leave the
    executor.

    ref: solr/core/src/java/org/apache/solr/search/facet/FacetRequest.java
         (Domain.toChildren / BlockJoinChildQParser domain changes)
    """
    from lucene_solr_spark.query.executor import (
        apply_deletes,
        filter_cols,
        filter_mask,
    )

    if spec.needs_rewrite:
        spec = searcher.rewrite(spec)
    ord_col = f"{field}_ord"
    seg_dirs = searcher.seg_dir_by_id
    deleted_bc = searcher._deleted_bc
    lookup = list(spec.lookup_terms)
    pure_negative = not spec.scoring_terms
    base = ["doc_ord", "doc_len", ord_col, "conv_id"]
    dm_cols = filter_cols(spec, base)
    if "turn_idx" not in dm_cols and bool(searcher.deleted_keys):
        dm_cols.append("turn_idx")
    lspec = spec

    def run_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        seg_id = int(pdf["seg_id"].iloc[0])
        dm = pq.read_table(
            f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
        ).to_pandas()
        n_docs = len(dm)
        allowed = apply_deletes(
            filter_mask(dm, lspec), dm,
            deleted_bc.value if deleted_bc else None,
        )
        if pure_negative:
            term_rows = {}
            if lookup:
                post_tbl = pq.read_table(
                    f"{seg_dirs[seg_id]}/postings.parquet",
                    filters=[("term", "in", lookup)],
                    columns=postings_task_columns(lspec),
                ).to_pandas()
                term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
        else:
            term_rows = {r["term"]: r for _, r in pdf.iterrows()}
        max_dl = int(dm["doc_len"].max()) if n_docs else 0
        hits = match_segment(lspec, term_rows, n_docs, allowed, max_dl)
        convs = dm["conv_id"].to_numpy()
        # widen: every live doc whose conversation contains a hit
        in_block = np.isin(convs, np.unique(convs[hits]))
        live = apply_deletes(None, dm, deleted_bc.value if deleted_bc else None)
        if live is not None:
            in_block &= live
        ords = dm[ord_col].to_numpy(np.int64)[in_block]
        uniq, cnt = np.unique(ords[ords >= 0], return_counts=True)
        return pd.DataFrame(
            {
                "seg_id": np.full(len(uniq), seg_id, np.int32),
                "term_ord": uniq.astype(np.int32),
                "cnt": cnt.astype(np.int64),
            }
        )

    driver = (
        searcher.seg_driver() if pure_negative
        else searcher.postings().filter(F.col("term").isin(lookup))
    )
    partials = driver.groupBy("seg_id").applyInPandas(
        run_seg, PARTIAL_SCHEMA
    )
    named = _with_terms(searcher, partials, field)
    return (
        named.groupBy("term")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.col("term").alias("facet_value"), "cnt")
        .orderBy(F.desc("cnt"), F.asc("facet_value"))
        .limit(limit)
    )


UNIQUE_BLOCK_PARTIAL_SCHEMA = "seg_id int, term_ord int, cnt long, uniq long"


def facet_unique_block(
    searcher,
    field: str,
    spec: BooleanSpec | None = None,
    limit: int = 10,
) -> DataFrame:
    """JSON Facet ``uniqueBlock(_root_)`` — child-domain buckets each
    carrying the number of DISTINCT PARENT blocks (conversations)
    alongside the child doc count.

    Exactness without a distinct shuffle: conversations never span
    segments (hash-partitioned build), so per-segment distinct-conv
    counts SUM to the exact global distinct — the same block locality
    `q_idx_grouped_facet` and the conv block joins rely on. Each
    segment's pass counts docs AND unique conv blocks per bucket
    ordinal in one vectorized composite-key np.unique; only
    (seg_id, term_ord, cnt, uniq) rows shuffle.

    ref: solr/core/src/java/org/apache/solr/search/facet/UniqueBlockAgg.java
         (unique parent counting riding the child-domain terms facet)
    """
    from lucene_solr_spark.query.executor import (
        apply_deletes,
        filter_cols,
        filter_mask,
    )

    if spec is not None and spec.needs_rewrite:
        spec = searcher.rewrite(spec)
    ord_col = f"{field}_ord"
    seg_dirs = searcher.seg_dir_by_id
    deleted_bc = searcher._deleted_bc
    lookup = list(spec.lookup_terms) if spec is not None else []
    pure_negative = spec is not None and not spec.scoring_terms
    base = ["doc_ord", "doc_len", ord_col, "conv_id"]
    dm_cols = filter_cols(spec, base) if spec is not None else list(base)
    if "turn_idx" not in dm_cols and bool(searcher.deleted_keys):
        dm_cols.append("turn_idx")
    lspec = spec

    def run_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        seg_id = int(pdf["seg_id"].iloc[0])
        dm = pq.read_table(
            f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
        ).to_pandas()
        n_docs = len(dm)
        ords = dm[ord_col].to_numpy(np.int64)
        convs = dm["conv_id"].to_numpy()
        if lspec is None:
            live = apply_deletes(
                None, dm, deleted_bc.value if deleted_bc else None
            )
            hits = None if live is None else np.flatnonzero(live)
        else:
            allowed = apply_deletes(
                filter_mask(dm, lspec), dm,
                deleted_bc.value if deleted_bc else None,
            )
            if pure_negative:
                term_rows = {}
                if lookup:
                    post_tbl = pq.read_table(
                        f"{seg_dirs[seg_id]}/postings.parquet",
                        filters=[("term", "in", lookup)],
                        columns=postings_task_columns(lspec),
                    ).to_pandas()
                    term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
            else:
                term_rows = {r["term"]: r for _, r in pdf.iterrows()}
            max_dl = int(dm["doc_len"].max()) if n_docs else 0
            hits = match_segment(lspec, term_rows, n_docs, allowed, max_dl)
        if hits is not None:
            ords, convs = ords[hits], convs[hits]
        keep = ords >= 0
        ords, convs = ords[keep], convs[keep]
        uniq_o, inv = np.unique(ords, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uniq_o))
        # distinct (ord, conv) pairs -> per-ord unique block count
        codes = pd.factorize(convs)[0].astype(np.int64)
        stride = int(codes.max()) + 1 if len(codes) else 1
        pair_ords = np.unique(ords * stride + codes) // stride
        ub = np.bincount(
            np.searchsorted(uniq_o, pair_ords), minlength=len(uniq_o)
        )
        return pd.DataFrame(
            {
                "seg_id": np.full(len(uniq_o), seg_id, np.int32),
                "term_ord": uniq_o.astype(np.int32),
                "cnt": cnt.astype(np.int64),
                "uniq": ub.astype(np.int64),
            }
        )

    driver = (
        searcher.seg_driver() if (spec is None or pure_negative)
        else searcher.postings().filter(F.col("term").isin(lookup))
    )
    partials = driver.groupBy("seg_id").applyInPandas(
        run_seg, UNIQUE_BLOCK_PARTIAL_SCHEMA
    )
    named = _with_terms(searcher, partials, field)
    return (
        named.groupBy("term")
        .agg(F.sum("cnt").alias("cnt"), F.sum("uniq").alias("unique_convs"))
        .select(F.col("term").alias("facet_value"), "cnt", "unique_convs")
        .orderBy(F.desc("cnt"), F.asc("facet_value"))
        .limit(limit)
    )

def facet_block_parent(
    searcher,
    field: str,
    spec: BooleanSpec,
    limit: int = 10,
) -> DataFrame:
    """JSON Facet ``domain: {blockParent: ...}`` narrowing: map every
    CHILD hit to its parent block document and facet the PARENTS — one
    count per matching conversation, bucketed by the parent row's
    field value. In the (conv_id, turn_idx)-sorted block model the
    parent document is the conversation root, ``turn_idx == 0``.

    Segment-local exactness, same invariant as blockChildren /
    uniqueBlock: conversations never span segments (hash-partitioned
    build), so each segment task maps its OWN hits to parent rows with
    one vectorized isin — no conv-id shuffle, no join; only
    (seg_id, term_ord, cnt) partials leave the executor. A tombstoned
    parent row drops its conversation from the domain (liveDocs parity
    with ToParentBlockJoinQuery: deleted parents are never returned).

    ref: solr/core/src/java/org/apache/solr/search/facet/FacetRequest.java
         (Domain.toParent / BlockJoinParentQParser domain changes)
    """
    from lucene_solr_spark.query.executor import (
        apply_deletes,
        filter_cols,
        filter_mask,
    )

    if spec.needs_rewrite:
        spec = searcher.rewrite(spec)
    ord_col = f"{field}_ord"
    seg_dirs = searcher.seg_dir_by_id
    deleted_bc = searcher._deleted_bc
    lookup = list(spec.lookup_terms)
    pure_negative = not spec.scoring_terms
    base = ["doc_ord", "doc_len", ord_col, "conv_id", "turn_idx"]
    dm_cols = filter_cols(spec, base)
    lspec = spec

    def run_seg(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        seg_id = int(pdf["seg_id"].iloc[0])
        dm = pq.read_table(
            f"{seg_dirs[seg_id]}/docmap.parquet", columns=dm_cols
        ).to_pandas()
        n_docs = len(dm)
        allowed = apply_deletes(
            filter_mask(dm, lspec), dm,
            deleted_bc.value if deleted_bc else None,
        )
        if pure_negative:
            term_rows = {}
            if lookup:
                post_tbl = pq.read_table(
                    f"{seg_dirs[seg_id]}/postings.parquet",
                    filters=[("term", "in", lookup)],
                    columns=postings_task_columns(lspec),
                ).to_pandas()
                term_rows = {r["term"]: r for _, r in post_tbl.iterrows()}
        else:
            term_rows = {r["term"]: r for _, r in pdf.iterrows()}
        max_dl = int(dm["doc_len"].max()) if n_docs else 0
        hits = match_segment(lspec, term_rows, n_docs, allowed, max_dl)
        convs = dm["conv_id"].to_numpy()
        # toParent: parent rows (turn 0, live) of conversations with a hit
        parents = dm["turn_idx"].to_numpy(np.int64) == 0
        live = apply_deletes(None, dm, deleted_bc.value if deleted_bc else None)
        if live is not None:
            parents &= live
        parents &= np.isin(convs, np.unique(convs[hits]))
        ords = dm[ord_col].to_numpy(np.int64)[parents]
        uniq, cnt = np.unique(ords[ords >= 0], return_counts=True)
        return pd.DataFrame(
            {
                "seg_id": np.full(len(uniq), seg_id, np.int32),
                "term_ord": uniq.astype(np.int32),
                "cnt": cnt.astype(np.int64),
            }
        )

    driver = (
        searcher.seg_driver() if pure_negative
        else searcher.postings().filter(F.col("term").isin(lookup))
    )
    partials = driver.groupBy("seg_id").applyInPandas(
        run_seg, PARTIAL_SCHEMA
    )
    named = _with_terms(searcher, partials, field)
    return (
        named.groupBy("term")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.col("term").alias("facet_value"), "cnt")
        .orderBy(F.desc("cnt"), F.asc("facet_value"))
        .limit(limit)
    )
