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

from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.scorer import match_segment

PARTIAL_SCHEMA = "seg_id int, term_ord int, cnt long"


@dataclass(frozen=True)
class FacetRequest:
    """facet.field request (``SimpleFacets#getFacetFieldCounts`` params)."""

    field: str  # one of the docvalues-like ordinal fields (role/tool/ftok)
    limit: int = 10
    mincount: int = 1


def _overrequest(limit: int) -> int:
    """Phase-1 per-shard over-request: the reference's limit*1.5+10
    (``FacetComponent.DistribFieldFacet``)."""
    return int(limit * 1.5) + 10


def segment_partials(searcher, req: FacetRequest, spec: BooleanSpec | None) -> DataFrame:
    """Per-segment sparse ordinal counts: (seg_id, term_ord, cnt)."""
    ord_col = f"{req.field}_ord"
    dm_side = searcher.docmap().select("seg_id", "doc_ord", "doc_len", ord_col)

    if spec is None:
        # MatchAllDocs domain: count every doc's ordinal, still sparse
        # per batch (no dense counter sized to field cardinality).
        def count_all(pdf: pd.DataFrame) -> pd.DataFrame:
            ords = pdf[ord_col].to_numpy(np.int64)
            ords = ords[ords >= 0]  # drop missing (-1), Lucene semantics
            uniq, cnt = np.unique(ords, return_counts=True)
            return pd.DataFrame(
                {
                    "seg_id": np.full(len(uniq), pdf["seg_id"].iloc[0], np.int32),
                    "term_ord": uniq.astype(np.int32),
                    "cnt": cnt.astype(np.int64),
                }
            )

        return dm_side.groupBy("seg_id").applyInPandas(count_all, PARTIAL_SCHEMA)

    all_terms = list(dict.fromkeys(spec.scoring_terms + tuple(spec.must_not)))
    post = searcher.postings().filter(F.col("term").isin(all_terms))
    filter_expr = F.lit(True)
    for fld, val in spec.filters:
        filter_expr = filter_expr & (F.col(fld) == val)
    has_filters = bool(spec.filters)
    dm_cols = searcher.docmap().select(
        "seg_id", "doc_ord", "doc_len", ord_col, filter_expr.alias("allowed")
    )

    def count_hits(post_pdf: pd.DataFrame, dm_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(dm_pdf) == 0:
            return pd.DataFrame({"seg_id": [], "term_ord": [], "cnt": []}).astype(
                {"seg_id": np.int32, "term_ord": np.int32, "cnt": np.int64}
            )
        dm_sorted = dm_pdf.sort_values("doc_ord")
        n_docs = len(dm_sorted)
        allowed = dm_sorted["allowed"].to_numpy(bool) if has_filters else None
        term_rows = {r["term"]: r for _, r in post_pdf.iterrows()}
        max_dl = int(dm_sorted["doc_len"].max()) if n_docs else 0
        hits = match_segment(spec, term_rows, n_docs, allowed, max_dl)
        ords = dm_sorted[ord_col].to_numpy(np.int64)[hits]
        ords = ords[ords >= 0]
        uniq, cnt = np.unique(ords, return_counts=True)  # sparse counter
        return pd.DataFrame(
            {
                "seg_id": np.full(len(uniq), dm_sorted["seg_id"].iloc[0], np.int32),
                "term_ord": uniq.astype(np.int32),
                "cnt": cnt.astype(np.int64),
            }
        )

    return (
        post.groupby("seg_id")
        .cogroup(dm_cols.groupby("seg_id"))
        .applyInPandas(count_hits, PARTIAL_SCHEMA)
    )


def _with_terms(searcher, partials: DataFrame, field: str) -> DataFrame:
    """Ordinal→term lookup (``lookupOrd``): join per-segment dicts."""
    dicts = searcher.dicts().filter(F.col("field") == field).select(
        "seg_id", "term_ord", "term"
    )
    return partials.join(dicts, ["seg_id", "term_ord"], "inner")


def facet_field(
    searcher,
    req: FacetRequest,
    spec: BooleanSpec | None = None,
    refine: bool = True,
) -> DataFrame:
    """Distributed facet counts: (facet_value, cnt), top `limit`.

    refine=True runs the reference's two-phase merge-and-refine (A3);
    refine=False is the exact single-shuffle groupBy (the control both
    the tests and the DuckDB oracle compare against — in Spark both are
    exact; two-phase exists to bound shuffle width at high cardinality).
    """
    parts = _with_terms(searcher, segment_partials(searcher, req, spec), req.field)

    if refine:
        over = _overrequest(req.limit)
        w = Window.partitionBy("seg_id").orderBy(F.desc("cnt"), F.asc("term"))
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

    return (
        agg.filter(F.col("cnt") >= req.mincount)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(req.limit)
        .select(F.col("term").alias("facet_value"), "cnt")
    )
