"""Distributed IndexSearcher over committed segments (SURVEY §3.2).

Physical plan:

    postings scan, filter term ∈ query terms        (Parquet row-group
                                                     pruning: files are
                                                     term-sorted — the
                                                     terms-dict seek)
      → tiny groupBy(term).sum(df) → driver          (Weight binding:
                                                     global df → idf)
      → cogroup(postings by seg, docmap by seg)
        → applyInPandas segment scorer               (vectorized decode,
                                                     leapfrog AND,
                                                     block-max WAND)
      → per-segment top-k rows
      → orderBy(score desc, conv, turn).limit(k)     (TakeOrderedAndProject
                                                     ≡ TopDocs.merge)

The docmap side of the cogroup carries (doc_len, conv_id, turn_idx)
plus the evaluated FILTER predicate — the norms file + fq DocSet,
loaded per segment exactly as Lucene does.

At 10^12-turn scale the expensive scan is postings; it is pruned two
ways: Catalyst pushes ``term IN (...)`` into Parquet (row-group
min/max on the sorted term column), and only manifest-committed
segment files are listed at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.scorer import score_segment

RESULT_SCHEMA = "conv_id string, turn_idx int, score double"


class IndexSearcher:
    """Searcher bound to the latest committed snapshot of an index."""

    def __init__(self, spark: SparkSession, index_root: str):
        self.spark = spark
        self.manifest = Manifest.load(index_root)
        if not self.manifest.segments:
            raise ValueError(f"no committed snapshot under {index_root}")
        dirs = self.manifest.seg_dirs()
        self._postings_files = [f"{d}/postings.parquet" for d in dirs]
        self._docmap_files = [f"{d}/docmap.parquet" for d in dirs]
        self._dict_files = [f"{d}/dicts.parquet" for d in dirs]
        # Resolve file listings once (InMemoryFileIndex construction is
        # driver-side overhead we must not pay per query).
        self._postings_df = self.spark.read.parquet(*self._postings_files)
        self._docmap_df = self.spark.read.parquet(*self._docmap_files)
        self._dicts_df = self.spark.read.parquet(*self._dict_files)

    # -- table handles -------------------------------------------------
    def postings(self) -> DataFrame:
        return self._postings_df

    def docmap(self) -> DataFrame:
        return self._docmap_df

    def dicts(self) -> DataFrame:
        return self._dicts_df

    # -- Weight binding ------------------------------------------------
    def global_idf(self, terms: list[str]) -> dict[str, float]:
        """idf from index-wide df (BM25Similarity.java formula).
        Aggregation over the pruned postings scan — tiny result."""
        n = self.manifest.n_docs
        rows = (
            self.postings()
            .filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        dfs = {r.term: r.df for r in rows}
        return {
            t: math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
            for t in terms
        }

    # -- search --------------------------------------------------------
    def search(self, spec: BooleanSpec, round_to: int | None = None) -> DataFrame:
        all_terms = list(
            dict.fromkeys(spec.scoring_terms + tuple(spec.must_not))
        )
        idf = self.global_idf(all_terms)  # must_not idf unused but keyed
        avgdl = self.manifest.avgdl
        k = spec.k

        post = self.postings().filter(F.col("term").isin(all_terms))

        dm = self.docmap()
        filter_expr = F.lit(True)
        for fld, val in spec.filters:
            filter_expr = filter_expr & (F.col(fld) == val)
        dm_side = dm.select(
            "seg_id",
            "doc_ord",
            "doc_len",
            "conv_id",
            "turn_idx",
            filter_expr.alias("allowed"),
        )

        has_filters = bool(spec.filters)

        def run_seg(post_pdf, dm_pdf):
            import numpy as np
            import pandas as pd

            if len(dm_pdf) == 0:
                return pd.DataFrame(columns=["conv_id", "turn_idx", "score"])
            dm_sorted = dm_pdf.sort_values("doc_ord")
            doc_len = dm_sorted["doc_len"].to_numpy(np.int64)
            allowed = (
                dm_sorted["allowed"].to_numpy(bool) if has_filters else None
            )
            term_rows = {
                r["term"]: r for _, r in post_pdf.iterrows()
            }
            docs, scores = score_segment(
                spec, term_rows, idf, avgdl, doc_len, allowed, k
            )
            if len(docs) == 0:
                return pd.DataFrame(columns=["conv_id", "turn_idx", "score"])
            sel = dm_sorted.iloc[docs]
            return pd.DataFrame(
                {
                    "conv_id": sel["conv_id"].to_numpy(),
                    "turn_idx": sel["turn_idx"].to_numpy(),
                    "score": scores,
                }
            )

        hits = (
            post.groupby("seg_id")
            .cogroup(dm_side.groupby("seg_id"))
            .applyInPandas(run_seg, schema=RESULT_SCHEMA)
        )
        if round_to is not None:
            hits = hits.withColumn("score", F.round("score", round_to))
        return hits.orderBy(F.desc("score"), "conv_id", "turn_idx").limit(k)

    # -- faceting ------------------------------------------------------
    def facet(
        self,
        field: str,
        spec: BooleanSpec | None = None,
        limit: int = 10,
        mincount: int = 1,
        refine: bool = True,
    ) -> DataFrame:
        """SOLR-5894-style facet counts over the query domain
        (two-phase merge-and-refine; see query/facets.py)."""
        from lucene_solr_spark.query.facets import FacetRequest, facet_field

        return facet_field(
            self, FacetRequest(field=field, limit=limit, mincount=mincount),
            spec=spec, refine=refine,
        )
