"""Registry of driver-checkable queries (SURVEY §2 inventory).

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
a DuckDB oracle SQL string over the driver's pre-registered parquet
views. Exposed to the driver via ``__spark_entry__.py``.

Column names are aliased identically on both sides (driver hashes
values after sorting columns by name). Float columns are rounded on
both sides to kill cross-engine ulp noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark.query import bm25_df
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.oracle import ROUND, bm25_oracle_sql
from lucene_solr_spark.transcripts import transcripts_from_documents

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# ---------------------------------------------------------------------------
# CORE: BM25 boolean query battery over the transcripts table (P2-P8, W1-W2)
# ---------------------------------------------------------------------------

#: The golden boolean specs (FIXTURES.md §3 shapes). Terms chosen from the
#: documents vocabulary (head/mid/tail df).
BM25_SPECS: dict[str, BooleanSpec] = {
    "bm25_term": BooleanSpec(must=("merge",), k=10),
    "bm25_and": BooleanSpec(must=("sort", "window"), k=10),
    "bm25_or_mm": BooleanSpec(should=("fast", "slow", "vector"), min_should_match=2, k=10),
    "bm25_not": BooleanSpec(must=("join",), must_not=("stream",), k=10),
    "bm25_phrase": BooleanSpec(phrases=(("table", "scan"),), k=10),
    "bm25_filtered": BooleanSpec(must=("query",), filters=(("role", "assistant"),), k=10),
    "bm25_filtered_tool": BooleanSpec(must=("data",), filters=(("tool", "tool_7"),), k=10),
    "bm25_and3": BooleanSpec(must=("key", "hash", "scan"), k=15),
    "bm25_or_plain": BooleanSpec(should=("batch", "agg"), min_should_match=1, k=20),
    "bm25_phrase3": BooleanSpec(phrases=(("order", "sort"),), must=("table",), k=10),
}


def _mk_bm25(spec: BooleanSpec) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = transcripts_from_documents(spark, sf_dir)
        return bm25_df.search(t, spec, round_to=ROUND)

    return run


for _name, _spec in BM25_SPECS.items():
    register(f"q_{_name}", _mk_bm25(_spec), bm25_oracle_sql(_spec))
