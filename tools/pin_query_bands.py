#!/usr/bin/env python
"""Pinned micro-study for the bm25_term / facet_role_merge band
discrepancy (VERDICT r3 item 6).

One fresh process = one sample: build the sf0.1 bench index once
(untimed), then warm + best-of-R each target query, plus a
decomposition of bm25_term into (job overhead with a zero-match term,
unsorted score pass, full search). Run it several times under taskset
and take the per-metric minimum — the BENCH/BASELINE.md protocol.

Usage: taskset -c 0-31 python tools/pin_query_bands.py [repeats=8]
Prints ONE JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import bench_turns, materialize_corpus  # noqa: E402
from lucene_solr_spark.index.build import build_index_prepartitioned  # noqa: E402
from lucene_solr_spark.query.executor import IndexSearcher  # noqa: E402
from lucene_solr_spark.query.model import BooleanSpec  # noqa: E402
from lucene_solr_spark.session import get_spark  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_turns = bench_turns(0.1)
    corpus = materialize_corpus(n_turns)
    spark = get_spark(
        "pin-bands", master="local[32]", shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    idx = tempfile.mkdtemp(prefix="pin_bands_idx_")
    out: dict = {"turns": n_turns, "repeats": repeats}
    try:
        t = spark.read.parquet(corpus)
        build_index_prepartitioned(spark, t, idx, lineage_source=corpus)
        s = IndexSearcher(spark, idx).persist()

        specs = {
            "bm25_term": BooleanSpec(must=("merge",), k=10),
            "bm25_term_zero_match": BooleanSpec(must=("zzznope",), k=10),
            "bm25_phrase": BooleanSpec(phrases=(("table", "scan"),), k=10),
            "bm25_and_zero": BooleanSpec(must=("sort", "window"), k=10),
        }
        for spec in specs.values():  # warm every shape (JIT + Arrow)
            s.search(spec).collect()
        s.facet("role", spec=BooleanSpec(must=("merge",)), limit=10).collect()

        def best(fn) -> float:
            b = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn()
                b = min(b, time.perf_counter() - t0)
            return round(b, 3)

        for name, spec in specs.items():
            out[name] = best(lambda sp=spec: s.search(sp).collect())
        # decomposition: unsorted score pass (no TakeOrdered fetch)
        out["bm25_term_score_only"] = best(
            lambda: s.score_hits(specs["bm25_term"], k=None).count()
        )
        out["facet_role_merge"] = best(
            lambda: s.facet(
                "role", spec=BooleanSpec(must=("merge",)), limit=10
            ).collect()
        )
        out["facet_ftok_matchall"] = best(
            lambda: s.facet("ftok", spec=None, limit=20).collect()
        )
        # hit volume context
        out["merge_hits"] = s.score_hits(
            specs["bm25_term"], k=None
        ).count()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()
    print("PIN " + json.dumps(out))


if __name__ == "__main__":
    main()
