#!/usr/bin/env python
"""Generate tests/golden/ — the pinned reference query set + expected
top-k (docIDs AND BM25 scores) from the brute-force oracle at sf0.001
(SURVEY §7.5: the rank-identity contract is against this set)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from dataclasses import asdict

from lucene_solr_spark.query import bm25_df
from lucene_solr_spark.registry import BM25_SPECS
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.transcripts import transcripts_from_documents

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main() -> None:
    spark = get_spark("golden", shuffle_partitions=8)
    t = transcripts_from_documents(spark, SF_DIR)
    queries, results = {}, {}
    for name, spec in BM25_SPECS.items():
        queries[name] = asdict(spec)
        pdf = bm25_df.search(t, spec, round_to=6).toPandas()
        results[name] = [
            [r.conv_id, int(r.turn_idx), float(r.score)]
            for r in pdf.itertuples()
        ]
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "queries.json"), "w") as f:
        json.dump({"sf_dir": SF_DIR, "round_to": 6, "queries": queries},
                  f, indent=1, sort_keys=True)
    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {len(queries)} golden queries -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
