#!/usr/bin/env python
"""Headline benchmark for the lucene_solr_spark engine.

Measures the two BASELINE.json metrics on this sandbox:

1. **Index-build throughput (turns/sec)** — deterministic synthetic
   transcripts corpus (counter-hashed, partition-invariant; see
   ``lucene_solr_spark.transcripts.generate_transcripts``) inverted
   into committed segments via the full production path
   (``build_index``: applyInPandas inversion → varint posting pack →
   manifest commit).
2. **BM25 top-10 query latency** — the golden boolean query set
   (FIXTURES.md §3) executed by the distributed ``IndexSearcher``
   (bucket-pruned postings scan → cogrouped segment scorer with
   block-max WAND → TakeOrderedAndProject).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_TURNS (override corpus size).

``--scaling`` mode runs the SAME build+query job at two parallelism
levels (local[8] vs local[32]) on the SAME input corpus and reports
throughput at both plus scaling efficiency (the sandbox proxy for the
north rule's N-vs-4N-executor criterion; results also land in
BENCH/scaling.json and BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from lucene_solr_spark.index.build import build_index  # noqa: E402
from lucene_solr_spark.query.executor import IndexSearcher  # noqa: E402
from lucene_solr_spark.registry import BM25_SPECS  # noqa: E402
from lucene_solr_spark.session import get_spark  # noqa: E402
from lucene_solr_spark.transcripts import generate_transcripts  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_turns(sf: float) -> int:
    env = os.environ.get("BENCH_TURNS")
    if env:
        return int(env)
    return max(20_000, int(sf * 2_000_000))


def run_once(cpus: int, n_turns: int, queries: bool = True) -> dict:
    """One full build+query cycle at the given core count."""
    spark = get_spark(app_name=f"bench-local{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    out: dict = {"cpus": cpus, "turns": n_turns}
    idx_root = tempfile.mkdtemp(prefix=f"bench_idx_{cpus}_")
    try:
        t = generate_transcripts(spark, n_turns, seed=42, partitions=cpus * 2)
        t0 = time.perf_counter()
        build_index(spark, t, idx_root, num_parts=cpus * 2,
                    lineage_source=f"synthetic:{n_turns}")
        build_s = time.perf_counter() - t0
        out["build_sec"] = round(build_s, 3)
        out["turns_per_sec"] = round(n_turns / build_s, 1)

        if queries:
            searcher = IndexSearcher(spark, idx_root)
            # warmup (JIT/Arrow init — excluded from per-query numbers)
            searcher.search(next(iter(BM25_SPECS.values()))).collect()
            q_secs: dict[str, float] = {}
            for name, spec in BM25_SPECS.items():
                best = float("inf")
                for _ in range(2):  # steady-state latency (2nd run
                    tq = time.perf_counter()  # dodges post-build GC)
                    searcher.search(spec).collect()
                    best = min(best, time.perf_counter() - tq)
                q_secs[name] = round(best, 3)
            out["queries"] = q_secs
            out["query_total_sec"] = round(sum(q_secs.values()), 3)
    finally:
        shutil.rmtree(idx_root, ignore_errors=True)
        spark.stop()
    return out


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    n_turns = bench_turns(sf)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        lo_c, hi_c = 8, 32
        lo = run_once(lo_c, n_turns, queries=False)
        hi = run_once(hi_c, n_turns, queries=True)
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (hi_c / lo_c)
        result = {
            "metric": "index_build_scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "sf": sf,
            "low": lo,
            "high": hi,
            "queries": hi.get("queries", {}),
        }
        os.makedirs(os.path.join(_REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(_REPO, "BENCH", "scaling.json"), "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        return

    r = run_once(cpus, n_turns, queries=True)
    total = r["build_sec"] + r.get("query_total_sec", 0.0)
    print(json.dumps({
        "metric": "build_plus_query_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": r.get("queries", {}),
        "sf": sf,
        "build": {
            "turns": r["turns"],
            "sec": r["build_sec"],
            "turns_per_sec": r["turns_per_sec"],
            "cpus": r["cpus"],
        },
    }))


if __name__ == "__main__":
    main()
