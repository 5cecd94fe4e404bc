"""spark-submit --py-files launch test (north rule's stated launch
mode): package the engine, submit the build job as a cold cluster
would, verify the committed index answers queries."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from jobs.package import make_zip
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.environ.get("SPARK_HOME", ""), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit not on PATH",
)
def test_spark_submit_build(spark, sf_dir, tmp_path):
    src = str(tmp_path / "corpus")
    transcripts_from_documents(spark, sf_dir).repartition(2).write.parquet(src)
    out_root = str(tmp_path / "idx")
    zip_path = make_zip(str(tmp_path / "engine.zip"))

    env = os.environ.copy()
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(os.path.dirname(__file__), "..", "jobs", "build_job.py"),
            "--input", src,
            "--output", out_root,
            "--mode", "prepartitioned",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["n_docs"] > 0
    # the index committed by the submitted job is queryable in-process
    s = IndexSearcher(spark, out_root)
    hits = s.search(BooleanSpec(must=("merge",), k=5)).toPandas()
    assert len(hits) > 0
    _ = sys  # keep import for interpreter parity notes


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit not on PATH",
)
def test_spark_submit_query(spark, sf_dir, tmp_path):
    """build → query via spark-submit: the full cluster user story."""
    from lucene_solr_spark.index.build import build_index

    root = str(tmp_path / "qidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    zip_path = make_zip(str(tmp_path / "engine.zip"))
    env = os.environ.copy()
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(os.path.dirname(__file__), "..", "jobs", "query_job.py"),
            "--index", root,
            "--q", '+merge -"table scan"',
            "--k", "5", "--facet", "role",
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert out["spec"]["must"] == ["merge"]
    assert out["spec"]["must_not_phrases"] == [["table", "scan"]]
    assert len(out["hits"]) == 5 and out["hits"][0]["score"] > 0
    assert out["facets"]["role"]
    # in-process engine agrees with the submitted job
    s = IndexSearcher(spark, root)
    spec = __import__("lucene_solr_spark.query.parser", fromlist=["parse"]).parse(
        '+merge -"table scan"', k=5
    )
    mine = s.search(spec, round_to=4).collect()
    assert [(h["conv_id"], h["turn_idx"]) for h in out["hits"]] == [
        (r.conv_id, r.turn_idx) for r in mine
    ]


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit not on PATH",
)
def test_spark_submit_edismax_multiselect(spark, sf_dir, tmp_path):
    """edismax front door + multi-select facet exclusion through the
    serving CLI: role facet with the role fq excluded must show >1
    bucket while hits honor the filter."""
    from lucene_solr_spark.index.build import build_index

    root = str(tmp_path / "eidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    zip_path = make_zip(str(tmp_path / "engine.zip"))
    env = os.environ.copy()
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(os.path.dirname(__file__), "..", "jobs", "query_job.py"),
            "--index", root,
            "--q", "merge data", "--edismax", "--mm", "50%",
            "--pf-boost", "2.0", "--explain",
            "--k", "5", "--facet", "role", "--facet-exclude", "role",
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert out["spec"]["should"] == ["merge", "data"]
    assert len(out["hits"]) == 5
    # exclusion: no fq in this query, so the facet is the q-domain one
    assert len(out["facets"]["role"]) > 1
    # debugQuery breakdown of the top hit sums to its score
    (key, br), = out["explain"].items()
    assert key == f'{out["hits"][0]["conv_id"]}/{out["hits"][0]["turn_idx"]}'
    assert abs(sum(r["contrib"] for r in br) - out["hits"][0]["score"]) < 2e-3
    # in-process edismax agrees with the submitted job
    from lucene_solr_spark.query.parser import edismax

    s = IndexSearcher(spark, root)
    mine = s.search(edismax("merge data", mm="50%", pf_boost=2.0, k=5),
                    round_to=4).collect()
    assert [(h["conv_id"], h["turn_idx"]) for h in out["hits"]] == [
        (r.conv_id, r.turn_idx) for r in mine
    ]


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit not on PATH",
)
def test_spark_submit_relatedness_facet(spark, sf_dir, tmp_path):
    """SKG relatedness + blockChildren domain through the serving CLI
    (r4 surfaces): relatedness buckets carry fg/bg counts and a
    bounded score; the widened-domain facet counts dominate the plain
    query-domain counts."""
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.query.facets import facet_relatedness
    from lucene_solr_spark.query.model import BooleanSpec as BS

    root = str(tmp_path / "ridx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    zip_path = make_zip(str(tmp_path / "engine.zip"))
    env = os.environ.copy()
    env.pop("SPARK_GRAFT_CPUS", None)
    base = [
        SPARK_SUBMIT, "--master", "local[2]",
        "--py-files", zip_path,
        "--conf", "spark.ui.enabled=false",
        os.path.join(os.path.dirname(__file__), "..", "jobs", "query_job.py"),
        "--index", root, "--q", "merge", "--k", "3",
        "--facet", "tool", "--facet-limit", "8",
    ]
    proc = subprocess.run(
        base + ["--facet-relatedness"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    buckets = out["facets"]["tool"]
    assert len(buckets) == 8
    assert all(abs(b["relatedness"]) <= 1.0 for b in buckets)
    # CLI result == in-process result
    s = IndexSearcher(spark, root)
    mine = facet_relatedness(s, "tool", fg_spec=BS(must=("merge",)),
                             limit=8).collect()
    assert [(b["value"], b["fg_count"], b["bg_count"]) for b in buckets] == [
        (r.facet_value, r.fg_count, r.bg_count) for r in mine
    ]


@pytest.mark.skipif(
    not (SPARK_SUBMIT and os.path.exists(SPARK_SUBMIT)),
    reason="spark-submit not on PATH",
)
def test_spark_submit_select_json(spark, sf_dir, tmp_path):
    """The FULL /select params surface through one spark-submit:
    --select-json dispatches a composed request (paging + facet +
    stats + facet.query) and the JSON response matches the in-process
    handler leg-for-leg."""
    from lucene_solr_spark.index.build import build_index

    root = str(tmp_path / "sidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    zip_path = make_zip(str(tmp_path / "engine.zip"))
    env = os.environ.copy()
    env.pop("SPARK_GRAFT_CPUS", None)
    params = {
        "q": "merge data", "q.op": "AND", "start": 2, "rows": 5,
        "facet.field": "role", "facet.limit": 5,
        "facet.query": "role:assistant",
        "stats": True, "stats.field": "doc_len",
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(os.path.dirname(__file__), "..", "jobs",
                         "query_job.py"),
            "--index", root,
            "--select-json", json.dumps(params),
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    from lucene_solr_spark.handler import select

    s = IndexSearcher(spark, root)
    mine = select(s, params)
    assert out["numFound"] == mine["numFound"] > 0
    assert [(d["conv_id"], d["turn_idx"]) for d in out["response"]] == [
        (r.conv_id, r.turn_idx) for r in mine["response"].collect()
    ]
    assert out["facet_counts"]["role"] == [
        {"facet_value": r.facet_value, "cnt": r.cnt}
        for r in mine["facet_counts"]["role"].collect()
    ]
    assert out["facet_queries"]["role:assistant"] == (
        mine["facet_queries"]["role:assistant"]
    )
    assert out["stats"]["doc_len"][0]["cnt"] == mine["numFound"]
    # exactly one of --q / --select-json
    bad = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
         "--conf", "spark.ui.enabled=false",
         os.path.join(os.path.dirname(__file__), "..", "jobs",
                      "query_job.py"),
         "--index", root],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert bad.returncode != 0


def test_spark_submit_sql(spark, sf_dir, tmp_path):
    """/sql through one spark-submit: --sql runs the Parallel SQL
    statement against the committed index and streams JSON rows that
    match the in-process sql_query result row-for-row."""
    from lucene_solr_spark.index.build import build_index

    root = str(tmp_path / "qsqlidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    zip_path = make_zip(str(tmp_path / "engine.zip"))
    env = os.environ.copy()
    env.pop("SPARK_GRAFT_CPUS", None)
    stmt = ("SELECT role, COUNT(*) AS cnt, AVG(doc_len) AS avg_dl "
            "FROM transcripts WHERE text = 'merge' "
            "GROUP BY role ORDER BY cnt DESC LIMIT 10")
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            os.path.join(os.path.dirname(__file__), "..", "jobs",
                         "query_job.py"),
            "--index", root,
            "--sql", stmt,
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    from lucene_solr_spark.sql import sql_query

    s = IndexSearcher(spark, root)
    want = [r.asDict() for r in sql_query(s, stmt).collect()]
    assert rows == want and rows
