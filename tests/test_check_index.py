"""CheckIndex CLI tool (tools/check_index.py): a freshly built index
passes the deep check; tampered stats / unreadable segment files are
detected; exit-code contract."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.transcripts import transcripts_from_documents
from tools.check_index import check_index


@pytest.fixture(scope="module")
def built_root(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("chk"))
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=3, lineage_source=sf_dir)
    return root


def test_clean_index_passes_deep(spark, built_root):
    rep = check_index(spark, built_root, deep=True)
    assert rep["ok"] and rep["errors"] == []
    assert rep["segments"] == 3 and rep["deep"]


def test_tampered_stats_detected(spark, built_root, tmp_path):
    root = str(tmp_path / "tampered")
    shutil.copytree(built_root, root)
    mdir = os.path.join(root, "manifest")
    snaps = sorted(os.listdir(mdir))
    path = os.path.join(mdir, snaps[-1])
    payload = json.load(open(path))
    name = sorted(payload["segments"])[0]
    payload["segments"][name]["n_postings"] += 7
    payload["segments"][name]["sum_dl"] -= 1
    json.dump(payload, open(path, "w"))
    rep = check_index(spark, root, deep=False)
    assert not rep["ok"]
    assert any("n_postings" in e for e in rep["errors"])
    assert any("sum_dl" in e for e in rep["errors"])


def test_unreadable_segment_detected(spark, built_root, tmp_path):
    root = str(tmp_path / "broken")
    shutil.copytree(built_root, root)
    seg = sorted(os.listdir(os.path.join(root, "segments")))[0]
    pq = os.path.join(root, "segments", seg, "postings.parquet")
    if os.path.isdir(pq):
        shutil.rmtree(pq)
    else:
        os.remove(pq)
    rep = check_index(spark, root, deep=False)
    assert not rep["ok"]
    assert any("unreadable" in e for e in rep["errors"])


def test_empty_index_ok(spark, tmp_path):
    rep = check_index(spark, str(tmp_path / "nothing"))
    assert rep["ok"] and rep["segments"] == 0


def test_maintain_check_verb(spark, built_root):
    """`maintain_job.py check --index ... --deep` wraps the tool."""
    from jobs.maintain_job import main

    st = main(["check", "--index", built_root, "--deep"])
    assert st["cmd"] == "check" and st["ok"] and st["deep"]
