"""Ops-plane CLI (jobs/maintain_job.py): delete → replicate → merge →
clear-tombstones round trip, in-process."""

from __future__ import annotations

import sys

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents

sys.path.insert(0, "/root/repo/jobs")
from maintain_job import main  # noqa: E402


def test_maintain_cli_roundtrip(spark, sf_dir, tmp_path):
    root = str(tmp_path / "idx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, root, num_parts=2, lineage_source="t")

    st = main(["delete", "--index", root, "--query", "role:user AND merge"])
    assert st["cmd"] == "delete" and st["tombstones_total"] > 0
    s = IndexSearcher(spark, root)
    assert s.docset(
        BooleanSpec(must=("merge",), filters=(("role", "user"),))
    ).count() == 0

    dst = str(tmp_path / "replica")
    st = main(["replicate", "--src", root, "--dst", dst])
    assert st["copied"] > 0
    # tombstones replicate with the snapshot (manifest pointer + file)
    assert IndexSearcher(spark, dst).docset(
        BooleanSpec(must=("merge",), filters=(("role", "user"),))
    ).count() == 0

    st = main(["merge", "--index", root, "--merge-factor", "8"])
    assert st["n_segments"] >= 1

    st = main(["clear-tombstones", "--index", root])
    assert st["ok"]
    assert not Manifest.load(root).tombstones
