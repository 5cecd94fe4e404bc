"""Shuffle-free pre-partitioned build (the 100 TB path) must answer
identically to the hash-repartitioned build over the same corpus, and
resume must skip committed partitions."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index.build import build_index, build_index_prepartitioned
from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents

SPECS = [
    BooleanSpec(must=("merge",), k=10),
    BooleanSpec(should=("fast", "slow", "vector"), min_should_match=2, k=10),
    BooleanSpec(phrases=(("table", "scan"),), k=10),
]


@pytest.fixture(scope="module")
def pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("pp")
    src = str(base / "corpus")
    t = transcripts_from_documents(spark, sf_dir)
    # conversation-contiguous layout (Iceberg bucket analog): sort by
    # conv then range-partition → conversations whole per file
    t.repartitionByRange(4, "conv_id", "turn_idx").write.parquet(src)
    pp_root = str(base / "pp_idx")
    sh_root = str(base / "sh_idx")
    pre = spark.read.parquet(src)
    build_index_prepartitioned(spark, pre, pp_root, lineage_source=src)
    build_index(spark, t, sh_root, num_parts=4, lineage_source=sf_dir)
    return pp_root, sh_root


def test_same_answers(spark, pair):
    pp_root, sh_root = pair
    a, b = IndexSearcher(spark, pp_root), IndexSearcher(spark, sh_root)
    assert a.manifest.n_docs == b.manifest.n_docs
    for spec in SPECS:
        ra = a.search(spec).toPandas()
        rb = b.search(spec).toPandas()
        assert list(zip(ra.conv_id, ra.turn_idx)) == list(zip(rb.conv_id, rb.turn_idx))
        assert np.allclose(ra.score.to_numpy(), rb.score.to_numpy(), atol=1e-9)


def test_resume_skips_committed(spark, pair):
    pp_root, _ = pair
    m1 = Manifest.load(pp_root)
    src = m1.lineage[0]["source"]
    pre = spark.read.parquet(src)
    m2 = build_index_prepartitioned(spark, pre, pp_root, lineage_source=src)
    # nothing new to build → no new snapshot
    assert m2.snapshot_id == m1.snapshot_id
    assert sorted(m2.segments) == sorted(m1.segments)
