"""S12 replication: leader→follower sync is incremental, atomic, and
answer-preserving across appends and compaction.

ref: solr/core/src/java/org/apache/solr/handler/IndexFetcher.java
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.index.merge import merge_segments
from lucene_solr_spark.index.replication import replicate
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.transcripts import transcripts_from_documents

SPECS = [
    BooleanSpec(must=("merge",), k=10),
    BooleanSpec(should=("fast", "slow"), min_should_match=1, k=10),
]


def _answers(spark, root):
    s = IndexSearcher(spark, root)
    return [
        [tuple(r) for r in s.search(spec, round_to=4).collect()]
        for spec in SPECS
    ]


@pytest.fixture(scope="module")
def leader(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("leader"))
    t = transcripts_from_documents(spark, sf_dir)
    half1 = t.filter(t.turn_idx < 4)
    half2 = t.filter(t.turn_idx >= 4)
    build_index(spark, half1, root, num_parts=3, lineage_source="h1")
    return root, half2


def test_initial_sync_and_incremental_fetch(spark, leader, tmp_path_factory):
    root, half2 = leader
    follower = str(tmp_path_factory.mktemp("follower"))

    st = replicate(root, follower)
    assert not st["in_sync"] and st["copied"] > 0 and st["skipped"] == 0
    assert Manifest.load(follower).snapshot_id == Manifest.load(root).snapshot_id
    assert _answers(spark, follower) == _answers(spark, root)

    # in sync → poll is a no-op
    st2 = replicate(root, follower)
    assert st2["in_sync"] and st2["copied"] == 0

    # leader appends a second commit → only the NEW segments move
    n_before = len(Manifest.load(root).segments)
    build_index(
        spark, half2, root, num_parts=2, resume=False,
        lineage_source="h2", part_offset=50, seg_prefix="h2_",
    )
    n_new = len(Manifest.load(root).segments) - n_before
    st3 = replicate(root, follower)
    assert st3["copied"] == n_new and st3["skipped"] == n_before
    assert _answers(spark, follower) == _answers(spark, root)


def test_sync_after_compaction_cleans_obsolete(spark, leader, tmp_path_factory):
    root, _ = leader
    follower = str(tmp_path_factory.mktemp("follower2"))
    replicate(root, follower)

    merge_segments(spark, root, merge_factor=8)
    st = replicate(root, follower)
    assert st["removed"] > 0  # pre-merge dirs no longer referenced
    assert _answers(spark, follower) == _answers(spark, root)
    # follower's on-disk segment set is exactly the live manifest
    import os

    live = set(Manifest.load(follower).segments)
    on_disk = set(os.listdir(os.path.join(follower, "segments")))
    assert on_disk == live


def test_replicate_requires_committed_leader(tmp_path):
    with pytest.raises(ValueError):
        replicate(str(tmp_path / "empty"), str(tmp_path / "f"))
