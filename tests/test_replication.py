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


# --- backup / restore (r4: SnapShooter / RestoreCore analogs) ---------

def test_backup_restore_roundtrip(spark, sf_dir, tmp_path):
    """Backup at snapshot N, mutate the source (delete + merge →
    snapshots N+1, N+2), restore into BOTH a fresh root and the
    mutated root: each must answer exactly as the index did at backup
    time, and the mutated root's newer snapshots must be dropped."""
    from lucene_solr_spark.index.deletes import delete_by_query
    from lucene_solr_spark.index.replication import backup, restore

    src = str(tmp_path / "src")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, src, num_parts=3, lineage_source=sf_dir)
    q = BooleanSpec(must=("merge",), k=20)
    at_backup = [tuple(r) for r in
                 IndexSearcher(spark, src).search(q, round_to=4).collect()]

    bdir = str(tmp_path / "bak")
    st = backup(src, bdir)
    assert st["n_segments"] == 3 and st["snapshot_id"] >= 1
    # the backup is itself a readable index root
    assert [tuple(r) for r in
            IndexSearcher(spark, bdir).search(q, round_to=4).collect()
            ] == at_backup

    # mutate the source past the backup point
    delete_by_query(spark, src, BooleanSpec(filters=(("role", "user"),)))
    merge_segments(spark, src, merge_factor=3)
    mutated = [tuple(r) for r in
               IndexSearcher(spark, src).search(q, round_to=4).collect()]
    assert mutated != at_backup

    # restore into a FRESH root
    fresh = str(tmp_path / "fresh")
    restore(bdir, fresh)
    assert [tuple(r) for r in
            IndexSearcher(spark, fresh).search(q, round_to=4).collect()
            ] == at_backup

    # restore OVER the mutated root: newer snapshots drop, answers revert
    st2 = restore(bdir, src)
    assert st2["snapshots_dropped"] >= 2  # delete + merge snapshots
    assert [tuple(r) for r in
            IndexSearcher(spark, src).search(q, round_to=4).collect()
            ] == at_backup


def test_backup_is_incremental(spark, sf_dir, tmp_path):
    """Re-backup after an append copies only the NEW segments
    (immutable files skip), like IndexFetcher."""
    from lucene_solr_spark.index.replication import backup

    src = str(tmp_path / "src2")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t, src, num_parts=2, lineage_source=sf_dir)
    bdir = str(tmp_path / "bak2")
    st1 = backup(src, bdir)
    assert st1["copied"] >= 2
    # append two more segments, re-backup
    build_index(spark, t.limit(500), src, num_parts=2, resume=False,
                lineage_source=sf_dir, part_offset=100, seg_prefix="app_")
    st2 = backup(src, bdir)
    assert st2["copied"] == 2 and st2["skipped"] == 2
