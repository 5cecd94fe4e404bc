"""Index replication (SURVEY §2.1 S12) — leader→follower segment sync.

ref: solr/core/src/java/org/apache/solr/handler/ReplicationHandler.java
     and IndexFetcher.java: the follower polls the leader's latest
     commit generation; if behind, it fetches ONLY the files it lacks
     (segment files are immutable, so presence = validity), installs
     them, then atomically switches to the new commit point and deletes
     files the new commit no longer references.

Mapping here: "commit generation" = manifest ``snapshot_id``;
"fetch file list" = the snapshot's segment dict; the atomic switch =
publishing the leader's snapshot json via tmp-write + rename (the same
two-phase publish `index/manifest.py` uses for builds — nothing is
real on the follower until its snapshot-N.json lands). A crash
mid-copy leaves the follower on its old snapshot with some extra
unreferenced dirs, which the next sync's cleanup removes.

Scale note: this is an ops-plane job — segment payloads move
file-by-file (here ``shutil``; on a real deployment the same manifest
diff drives a distcp/object-store copy, and followers fetch in
parallel because segments are independent). The data plane never
blocks: readers on the follower keep serving the old snapshot until
the rename."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from lucene_solr_spark.index.manifest import SNAPSHOT_PREFIX, Manifest


def replicate(src_root: str, dst_root: str, clean: bool = True) -> dict:
    """One poll cycle: sync ``dst_root`` to the leader's latest
    snapshot. Returns {"in_sync", "snapshot_id", "copied", "skipped",
    "removed"} — ``copied`` counts segment dirs actually fetched, so a
    second cycle after a leader append copies only the new segments."""
    leader = Manifest.load(src_root)
    if leader.snapshot_id == 0:
        raise ValueError(f"no committed snapshot under {src_root}")
    follower = Manifest.load(dst_root)
    if follower.snapshot_id == leader.snapshot_id:
        return {
            "in_sync": True,
            "snapshot_id": leader.snapshot_id,
            "copied": 0,
            "skipped": len(leader.segments),
            "removed": 0,
        }

    seg_dst_base = os.path.join(dst_root, "segments")
    os.makedirs(seg_dst_base, exist_ok=True)
    copied = skipped = 0
    for name in sorted(leader.segments):
        dst = os.path.join(seg_dst_base, name)
        if os.path.isdir(dst):
            skipped += 1  # immutable segment already fetched
            continue
        tmp = dst + ".fetch"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # stale partial fetch from a crash
        shutil.copytree(os.path.join(src_root, "segments", name), tmp)
        os.rename(tmp, dst)
        copied += 1

    # tombstone file travels with the snapshot (IndexFetcher treats it
    # as just another commit-referenced file)
    if leader.tombstones:
        rel = leader.tombstones["path"]
        dst = os.path.join(dst_root, rel)
        if not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = dst + ".fetch"
            if os.path.exists(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
            src = os.path.join(src_root, rel)
            (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, tmp)
            os.rename(tmp, dst)
            copied += 1

    # atomic install: publish the leader's snapshot json verbatim
    src_snap = os.path.join(
        src_root, "manifest", f"{SNAPSHOT_PREFIX}{leader.snapshot_id}.json"
    )
    with open(src_snap) as f:
        payload = json.load(f)
    mdir = os.path.join(dst_root, "manifest")
    os.makedirs(mdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(mdir, f"{SNAPSHOT_PREFIX}{leader.snapshot_id}.json"))

    removed = 0
    if clean:
        live = set(leader.segments)
        for name in os.listdir(seg_dst_base):
            if name not in live:
                shutil.rmtree(os.path.join(seg_dst_base, name))
                removed += 1

    return {
        "in_sync": False,
        "snapshot_id": leader.snapshot_id,
        "copied": copied,
        "skipped": skipped,
        "removed": removed,
    }


def backup(index_root: str, backup_root: str) -> dict:
    """Point-in-time backup (ReplicationHandler ``command=backup``):
    copy exactly the files the CURRENT snapshot references — segment
    dirs are immutable, so an incremental re-backup into the same
    location copies only what changed — plus a ``backup.json`` marker
    (the backup.properties analog). The backup is itself a valid
    read-only index root.

    ref: solr/core/src/java/org/apache/solr/handler/SnapShooter.java"""
    st = replicate(index_root, backup_root, clean=True)
    m = Manifest.load(backup_root)
    marker = {
        "snapshot_id": m.snapshot_id,
        "n_docs": m.n_docs,
        "n_segments": len(m.segments),
        "source": os.path.abspath(index_root),
    }
    fd, tmp = tempfile.mkstemp(dir=backup_root, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(marker, f, indent=1, sort_keys=True)
    os.rename(tmp, os.path.join(backup_root, "backup.json"))
    return {**st, **marker}


def restore(backup_root: str, index_root: str) -> dict:
    """Restore an index root from a backup (``command=restore``):
    snapshots NEWER than the backup's are dropped first — they
    reference segment files the backup does not carry — then the
    backup's snapshot installs atomically via the replication path
    (readers on the root keep serving their old snapshot until the
    rename lands; unreferenced segment dirs are cleaned after).

    ref: solr/core/src/java/org/apache/solr/handler/RestoreCore.java"""
    b = Manifest.load(backup_root)
    if b.snapshot_id == 0:
        raise ValueError(f"no backup snapshot under {backup_root}")
    mdir = os.path.join(index_root, "manifest")
    dropped = 0
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if name.startswith(SNAPSHOT_PREFIX) and name.endswith(".json"):
                sid = int(name[len(SNAPSHOT_PREFIX):-len(".json")])
                if sid > b.snapshot_id:
                    os.remove(os.path.join(mdir, name))
                    dropped += 1
    st = replicate(backup_root, index_root, clean=True)
    return {**st, "snapshots_dropped": dropped}
