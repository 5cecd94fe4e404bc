"""Iceberg-style snapshot/manifest layer (SURVEY §1.4, S9/N2).

The commit protocol mirrors Lucene's two-phase ``SegmentInfos#commit``
(write ``pending_segments_N`` → fsync → rename) and Iceberg's
snapshot model: executors write immutable segment data files; nothing
is "real" until the driver atomically publishes
``manifest/snapshot-N.json`` listing the committed segments with
per-partition metrics (terms, postings, bytes, docs) and input
lineage. Resume = set-difference between input partitions and the
last snapshot's committed partitions (UpdateLog replay analog).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any

SNAPSHOT_PREFIX = "snapshot-"

#: Index format versions (Codec name analog). 1 = crc32 term-bucket
#: clustering; 2 = vectorized FNV-1a buckets (build.py). The bucket
#: column is physical clustering only (readers push `term` predicates,
#: never recompute buckets), so v1 indexes stay READABLE; appends and
#: merges must not mix layouts within one index.
CURRENT_FORMAT = 2


@dataclass
class Manifest:
    root: str
    snapshot_id: int = 0
    segments: dict[str, dict[str, Any]] = field(default_factory=dict)
    lineage: list[dict[str, Any]] = field(default_factory=list)
    analyzer_version: str = "ascii-word-lower-v1"
    format_version: int = CURRENT_FORMAT
    #: liveDocs analog: {"path": <rel parquet of deleted keys>, "n": int}
    #: or None. Carried forward by every commit (incl. merge) — deletes
    #: are business-key tombstones, so no ord remap is ever needed.
    tombstones: dict[str, Any] | None = None

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "manifest")

    # -- global stats (Weight-binding inputs: N, avgdl) ------------------
    @property
    def n_docs(self) -> int:
        return sum(s["n_docs"] for s in self.segments.values())

    @property
    def sum_dl(self) -> int:
        return sum(s["sum_dl"] for s in self.segments.values())

    @property
    def avgdl(self) -> float:
        n = self.n_docs
        return (self.sum_dl / n) if n else 0.0

    def seg_max_dl(self, part: int) -> int | None:
        """Per-segment max doc_len from the committed stats (None for
        pre-max_dl manifests — callers fall back to a docmap scan)."""
        for s in self.segments.values():
            if s["part"] == part and "max_dl" in s:
                return int(s["max_dl"])
        return None

    def seg_dirs(self) -> list[str]:
        return [os.path.join(self.root, "segments", name) for name in sorted(self.segments)]

    def committed_parts(self) -> set[int]:
        return {s["part"] for s in self.segments.values()}

    # -- commit protocol -------------------------------------------------
    def commit(self, new_segments: dict[str, dict[str, Any]], lineage_entry: dict) -> int:
        """Atomically publish a new snapshot containing existing +
        new segments. Returns the new snapshot id."""
        self.segments.update(new_segments)
        self.lineage.append(lineage_entry)
        self.snapshot_id += 1
        os.makedirs(self.manifest_dir, exist_ok=True)
        payload = {
            "snapshot_id": self.snapshot_id,
            "format_version": self.format_version,
            "analyzer_version": self.analyzer_version,
            "segments": self.segments,
            "lineage": self.lineage,
            "global": {"n_docs": self.n_docs, "sum_dl": self.sum_dl},
            "tombstones": self.tombstones,
        }
        final = os.path.join(self.manifest_dir, f"{SNAPSHOT_PREFIX}{self.snapshot_id}.json")
        fd, tmp = tempfile.mkstemp(dir=self.manifest_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # atomic publish
        return self.snapshot_id

    def commit_replace(self, new_segments: dict[str, dict[str, Any]], lineage_entry: dict) -> int:
        """Atomically publish a snapshot whose segment set REPLACES the
        current one (compaction/merge commit: sources drop out of the
        manifest; their files become unreferenced, GC-able)."""
        self.segments = {}
        return self.commit(new_segments, lineage_entry)

    @classmethod
    def load(cls, root: str, snapshot_id: int | None = None) -> "Manifest":
        """Load the latest committed snapshot (empty manifest if none).

        ``snapshot_id`` opens a specific HISTORICAL commit point — the
        ``DirectoryReader.open(IndexCommit)`` analog (Iceberg
        time-travel): segment files are immutable and append/merge
        commits never delete files still referenced by older
        snapshots, so any retained snapshot json is a complete,
        consistent view. Raises if that snapshot was never committed."""
        mdir = os.path.join(root, "manifest")
        latest, latest_id = None, 0
        if os.path.isdir(mdir):
            for name in os.listdir(mdir):
                if name.startswith(SNAPSHOT_PREFIX) and name.endswith(".json"):
                    sid = int(name[len(SNAPSHOT_PREFIX) : -5])
                    if snapshot_id is not None:
                        if sid == snapshot_id:
                            latest, latest_id = os.path.join(mdir, name), sid
                    elif sid > latest_id:
                        latest, latest_id = os.path.join(mdir, name), sid
        if snapshot_id is not None and latest is None:
            raise ValueError(
                f"snapshot {snapshot_id} not found under {root}"
            )
        m = cls(root=root)
        if latest:
            with open(latest) as f:
                payload = json.load(f)
            m.snapshot_id = payload["snapshot_id"]
            m.segments = payload["segments"]
            m.lineage = payload.get("lineage", [])
            m.analyzer_version = payload.get("analyzer_version", m.analyzer_version)
            m.format_version = payload.get("format_version", 1)  # legacy
            m.tombstones = payload.get("tombstones")
        return m


def gc_snapshots(root: str, keep_last: int = 1) -> dict:
    """Commit-point retention — the IndexDeletionPolicy analog
    (keep_last=1 ≡ KeepOnlyLastCommitDeletionPolicy; higher values are
    the time-travel retention window). Deletes snapshot manifests
    older than the newest ``keep_last``, then removes segment dirs and
    tombstone files referenced by NO retained snapshot (files shared
    with a retained snapshot survive — segments are immutable and
    shared across commits, exactly why GC must be reference-based, not
    age-based).

    Safe ordering: manifests are deleted FIRST, so a crash mid-GC
    leaves only unreferenced data files behind (re-running completes
    the sweep); a reader can never load a manifest whose files are
    gone.

    ref: lucene/core/src/java/org/apache/lucene/index/IndexDeletionPolicy.java,
         KeepOnlyLastCommitDeletionPolicy.java / IndexFileDeleter
    """
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    mdir = os.path.join(root, "manifest")
    ids = sorted(
        int(n[len(SNAPSHOT_PREFIX):-5])
        for n in os.listdir(mdir)
        if n.startswith(SNAPSHOT_PREFIX) and n.endswith(".json")
    ) if os.path.isdir(mdir) else []
    retained, dropped = ids[-keep_last:], ids[:-keep_last]

    keep_segs: set[str] = set()
    keep_files: set[str] = set()
    for sid in retained:
        m = Manifest.load(root, snapshot_id=sid)
        keep_segs.update(m.segments)
        if m.tombstones:
            keep_files.add(m.tombstones["path"])

    for sid in dropped:  # manifests first (see docstring)
        os.remove(os.path.join(mdir, f"{SNAPSHOT_PREFIX}{sid}.json"))

    segs_removed = []
    seg_root = os.path.join(root, "segments")
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if name not in keep_segs:
                shutil.rmtree(os.path.join(seg_root, name))
                segs_removed.append(name)

    tomb_removed = []
    del_root = os.path.join(root, "deletes")
    if os.path.isdir(del_root):
        for name in sorted(os.listdir(del_root)):
            rel = f"deletes/{name}"
            if rel not in keep_files:
                os.remove(os.path.join(del_root, name))
                tomb_removed.append(rel)

    return {
        "snapshots_removed": dropped,
        "snapshots_retained": retained,
        "segments_removed": segs_removed,
        "tombstones_removed": tomb_removed,
    }
