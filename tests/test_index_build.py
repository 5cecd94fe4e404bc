"""CheckIndex-style structural invariants + per-turn text equality
(SURVEY §5: `CheckIndex.java` analog, input_hint per-row invariant)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.analyzer import tokenize_pandas
from lucene_solr_spark.index import codec
from lucene_solr_spark.index.build import build_index, build_segment_pdf, term_bucket
from lucene_solr_spark.index.manifest import Manifest
from lucene_solr_spark.transcripts import transcripts_from_documents


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx"))
    t = transcripts_from_documents(spark, sf_dir)
    m = build_index(spark, t, root, num_parts=4, lineage_source=sf_dir)
    return root, m, t


def test_manifest_globals(built, spark):
    root, m, t = built
    assert m.n_docs == t.count()
    # sum_dl == recount of analyzer token counts
    pdf = t.toPandas()
    assert m.sum_dl == int(tokenize_pandas(pdf["text"]).str.len().sum())


def test_checkindex_invariants(built, spark):
    root, m, _ = built
    for d in m.seg_dirs():
        p = pd.read_parquet(f"{d}/postings.parquet")
        terms = p["term"].tolist()
        assert terms == sorted(terms), "terms dict must be sorted"
        assert (p["df"] > 0).all()
        for _, r in p.iterrows():
            docs, tfs = codec.unpack_postings(
                np.array(r.first_docs, np.int64), np.array(r.doc_offs, np.int64),
                np.array(r.tf_offs, np.int64), r.doc_bytes, r.tf_bytes,
            )
            assert len(docs) == r.df, r.term
            assert (np.diff(docs) > 0).all(), "doc ords strictly increasing"
            assert tfs.sum() == r.cf
            assert r.bucket == term_bucket(r.term)
            mts = np.array(r.max_tfs)
            for b in range(len(mts)):
                lo, hi = b * codec.BLOCK_SIZE, min(len(tfs), (b + 1) * codec.BLOCK_SIZE)
                assert mts[b] == tfs[lo:hi].max()


def test_metrics_match_recount(built):
    root, m, _ = built
    for name, seg in m.segments.items():
        d = f"{root}/segments/{name}"
        dm = pd.read_parquet(f"{d}/docmap.parquet")
        p = pd.read_parquet(f"{d}/postings.parquet")
        assert seg["n_docs"] == len(dm)
        assert seg["sum_dl"] == int(dm["doc_len"].sum())
        # explain() reads this instead of launching a docmap-scan job
        assert seg["max_dl"] == int(dm["doc_len"].max())
        assert m.seg_max_dl(seg["part"]) == seg["max_dl"]
        assert seg["n_terms"] == len(p)
        assert seg["n_postings"] == int(p["df"].sum())


def test_per_turn_text_equality(built, spark, sf_dir):
    """input_hint mandate: per-turn text equality under stable
    (conv_id, turn_idx) ordering — docmap joined back to the source
    reproduces every turn's token stream (doc_len check) and ordering
    is dense per segment."""
    root, m, t = built
    for d in m.seg_dirs():
        dm = pd.read_parquet(f"{d}/docmap.parquet")
        srt = dm.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert (srt["doc_ord"].to_numpy() == np.arange(len(srt))).all(), (
            "doc_ord must equal the (conv_id, turn_idx) sort rank"
        )
    src = t.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    dms = pd.concat(
        [pd.read_parquet(f"{d}/docmap.parquet") for d in m.seg_dirs()]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (src["conv_id"] == dms["conv_id"]).all()
    assert (src["turn_idx"].to_numpy() == dms["turn_idx"].to_numpy()).all()
    assert (
        tokenize_pandas(src["text"]).str.len().to_numpy() == dms["doc_len"].to_numpy()
    ).all()


def test_resume_after_partial_build(spark, sf_dir, tmp_path):
    """Kill-and-resume (SURVEY §5 test_resume): a build over a subset of
    partitions commits; resuming completes only the missing partitions;
    the final index equals a from-scratch build."""
    from pyspark.sql import functions as F

    t = transcripts_from_documents(spark, sf_dir)
    part_col = F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")

    root_a = str(tmp_path / "partial")
    # simulate a crash: only parts 0 and 2 were processed+committed
    build_index(
        spark, t.filter(part_col.isin([0, 2])), root_a, num_parts=4,
        lineage_source="partial",
    )
    m1 = Manifest.load(root_a)
    assert m1.committed_parts() == {0, 2}
    # resume with the full input
    m2 = build_index(spark, t, root_a, num_parts=4, lineage_source="resume")
    assert m2.committed_parts() == {0, 1, 2, 3}
    assert m2.snapshot_id == 2

    root_b = str(tmp_path / "full")
    build_index(spark, t, root_b, num_parts=4, lineage_source="full")
    for name in m2.segments:
        a = pd.read_parquet(f"{root_a}/segments/{name}/postings.parquet")
        b = pd.read_parquet(f"{root_b}/segments/{name}/postings.parquet")
        pd.testing.assert_frame_equal(a, b)


def test_build_segment_empty_and_null_text():
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": [0, 1],
            "role": ["user", "tool"],
            "text": [None, ""],
            "tool": [None, None],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        }
    )
    seg = build_segment_pdf(pdf, seg_id=7)
    assert seg["metrics"]["n_docs"] == 2
    assert seg["metrics"]["n_terms"] == 0
    assert len(seg["postings"]) == 0


def test_signature_dedupe_build(spark, sf_dir, tmp_path):
    """SignatureUpdateProcessor (overwriteDupes): duplicated texts are
    indexed once; the kept doc is the minimum business key, so replays
    and partitioning changes cannot flip the winner."""
    from lucene_solr_spark.index.urp import signature_dedupe
    from lucene_solr_spark.query.executor import IndexSearcher
    from lucene_solr_spark.query.model import BooleanSpec

    t = transcripts_from_documents(spark, sf_dir)
    import pyspark.sql.functions as F

    dup = t.withColumn("conv_id", F.concat(F.lit("dup_"), "conv_id"))
    both = t.unionByName(dup)
    deduped = signature_dedupe(both)
    n_uniq_text = both.select("text").distinct().count()
    assert deduped.count() == n_uniq_text
    # deterministic winner: min key → never the dup_ copy when the
    # original exists
    assert deduped.filter(F.col("conv_id").startswith("dup_")).count() == 0

    root = str(tmp_path / "idx")
    build_index(spark, deduped, root, num_parts=2, lineage_source="d")
    s = IndexSearcher(spark, root)
    assert s.manifest.n_docs == n_uniq_text
    hits = s.search(BooleanSpec(must=("merge",), k=50), round_to=4)
    assert hits.filter(F.col("conv_id").startswith("dup_")).count() == 0


def test_bucket_array_matches_scalar_and_is_stable():
    """Format-v2 FNV-1a buckets: vectorized == scalar spelling on
    ASCII, multi-byte UTF-8, and shingle (space-bearing) terms; plus
    two pinned golden values so the on-disk layout contract can't
    drift silently."""
    import numpy as np

    from lucene_solr_spark.index.build import _bucket_array, term_bucket

    terms = np.array(
        ["merge", "scan", "a", "0", "table scan", "naïve", "日本語", ""],
        dtype=object,
    )
    got = _bucket_array(terms)
    assert got.tolist() == [term_bucket(t) for t in terms]
    # pinned FNV-1a 64 golden values (offset 0xCBF29CE484222325,
    # prime 0x100000001B3, mod 1024)
    assert term_bucket("") == (0xCBF29CE484222325 % 1024)
    h = 0xCBF29CE484222325
    for b_ in b"merge":
        h = ((h ^ b_) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    assert term_bucket("merge") == h % 1024


def test_format_version_round_trip_and_append_guard(spark, sf_dir, tmp_path):
    """New builds commit format_version=2; a legacy v1 manifest stays
    readable but rejects appends (no mixed bucket layouts)."""
    import json
    import os

    import pytest as _pytest

    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.index.manifest import CURRENT_FORMAT, Manifest
    from lucene_solr_spark.query.executor import IndexSearcher
    from lucene_solr_spark.transcripts import transcripts_from_documents

    root = str(tmp_path / "fmtidx")
    t = transcripts_from_documents(spark, sf_dir).limit(50)
    build_index(spark, t, root, num_parts=2, lineage_source=sf_dir)
    m = Manifest.load(root)
    assert m.format_version == CURRENT_FORMAT == 2

    # rewrite the snapshot as legacy v1: still searchable…
    mdir = os.path.join(root, "manifest")
    snap = sorted(os.listdir(mdir))[-1]
    with open(os.path.join(mdir, snap)) as f:
        payload = json.load(f)
    del payload["format_version"]
    with open(os.path.join(mdir, snap), "w") as f:
        json.dump(payload, f)
    assert Manifest.load(root).format_version == 1
    IndexSearcher(spark, root)  # readable
    # …but appending would mix layouts → refused
    with _pytest.raises(ValueError, match="format"):
        build_index(spark, t, root, num_parts=2, part_offset=100,
                    lineage_source=sf_dir)

    # a FUTURE format is unreadable
    payload["format_version"] = 99
    with open(os.path.join(mdir, snap), "w") as f:
        json.dump(payload, f)
    with _pytest.raises(ValueError, match="newer"):
        IndexSearcher(spark, root)


def test_open_historical_commit_point(spark, sf_dir, tmp_path):
    """DirectoryReader.open(IndexCommit) analog: a searcher pinned to
    snapshot 1 keeps answering from the pre-append (and pre-delete)
    view — immutable segments make old snapshots complete — while the
    latest searcher sees everything; an unknown snapshot raises."""
    import pytest as _pytest

    from lucene_solr_spark.index.deletes import delete_by_query
    from lucene_solr_spark.query.executor import IndexSearcher
    from lucene_solr_spark.query.model import BooleanSpec

    root = str(tmp_path / "tt")
    t = transcripts_from_documents(spark, sf_dir)
    first = t.filter("turn_idx < 4")
    build_index(spark, first, root, num_parts=2, lineage_source=sf_dir)
    q = BooleanSpec(must=("merge",), k=200)
    s1 = IndexSearcher(spark, root)
    at_snap1 = [tuple(r) for r in s1.search(q, round_to=4).collect()]
    n1 = s1.manifest.n_docs

    # append the rest (snapshot 2), then delete (snapshot 3)
    build_index(spark, t.filter("turn_idx >= 4"), root, num_parts=2,
                resume=False, lineage_source=sf_dir, part_offset=50,
                seg_prefix="app_")
    delete_by_query(spark, root, BooleanSpec(filters=(("role", "user"),)))

    latest = IndexSearcher(spark, root)
    assert latest.manifest.n_docs > n1
    assert latest.deleted_keys

    hist = IndexSearcher(spark, root, snapshot_id=1)
    assert hist.manifest.n_docs == n1
    assert not hist.deleted_keys  # snapshot 1 predates the tombstones
    assert [tuple(r) for r in hist.search(q, round_to=4).collect()] == at_snap1

    with _pytest.raises(ValueError, match="snapshot 99"):
        IndexSearcher(spark, root, snapshot_id=99)


def test_gc_snapshots_retention(spark, sf_dir, tmp_path):
    """IndexDeletionPolicy analog: GC keeps the newest N commit
    points, removes older manifests AND any segment/tombstone file no
    retained snapshot references; shared immutable segments survive.
    A dropped commit point stops being openable; retained ones (incl.
    time-travel) still answer."""
    import os

    from lucene_solr_spark.index.deletes import delete_by_query
    from lucene_solr_spark.index.manifest import gc_snapshots
    from lucene_solr_spark.index.merge import merge_segments
    from lucene_solr_spark.query.executor import IndexSearcher
    from lucene_solr_spark.query.model import BooleanSpec

    def snap_ids(root):
        return sorted(
            int(n[9:-5]) for n in os.listdir(f"{root}/manifest")
            if n.startswith("snapshot-") and n.endswith(".json")
        )

    root = str(tmp_path / "gidx")
    t = transcripts_from_documents(spark, sf_dir)
    build_index(spark, t.filter("turn_idx < 4"), root, num_parts=3,
                lineage_source=sf_dir)
    build_index(spark, t.filter("turn_idx >= 4"), root, num_parts=3,
                lineage_source=sf_dir, part_offset=3, seg_prefix="b")
    merge_segments(spark, root, merge_factor=2)
    pre_delete_sid = snap_ids(root)[-1]
    delete_by_query(
        spark, root, BooleanSpec(must=("merge",), filters=(("role", "user"),))
    )
    ids = snap_ids(root)
    assert len(ids) >= 4
    q = BooleanSpec(must=("merge",), k=12)
    want = [tuple(r) for r in IndexSearcher(spark, root)
            .search(q, round_to=4).collect()]
    seg_count_before = len(os.listdir(f"{root}/segments"))

    st = gc_snapshots(root, keep_last=2)  # keep merge + delete commits
    assert st["snapshots_removed"] == ids[:-2]
    assert st["snapshots_retained"] == ids[-2:]
    # the merge replaced its source segments; GC reclaims them
    assert len(st["segments_removed"]) > 0
    assert len(os.listdir(f"{root}/segments")) == (
        seg_count_before - len(st["segments_removed"])
    )

    # latest view answers identically after GC
    got = [tuple(r) for r in IndexSearcher(spark, root)
           .search(q, round_to=4).collect()]
    assert got == want
    # retained historical commit still opens (pre-delete view is wider)
    pre = IndexSearcher(spark, root, snapshot_id=pre_delete_sid).search(
        q, round_to=4
    )
    assert pre.count() >= len(want)
    # dropped commit points no longer open
    import pytest as _pt
    with _pt.raises(ValueError, match="not found"):
        IndexSearcher(spark, root, snapshot_id=ids[0])
    # idempotent re-run: nothing left to sweep
    st2 = gc_snapshots(root, keep_last=2)
    assert st2["segments_removed"] == [] and st2["snapshots_removed"] == []
    # retention floor validated
    with _pt.raises(ValueError, match="keep_last"):
        gc_snapshots(root, keep_last=0)
