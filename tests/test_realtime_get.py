"""P18 realtime get: tlog-first /get semantics.

ref: solr/core/src/java/org/apache/solr/handler/component/
     RealTimeGetComponent.java; update/UpdateLog.java#lookup

The contract under test: an uncommitted update is retrievable by id
(tlog wins, latest version wins, deletes mask), while full-text search
still serves the last commit; after the batch commits, the searcher
sees it and an empty tlog serves the same doc from the index side.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.query.executor import IndexSearcher
from lucene_solr_spark.query.model import BooleanSpec
from lucene_solr_spark.query.realtime import realtime_get
from lucene_solr_spark.transcripts import TRANSCRIPTS_SCHEMA


def _rows(spark, rows):
    return spark.createDataFrame(
        [
            (c, i, r, txt, None, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i))
            for c, i, r, txt in rows
        ],
        TRANSCRIPTS_SCHEMA,
    )


@pytest.fixture(scope="module")
def committed(spark):
    return _rows(
        spark,
        [
            ("convA", 0, "user", "alpha bravo"),
            ("convA", 1, "assistant", "charlie delta"),
            ("convB", 0, "user", "echo foxtrot"),
        ],
    )


def _ids(spark, keys):
    return spark.createDataFrame(keys, "conv_id string, turn_idx int")


def test_plain_committed_lookup(spark, committed):
    got = realtime_get(_ids(spark, [("convA", 1), ("convZ", 9)]), committed)
    rows = {(r.conv_id, r.turn_idx): r for r in got.collect()}
    assert set(rows) == {("convA", 1)}  # missing key → no row
    assert rows[("convA", 1)].role == "assistant"
    assert rows[("convA", 1)]._version_ == 1


def test_tlog_wins_latest_version_and_delete_masks(spark, committed):
    tlog = (
        _rows(
            spark,
            [
                ("convA", 0, "user", "alpha bravo EDIT1"),
                ("convA", 0, "user", "alpha bravo EDIT2"),
                ("convB", 0, "user", "gone"),
                ("convC", 7, "tool", "brand new uncommitted"),
            ],
        )
        .withColumn(
            "_version_",
            F.when(F.col("text").endswith("EDIT2"), 3)
            .when(F.col("text") == "gone", 5)
            .otherwise(2)
            .cast("long"),
        )
        .withColumn(
            "op", F.when(F.col("text") == "gone", "delete").otherwise("add")
        )
    )
    ids = _ids(
        spark, [("convA", 0), ("convA", 1), ("convB", 0), ("convC", 7)]
    )
    got = {(r.conv_id, r.turn_idx): r for r in realtime_get(ids, committed, tlog).collect()}
    # latest tlog version wins
    assert got[("convA", 0)].text == "alpha bravo EDIT2"
    assert got[("convA", 0)]._version_ == 3
    # untouched key falls back to committed
    assert got[("convA", 1)].text == "charlie delta"
    assert got[("convA", 1)]._version_ == 1
    # delete masks the committed row
    assert ("convB", 0) not in got
    # a doc that exists ONLY in the tlog is retrievable pre-commit
    assert got[("convC", 7)].text == "brand new uncommitted"


def test_rtg_before_and_after_commit(spark, committed, tmp_path):
    """The NRT story end to end: uncommitted doc is /get-visible but
    not searchable; after commit it is searchable and the drained tlog
    serves it from the committed side."""
    root = str(tmp_path / "idx")
    build_index(spark, committed, root, num_parts=2, lineage_source="t")
    s = IndexSearcher(spark, root)
    assert s.search(BooleanSpec(must=("zulu",), k=5)).count() == 0

    batch2 = _rows(spark, [("convC", 7, "tool", "zulu yankee")])
    tlog = batch2.withColumn("_version_", F.lit(2).cast("long")).withColumn(
        "op", F.lit("add")
    )
    ids = _ids(spark, [("convC", 7)])
    # pre-commit: /get sees it, search does not
    assert realtime_get(ids, committed, tlog).count() == 1
    assert s.search(BooleanSpec(must=("zulu",), k=5)).count() == 0

    # commit batch2 as an appended micro-segment
    build_index(
        spark, batch2, root, num_parts=1, resume=False,
        lineage_source="batch2", part_offset=100, seg_prefix="b2_",
    )
    s2 = IndexSearcher(spark, root)
    assert s2.search(BooleanSpec(must=("zulu",), k=5)).count() == 1
    # tlog drained: committed side now serves the same doc
    committed2 = committed.unionByName(batch2)
    row = realtime_get(ids, committed2, tlog.limit(0)).collect()[0]
    assert row.text == "zulu yankee"


# ---------------------------------------------------------------------------
# atomic updates (AtomicUpdateDocumentMerger)
# ---------------------------------------------------------------------------


def _atomic(spark, committed_rows, op_rows, fields):
    from lucene_solr_spark.query.realtime import atomic_update

    committed = spark.createDataFrame(
        committed_rows, "conv_id string, turn_idx int, role string, text string"
    )
    ops = spark.createDataFrame(
        op_rows,
        "conv_id string, turn_idx int, _version_ long, field string,"
        " kind string, value string",
    )
    got = atomic_update(committed, ops, fields=fields)
    return {
        (r["conv_id"], r["turn_idx"]): (
            tuple(r[f] for f in fields), r["_version_"]
        )
        for r in got.collect()
    }


def test_atomic_set_wipes_earlier_appends(spark):
    got = _atomic(
        spark,
        [("c1", 0, "user", "orig")],
        [
            ("c1", 0, 2, "text", "append", " a2"),
            ("c1", 0, 3, "text", "set", "reset"),
            ("c1", 0, 4, "text", "append", " a4"),
        ],
        ["role", "text"],
    )
    # v3 set wipes v2's append; v4 appends onto the set value; role
    # untouched passes through; version = highest op applied
    assert got == {("c1", 0): (("user", "reset a4"), 4)}


def test_atomic_appends_fold_in_version_order(spark):
    got = _atomic(
        spark,
        [("c1", 0, "user", "x")],
        [
            ("c1", 0, 4, "text", "append", " late"),
            ("c1", 0, 2, "text", "append", " early"),
            ("c1", 0, 3, "role", "set", "editor"),
        ],
        ["role", "text"],
    )
    assert got == {("c1", 0): (("editor", "x early late"), 4)}


def test_atomic_only_affected_keys_emitted(spark):
    got = _atomic(
        spark,
        [("c1", 0, "user", "x"), ("c2", 0, "user", "y")],
        [("c1", 0, 2, "role", "set", "editor")],
        ["role", "text"],
    )
    assert set(got) == {("c1", 0)}
    assert got[("c1", 0)] == (("editor", "x"), 2)


def _ops(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, _version_ long, "
        "field string, kind string, value string",
    )


def test_atomic_inc_numeric(spark):
    """inc adds onto the committed value; a later set resets the base
    and only incs AFTER it apply (version order)."""
    from lucene_solr_spark.query.realtime import atomic_update

    committed = spark.createDataFrame(
        [("c1", 0, 10.0), ("c2", 0, 5.0), ("c3", 0, 1.0)],
        "conv_id string, turn_idx int, votes double",
    )
    ops = _ops(spark, [
        ("c1", 0, 2, "votes", "inc", "3"),
        ("c1", 0, 3, "votes", "inc", "-1.5"),
        # set at v3 wipes the v2 inc; the v4 inc applies on top
        ("c2", 0, 2, "votes", "inc", "100"),
        ("c2", 0, 3, "votes", "set", "50"),
        ("c2", 0, 4, "votes", "inc", "7"),
    ])
    out = {
        (r.conv_id, r.turn_idx): (r.votes, r._version_)
        for r in atomic_update(
            committed, ops, fields=[], num_fields=["votes"]
        ).collect()
    }
    assert out == {("c1", 0): (11.5, 3), ("c2", 0): (57.0, 4)}


def test_atomic_add_remove_multivalued(spark):
    """Multivalued add/remove fold in version order: remove drops ALL
    occurrences as the list stands (incl. committed elements); an
    interleaved set resets the list."""
    from lucene_solr_spark.query.realtime import atomic_update

    committed = spark.createDataFrame(
        [("c1", 0, ["red", "blue", "red"]), ("c2", 0, ["x"]),
         ("c3", 0, ["keep"])],
        "conv_id string, turn_idx int, tags array<string>",
    )
    ops = _ops(spark, [
        ("c1", 0, 2, "tags", "remove", "red"),   # drops BOTH reds
        ("c1", 0, 3, "tags", "add", "green"),
        ("c1", 0, 4, "tags", "add", "blue"),     # duplicate ok
        ("c2", 0, 2, "tags", "add", "y"),
        ("c2", 0, 3, "tags", "set", "z"),        # reset wipes x,y
        ("c2", 0, 4, "tags", "add", "w"),
        ("c2", 0, 5, "tags", "remove", "missing"),  # no-op
    ])
    out = {
        (r.conv_id, r.turn_idx): (r.tags, r._version_)
        for r in atomic_update(
            committed, ops, fields=[], arr_fields=["tags"]
        ).collect()
    }
    assert out == {
        ("c1", 0): (["blue", "green", "blue"], 4),
        ("c2", 0): (["z", "w"], 5),
    }


def test_atomic_mixed_classes_one_batch(spark):
    """String append + numeric inc + multivalued add on DIFFERENT keys
    in one batch: absent classes pass committed values through."""
    from lucene_solr_spark.query.realtime import atomic_update

    committed = spark.createDataFrame(
        [("c1", 0, "hello", 1.0, ["a"]), ("c2", 0, "bye", 2.0, ["b"])],
        "conv_id string, turn_idx int, text string, votes double, "
        "tags array<string>",
    )
    ops = _ops(spark, [
        ("c1", 0, 2, "text", "append", " world"),
        ("c2", 0, 5, "votes", "inc", "1"),
        ("c2", 0, 6, "tags", "add", "c"),
    ])
    out = {
        r.conv_id: (r.text, r.votes, r.tags, r._version_)
        for r in atomic_update(
            committed, ops, fields=["text"],
            num_fields=["votes"], arr_fields=["tags"],
        ).collect()
    }
    assert out == {
        "c1": ("hello world", 1.0, ["a"], 2),
        "c2": ("bye", 3.0, ["b", "c"], 6),
    }


def test_optimistic_concurrency_contract(spark):
    """The _version_ request-param sentinels: >1 exact match, 1
    must-exist, <0 must-not-exist, 0/null no check."""
    from lucene_solr_spark.query.realtime import (
        assert_no_conflicts,
        optimistic_conflicts,
    )

    current = spark.createDataFrame(
        [("c1", 0, 7), ("c2", 0, 3)],
        "conv_id string, turn_idx int, _version_ long",
    )
    ops = spark.createDataFrame(
        [("c1", 0, 7),     # exact match ok
         ("c2", 0, 4),     # exact MISMATCH
         ("c3", 0, 1),     # must exist — absent → conflict
         ("c1", 0, -1),    # must NOT exist — present → conflict
         ("c9", 0, -1),    # must not exist ok
         ("c9", 0, 0)],    # no check
        "conv_id string, turn_idx int, _expected_version_ long",
    )
    got = {
        (r.conv_id, r._expected_version_, r.found_version)
        for r in optimistic_conflicts(current, ops).collect()
    }
    assert got == {("c2", 4, 3), ("c3", 1, None), ("c1", -1, 7)}

    import pytest as _pt
    with _pt.raises(ValueError, match="version conflict"):
        assert_no_conflicts(current, ops)
    ok = ops.filter("_expected_version_ IN (7, 0) OR conv_id = 'c9'")
    assert_no_conflicts(current, ok)  # no raise
