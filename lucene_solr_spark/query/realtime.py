"""Realtime get (SURVEY §2.2 P18) — Solr's /get by unique key.

ref: solr/core/src/java/org/apache/solr/handler/component/
     RealTimeGetComponent.java and solr/core/src/java/org/apache/solr/
     update/UpdateLog.java#lookup — a /get consults the uncommitted
     update log FIRST (latest version wins, deletes mask), and only
     falls back to the last-committed searcher's stored fields for keys
     the tlog doesn't know about. That ordering is what makes a freshly
     added document retrievable by id before any commit/searcher reopen.

Key model here: the transcripts unique key is (conv_id, turn_idx); the
tlog rows carry ``_version_`` (monotone per key) and ``op`` in
{'add', 'delete'}.

Scale notes: the requested id set is a /get-sized handful — it is
broadcast to both lookups, so the committed-side probe is a broadcast
semi-join the Parquet scan can prune against, and the tlog (bounded by
one commit interval of updates) resolves latest-wins with a key-window
over only its own rows. Nothing shuffles the corpus. For true
point-lookup SLAs at 100 TB the committed table should additionally be
bucketed by key so the probe touches one bucket per id (noted in
BENCH/BASELINE.md); correctness does not depend on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["conv_id", "turn_idx"]


def realtime_get(
    ids: DataFrame,
    committed: DataFrame,
    tlog: DataFrame | None = None,
    fields: list[str] | None = None,
) -> DataFrame:
    """Return the CURRENT version of each requested key.

    ``ids``: distinct (conv_id, turn_idx) rows to fetch.
    ``committed``: last-committed stored fields (one row per key),
        implicitly version 1.
    ``tlog``: uncommitted updates with columns KEY + stored fields +
        ``_version_`` (long) + ``op`` ('add' | 'delete'); may be None
        or empty (then this is a plain committed lookup).

    Output: KEY + ``fields`` + ``_version_``; keys deleted in the tlog
    or absent everywhere produce no row.
    """
    fields = fields or [c for c in committed.columns if c not in KEY]
    ids = ids.select(*KEY).distinct()

    base = (
        committed.join(F.broadcast(ids), KEY, "left_semi")
        .select(*KEY, *fields)
        .withColumn("_version_", F.lit(1).cast("long"))
    )
    if tlog is None:
        return base

    w = Window.partitionBy(*KEY).orderBy(F.desc("_version_"))
    latest = (
        tlog.join(F.broadcast(ids), KEY, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    from_tlog = latest.filter(F.col("op") == "add").select(
        *KEY, *fields, F.col("_version_").cast("long").alias("_version_")
    )
    # committed fallback only for keys the tlog has NO entry for
    # (a tlog delete masks the committed row — UpdateLog#lookup
    # returns the delete marker, and /get omits the doc).
    from_committed = base.join(latest.select(*KEY), KEY, "left_anti")
    return from_tlog.unionByName(from_committed)


def atomic_update(
    committed: DataFrame,
    ops: DataFrame,
    fields: list[str],
    num_fields: list[str] | None = None,
    arr_fields: list[str] | None = None,
) -> DataFrame:
    """Solr atomic updates: merge per-field op documents onto the
    previous doc state, in ``_version_`` order — set replaces the
    current value (wiping earlier appends), append concatenates onto
    whatever the value is AT that point in the sequence.

    Beyond the string kinds, ``num_fields`` accept ``set`` / ``inc``
    (numeric increment onto the committed value — Solr counters), and
    ``arr_fields`` (multivalued, array<string> columns) accept ``set``
    / ``add`` / ``remove`` with true element semantics: ``remove``
    drops ALL occurrences of the value from the list as it stands at
    that point in the sequence (it can remove committed elements), and
    an interleaved ``set`` resets the list. The multivalued fold is a
    single Catalyst ``aggregate`` over the version-sorted op list —
    order-exact by construction, no UDF.

    ref: solr/core/src/java/org/apache/solr/update/processor/
         AtomicUpdateDocumentMerger.java (set/add handling; the merger
         resolves the previous doc tlog-first exactly like /get) and
         solr/core/src/java/org/apache/solr/update/UpdateLog.java.

    ``ops`` columns: KEY + ``_version_`` (long) + ``field`` (string,
    one of ``fields``) + ``kind`` ('set' | 'append') + ``value``
    (string). Output: the post-merge state of the AFFECTED keys only —
    KEY + ``fields`` + ``_version_`` (highest op version applied).

    Scale shape: one groupBy on (key, field) collects each doc's op
    list (bounded by one commit window, like the tlog itself), the
    fold over the sorted list is a pure Catalyst array expression
    (no UDF), and the committed side is probed with a semi-join the
    scan can prune against — the corpus never shuffles.
    """
    num_fields = list(num_fields or [])
    arr_fields = list(arr_fields or [])
    per_field_all = ops.groupBy(*KEY, "field").agg(
        F.array_sort(
            F.collect_list(F.struct("_version_", "kind", "value"))
        ).alias("oplist")
    )
    per_field = per_field_all.filter(
        ~F.col("field").isin(num_fields + arr_fields)
    )
    # last 'set' wins as the base (committed value when none); only
    # appends AFTER that set survive, in version order
    vset = "array_max(transform(filter(oplist, x -> x.kind = 'set'), x -> x._version_))"
    folded = per_field.select(
        *KEY,
        "field",
        F.expr(f"""try_element_at(
            transform(filter(oplist, x -> x.kind = 'set' AND x._version_ = {vset}),
                      x -> x.value), 1)""").alias("setval"),
        F.expr(f"""array_join(
            transform(filter(oplist,
                             x -> x.kind = 'append'
                                  AND x._version_ > coalesce({vset}, -1L)),
                      x -> x.value), '')""").alias("appends"),
        F.expr("array_max(transform(oplist, x -> x._version_))").alias("vmax"),
    )
    wide = folded.groupBy(*KEY).pivot("field", fields).agg(
        F.first(F.struct("setval", "appends")).alias("m")
    )
    for f in fields:  # dodge the committed columns' names
        wide = wide.withColumnRenamed(f, f"_m_{f}")
    vers = per_field_all.groupBy(*KEY).agg(
        F.max(F.expr("array_max(transform(oplist, x -> x._version_))"))
        .cast("long").alias("_version_")
    )
    base = committed.join(F.broadcast(vers.select(*KEY)), KEY, "left_semi")
    merged = base.join(vers, KEY).join(wide, KEY, "left")
    out_cols = [
        F.concat(
            F.coalesce(F.col(f"_m_{f}.setval"), F.col(f)),
            F.coalesce(F.col(f"_m_{f}.appends"), F.lit("")),
        ).alias(f)
        for f in fields
    ]
    vset = ("array_max(transform(filter(oplist, x -> x.kind = 'set'), "
            "x -> x._version_))")
    if num_fields:
        nfold = per_field_all.filter(F.col("field").isin(num_fields)).select(
            *KEY,
            "field",
            F.expr(f"""try_element_at(
                transform(filter(oplist,
                                 x -> x.kind = 'set' AND x._version_ = {vset}),
                          x -> CAST(x.value AS DOUBLE)), 1)""").alias("setval"),
            F.expr(f"""aggregate(
                filter(oplist, x -> x.kind = 'inc'
                                    AND x._version_ > coalesce({vset}, -1L)),
                CAST(0.0 AS DOUBLE),
                (a, x) -> a + CAST(x.value AS DOUBLE))""").alias("incsum"),
        )
        wide_num = nfold.groupBy(*KEY).pivot("field", num_fields).agg(
            F.first(F.struct("setval", "incsum")).alias("m")
        )
        for f in num_fields:
            wide_num = wide_num.withColumnRenamed(f, f"_n_{f}")
        merged = merged.join(wide_num, KEY, "left")
        out_cols += [
            (
                F.coalesce(
                    F.col(f"_n_{f}.setval"), F.col(f).cast("double")
                )
                + F.coalesce(F.col(f"_n_{f}.incsum"), F.lit(0.0))
            ).alias(f)
            for f in num_fields
        ]
    if arr_fields:
        afold = per_field_all.filter(F.col("field").isin(arr_fields)).select(
            *KEY, "field", "oplist"
        )
        wide_arr = afold.groupBy(*KEY).pivot("field", arr_fields).agg(
            F.first("oplist").alias("m")
        )
        for f in arr_fields:
            wide_arr = wide_arr.withColumnRenamed(f, f"_a_{f}")
        merged = merged.join(wide_arr, KEY, "left")
        # one ordered fold over the op list: an interleaved set resets
        # the accumulator, remove drops every occurrence as the list
        # stands at that point (it can delete committed elements)
        out_cols += [
            F.expr(f"""aggregate(
                coalesce(_a_{f}, CAST(array() AS
                    ARRAY<STRUCT<_version_: BIGINT,
                                 kind: STRING, value: STRING>>)),
                coalesce({f}, CAST(array() AS ARRAY<STRING>)),
                (acc, x) -> CASE x.kind
                    WHEN 'set' THEN array(x.value)
                    WHEN 'add' THEN array_append(acc, x.value)
                    WHEN 'remove' THEN array_remove(acc, x.value)
                    WHEN 'removeregex' THEN filter(acc,
                        e -> NOT (e RLIKE concat('^(?:', x.value, ')$')))
                    ELSE acc END)""").alias(f)
            for f in arr_fields
        ]
    return merged.select(
        *KEY, *out_cols, F.col("_version_").cast("long").alias("_version_")
    )


#: Optimistic-concurrency sentinel semantics of the ``_version_``
#: request param (ref: solr/core/src/java/org/apache/solr/update/
#: processor/DistributedUpdateProcessor.java#getUpdatedDocument /
#: versionAdd): > 1 exact-match, 1 must-exist, < 0 must-NOT-exist,
#: 0 / null no check.
def optimistic_conflicts(current: DataFrame, ops: DataFrame) -> DataFrame:
    """Version-conflict rows (Solr's HTTP 409) for updates carrying an
    ``_expected_version_``.

    ``current``: KEY + ``_version_`` (the /get view — tlog-first).
    ``ops``: KEY + ``_expected_version_`` (long; one row per update).

    Returns KEY + ``_expected_version_`` + ``found_version`` (null =
    doc absent) for every violated expectation; empty = all clear.
    The ops side is a bounded update batch — it broadcasts, the
    current view streams past (no corpus shuffle).
    """
    o = ops.select(*KEY, "_expected_version_").filter(
        F.col("_expected_version_").isNotNull()
        & (F.col("_expected_version_") != 0)
    )
    cur = current.select(*KEY, F.col("_version_").alias("found_version"))
    j = F.broadcast(o).join(cur, KEY, "left")
    ev, fv = F.col("_expected_version_"), F.col("found_version")
    return j.filter(
        ((ev > 1) & (~fv.eqNullSafe(ev)))
        | ((ev == 1) & fv.isNull())
        | ((ev < 0) & fv.isNotNull())
    )


def assert_no_conflicts(current: DataFrame, ops: DataFrame) -> None:
    """Raise ValueError listing (a bounded sample of) conflicting keys
    — the 409 path; call before applying an optimistic batch."""
    sample = optimistic_conflicts(current, ops).limit(5).collect()
    if sample:
        raise ValueError(f"version conflict: {[tuple(r) for r in sample]}")
