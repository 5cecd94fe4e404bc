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
    committed: DataFrame, ops: DataFrame, fields: list[str]
) -> DataFrame:
    """Solr atomic updates: merge per-field op documents onto the
    previous doc state, in ``_version_`` order — set replaces the
    current value (wiping earlier appends), append concatenates onto
    whatever the value is AT that point in the sequence.

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
    per_field = ops.groupBy(*KEY, "field").agg(
        F.array_sort(
            F.collect_list(F.struct("_version_", "kind", "value"))
        ).alias("oplist")
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
    wide = wide.join(
        folded.groupBy(*KEY).agg(F.max("vmax").alias("_version_")), KEY
    )
    base = committed.join(F.broadcast(wide.select(*KEY)), KEY, "left_semi")
    merged = base.join(wide, KEY)
    out_cols = [
        F.concat(
            F.coalesce(F.col(f"_m_{f}.setval"), F.col(f)),
            F.coalesce(F.col(f"_m_{f}.appends"), F.lit("")),
        ).alias(f)
        for f in fields
    ]
    return merged.select(
        *KEY, *out_cols, F.col("_version_").cast("long").alias("_version_")
    )
