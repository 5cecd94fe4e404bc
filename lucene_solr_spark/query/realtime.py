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
