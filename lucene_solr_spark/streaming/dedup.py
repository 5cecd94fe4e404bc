"""Cross-batch streaming signature dedup — SignatureUpdateProcessor
semantics on the NRT path (first writer wins, later arrivals with the
same signature drop), which is also the streaming exact-dedup stage of
an LLM data pipeline ingesting continuously.

ref: solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java (overwriteDupes on the update
chain; here the duplicate is dropped instead of overwritten — the
keep-first rule pinned in the batch q_dedup_exact op)

Custom STATEFUL operator: the built-in ``dropDuplicates`` on a stream
keeps its state forever; this one runs through
``applyInPandasWithState`` and, in continuous serving, evicts each
signature after a processing-time TTL so the state store is bounded
by the dedup window, not by stream lifetime — at 100 TB/day ingest
the signature state must evict or it becomes the corpus. State per
signature is a single seen-marker row; each micro-batch group is an
Arrow batch (no per-row Python).

TTL is only for continuous (``processingTime``) queries: under an
``availableNow``/``trigger_once`` drain Spark keeps the query alive
waiting to service the registered timeouts (there is no "later"), so
drain-style runs must pass ``ttl_minutes=None`` → NoTimeout. The
eviction branch itself is pinned by a direct unit test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output rows: the surviving (first-arrival) documents
_OUT_SCHEMA = "sig string, doc_id long, text string"
#: state: one marker per live signature
_STATE_SCHEMA = "seen long"


def _keep_first(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # TTL expiry: forget the signature — a later duplicate will be
        # treated as fresh (the bounded-window dedup contract)
        state.remove()
        return
    batch = pd.concat(list(pdfs), ignore_index=True)
    ttl_ms = int(batch["ttl_ms"].iloc[0])
    seen = state.exists  # duplicate of an earlier micro-batch: drop all
    state.update((1,))
    if ttl_ms > 0:
        state.setTimeoutDuration(ttl_ms)
    if not seen and len(batch) > 0:
        # within-batch duplicates resolve to the pinned keep-first
        # order (min doc_id — same rule as the batch q_dedup_exact)
        yield batch.sort_values("doc_id").iloc[:1][["sig", "doc_id", "text"]]


def stateful_dedup(
    stream: DataFrame, ttl_minutes: int | None = None
) -> DataFrame:
    """Streaming frame (doc_id, text) → surviving first-arrival rows,
    duplicates (same md5(text) signature) dropped across micro-batches
    while the signature's state lives. ``ttl_minutes`` set (continuous
    queries only — see module docstring) evicts a signature after that
    much processing time without a new arrival; ``None`` keeps state
    for the query's lifetime (drain-style runs).

    Scale shape: state is keyed by signature hash — one narrow marker
    row each, grouped state partitions by hash across executors, and
    eviction bounds the store to the TTL window's distinct-signature
    count. The text column rides only in the output projection of the
    KEPT rows; dropped duplicates never leave their executor.
    """
    ttl_ms = 0 if ttl_minutes is None else ttl_minutes * 60_000
    sigs = stream.select(
        F.md5("text").alias("sig"),
        "doc_id",
        "text",
        F.lit(ttl_ms).alias("ttl_ms"),
    )
    return sigs.groupBy("sig").applyInPandasWithState(
        _keep_first,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_minutes is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
