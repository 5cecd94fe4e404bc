"""Update request processors (ingest-time transforms).

ref: solr/core/src/java/org/apache/solr/update/processor/
     SignatureUpdateProcessorFactory.java — computes a signature of
     the configured fields per document; with overwriteDupes the
     signature acts as a unique key, so only one document per exact
     signature reaches the index. Spark-first shape: one shuffle on
     the signature (hash-partitioned, the same cost class as any
     exact-dedup groupBy), deterministic winner = minimum business key
     (batch ingest has no 'last writer', so the pinned rule makes the
     result partitioning- and replay-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def signature_dedupe(
    df: DataFrame,
    fields: tuple[str, ...] = ("text",),
    key: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Keep exactly one row per md5-signature of ``fields`` (the
    exact-signature / overwriteDupes mode; TextProfileSignature's
    fuzzy mode is the MinHash family in operators/textpipe.py)."""
    sig = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(f).cast("string"), F.lit("")) for f in fields]))
    w = Window.partitionBy("_sig").orderBy(*[F.col(k) for k in key])
    return (
        df.withColumn("_sig", sig)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_sig", "_rn")
    )
