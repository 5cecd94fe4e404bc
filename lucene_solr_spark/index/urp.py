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


# ---------------------------------------------------------------------------
# FieldMutating URP family — each stage is a NARROW Catalyst transform
# (zero shuffles; at 100 TB the whole chain rides the ingest scan).
# ref: solr/core/src/java/org/apache/solr/update/processor/
#      RegexReplaceProcessorFactory.java,
#      TrimFieldUpdateProcessorFactory.java,
#      TruncateFieldUpdateProcessorFactory.java,
#      CloneFieldUpdateProcessorFactory.java,
#      LangDetectLanguageIdentifierUpdateProcessorFactory.java
# ---------------------------------------------------------------------------


def regex_replace(df: DataFrame, field: str, pattern: str,
                  replacement: str) -> DataFrame:
    """RegexReplaceProcessor: global in-place regex substitution."""
    return df.withColumn(field, F.regexp_replace(field, pattern, replacement))


def trim_fields(df: DataFrame, fields: tuple[str, ...]) -> DataFrame:
    """TrimFieldUpdateProcessor: strip surrounding whitespace."""
    out = df
    for f in fields:
        out = out.withColumn(f, F.trim(F.col(f)))
    return out


def truncate_field(df: DataFrame, field: str, max_len: int) -> DataFrame:
    """TruncateFieldUpdateProcessor: cap the value at max_len chars."""
    if max_len <= 0:
        raise ValueError(f"maxLength must be > 0: {max_len}")
    return df.withColumn(field, F.substring(F.col(field), 1, max_len))


def clone_field(df: DataFrame, src: str, dest: str) -> DataFrame:
    """CloneFieldUpdateProcessor: copy src into a new field (the
    ingest-side copyField)."""
    return df.withColumn(dest, F.col(src))


def lang_detect(df: DataFrame, field: str = "text",
                out: str = "lang_s") -> DataFrame:
    """LangDetect URP analog: stamp the marker-lexicon argmax language
    (the same pinned heuristic + tie order as q_lang_id) onto each doc
    at ingest. Runs AFTER upstream mutating stages in a chain — the
    stamp sees the processed value, like Solr's processor order."""
    from lucene_solr_spark.operators.textpipe import _LANG_MARKERS

    toks = F.expr(
        f"regexp_extract_all(lower({field}), '[a-z0-9]+', 0)")

    def _count(marker: str):
        return F.size(F.filter(toks, lambda t: t == F.lit(marker)))

    scores = {
        lang: sum((_count(m) for m in ms), F.lit(0))
        for lang, ms in _LANG_MARKERS.items()
    }
    pred = (
        F.when((scores["query"] >= scores["data"])
               & (scores["query"] >= scores["perf"]), "query")
        .when(scores["data"] >= scores["perf"], "data")
        .otherwise("perf")
    )
    return df.withColumn(out, pred)


def urp_chain(df: DataFrame, *stages) -> DataFrame:
    """Apply URP stages in declaration order (UpdateRequestProcessor
    chain semantics — each stage sees its predecessors' output)."""
    for stage in stages:
        df = stage(df)
    return df
