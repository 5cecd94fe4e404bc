"""TopicStream (SURVEY §2.8 N4): publish-subscribe over a query.

Each ``pull()`` returns the docs matching the topic's query whose
version (here the ``ts`` column — monotone in the synthetic corpus's
doc order, Solr uses ``_version_``) is GREATER than the persisted
checkpoint, then atomically advances the checkpoint to the max version
seen — so consecutive pulls never re-deliver and a restarted consumer
resumes exactly where it left off (Solr persists topic checkpoints in
a collection; a JSON file stands in here).

Scale shape: a pull is a predicate-pushed scan (``ts > checkpoint``
reaches the Parquet row-group stats, so old data is never read) plus
the query filter — no shuffle, no state beyond the one-row checkpoint.

ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
     TopicStream.java (checkpoint read / persistCheckpoints /
     getCheckpoints on open)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_solr_spark.analyzer import tokens_col
from lucene_solr_spark.transcripts import transcripts_from_documents


class TopicStream:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        checkpoint_path: str,
        query_term: str,
        initial_checkpoint: str = "1970-01-01 00:00:00",
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.checkpoint_path = checkpoint_path
        self.query_term = query_term
        self.initial_checkpoint = initial_checkpoint

    def _read_checkpoint(self) -> str:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return json.load(f)["max_ts"]
        return self.initial_checkpoint

    def _write_checkpoint(self, max_ts: str) -> None:
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"max_ts": max_ts}, f)
        os.replace(tmp, self.checkpoint_path)  # atomic, like the manifest

    def pull(self) -> DataFrame:
        """One topic pull: new matching docs (ts > checkpoint), ordered
        by version; advances the checkpoint when anything was seen."""
        ckpt = self._read_checkpoint()
        t = transcripts_from_documents(self.spark, self.sf_dir)
        out = (
            t.withColumn("toks", tokens_col("text"))
            .filter(
                (F.col("ts") > F.lit(ckpt).cast("timestamp"))
                & F.array_contains("toks", self.query_term)
            )
            .select(
                "conv_id",
                "turn_idx",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            )
            .orderBy("ts_s", "conv_id", "turn_idx")
        )
        # bounded: the checkpoint advance needs only max(ts) — one agg
        new_max = out.agg(F.max("ts_s").alias("m")).collect()[0]["m"]
        if new_max is not None:
            self._write_checkpoint(new_max)
        return out
