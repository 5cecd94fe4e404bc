"""Incremental (NRT) index build over Structured Streaming (SURVEY
§2.8 N1/N2): the soft-commit / update-log surface re-expressed.

- Each micro-batch becomes a set of **micro-segments** appended to the
  index via a new manifest snapshot (``DirectUpdateHandler2#commit
  (openSearcher=true)`` analog): a reader opening the index after the
  batch sees it immediately — ``DirectoryReader#openIfChanged``.
- **Exactly-once**: the manifest lineage records every committed
  ``batch_id``. A replayed batch (checkpoint recovery) is recognized
  and skipped — the UpdateLog replay guard, layered on top of
  Structured Streaming's own checkpoint. Combined with the atomic
  snapshot rename, a crash mid-batch leaves the last good snapshot
  authoritative and its data files untouched.
- Micro-segments pile up exactly like Lucene NRT segments; the tiered
  :func:`lucene_solr_spark.index.merge.merge_segments` job is the
  ``ConcurrentMergeScheduler`` analog run out-of-band to compact them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark.index.build import build_index
from lucene_solr_spark.index.manifest import Manifest

#: part-id stride per micro-batch — keeps batch segment ids disjoint
BATCH_STRIDE = 10_000


class IncrementalIndexer:
    """foreachBatch sink appending micro-segments per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        out_root: str,
        parts_per_batch: int = 4,
    ):
        self.spark = spark
        self.out_root = out_root
        self.parts_per_batch = parts_per_batch

    def committed_batches(self) -> set[int]:
        m = Manifest.load(self.out_root)
        return {
            e["batch_id"] for e in m.lineage if "batch_id" in e
        }

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch body. Idempotent per batch_id."""
        if batch_id in self.committed_batches():
            return  # replay after recovery — already committed (N2)
        build_index(
            self.spark,
            batch_df,
            self.out_root,
            num_parts=self.parts_per_batch,
            resume=False,
            lineage_source=f"stream-batch-{batch_id}",
            part_offset=(int(batch_id) + 1) * BATCH_STRIDE,
            seg_prefix=f"b{int(batch_id):06d}_",
            extra_lineage={"batch_id": int(batch_id)},
        )

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_once: bool = True,
    ):
        """Attach to a streaming DataFrame. With trigger_once, drains
        all available input (Trigger.AvailableNow) then stops — the
        batch-test mode; otherwise runs continuously."""
        w = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        w = w.trigger(availableNow=True) if trigger_once else w.trigger(
            processingTime="10 seconds"
        )
        return w.start()
