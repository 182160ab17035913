"""Incremental dedup over arriving shards (SURVEY.md §2.10).

The reference has no streaming engine — its incrementality is file-level
idempotence (skip-if-output-exists, ``cc_net/mine.py:254-257,312-321``)
plus hash-table merging across shards (``cc_net/dedup.py:92-124``). The
Spark-native equivalent is Structured Streaming over a file source with
``foreachBatch``: each micro-batch of new docs

  1. computes its paragraph hashes,
  2. MERGEs them into the persistent hashes table
     (present-in-both => dup, exactly ``dedup.py:106-113``),
  3. probes the *merged* table to dedup the batch,
  4. appends the cleaned docs.

``Trigger.AvailableNow`` makes the same code a resumable batch job —
checkpointing (offsets + the hashes table) means a killed run resumes
where it left off, which is the north rule's checkpoint requirement
expressed with Spark's own machinery.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_net_spark.operators import exact_dedup as ed


class IncrementalDeduper:
    """foreachBatch handler holding the persistent hashes-table location."""

    def __init__(
        self,
        hashes_path: str,
        output_path: str,
        field: str = "text",
        id_col: str = "doc_id",
    ):
        self.hashes_path = hashes_path
        self.output_path = output_path
        self.field = field
        self.id_col = id_col

    def _load_hashes(self, spark: SparkSession) -> DataFrame | None:
        if not Path(self.hashes_path).exists():
            return None
        return spark.read.parquet(self.hashes_path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new_hashes = ed.build_hashes(
            ed.paragraph_hashes(batch, self.field, self.id_col)
        )
        existing = self._load_hashes(spark)
        merged = (
            ed.merge_hashes(existing, new_hashes) if existing is not None else new_hashes
        )
        # materialize merged table atomically (tmp + rename would be used on
        # a real object store; overwrite-after-cache suffices locally)
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(self.hashes_path)
        deduped = ed.remove_duplicates(
            batch, merged, self.field, self.id_col
        ).withColumn("_batch_id", F.lit(batch_id))
        deduped.write.mode("append").parquet(self.output_path)


def run_incremental_dedup(
    spark: SparkSession,
    input_path: str,
    schema: str,
    hashes_path: str,
    output_path: str,
    checkpoint_path: str,
    field: str = "text",
    id_col: str = "doc_id",
):
    """Structured Streaming file-source pipeline, AvailableNow trigger:
    processes everything currently present, checkpoints, stops."""
    dedup = IncrementalDeduper(hashes_path, output_path, field, id_col)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .json(input_path)
    )
    q = (
        stream.writeStream.foreachBatch(dedup.process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
