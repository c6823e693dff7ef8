"""Incremental index append via Structured Streaming.

The reference has no streaming surface — near-real-time visibility is
OpenSearch core's refresh, and incremental data becomes NEW SEGMENTS through
the same flush path that batch indexing uses (flush and merge share
writeField, JVectorWriter.java:145,163,183). Our engine mirrors that shape:

    readStream (new transcript files / Iceberg snapshots)
      -> foreachBatch(append_batch)
           each micro-batch becomes fresh doc-range segments appended after
           the highest committed segment; stats.json + dict are re-finalized
           so BM25 idf/avgdl reflect the grown corpus
      -> periodic merge_segments() compacts small streaming segments
         (the forceMerge analog)

DocID contract for appends: each batch is sorted by (conv_id, turn_idx) and
assigned docIDs from the next free segment boundary, so segment doc ranges
stay disjoint and ascending in seg_id order (the invariant merge and the
per-segment kernels rely on). Exactly-once: foreachBatch may retry a batch;
append_batch is idempotent because committed segment manifests are skipped
on retry (the same resume discipline as the batch build).
"""

from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.build import build_index, committed_segments


def append_batch(
    batch: DataFrame,
    index_dir: str,
    seg_size: int = 100_000,
    text_col: str = "text",
) -> dict:
    """Append one micro-batch of transcript turns as new segments."""
    if batch.rdd.isEmpty():
        from ..operators.build import finalize_index

        return finalize_index(batch.sparkSession, index_dir)
    done = committed_segments(index_dir)
    base_seg = (max(done) + 1) if done else 0
    base_doc = base_seg * seg_size

    # Scalable docID assignment (plans/docids offsets method) rebased to the
    # next free segment boundary. A catch-up replay after downtime can make
    # one micro-batch arbitrarily large, so the single-partition global
    # window is not acceptable here; the offsets method keeps every stage
    # multi-partition and is deterministic because (conv_id, turn_idx) is
    # unique.
    from ..plans.docids import assign_doc_ids

    assigned = assign_doc_ids(batch, ["conv_id", "turn_idx"])
    with_ids = assigned.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(base_doc)).cast("long")
    )
    try:
        return build_index(
            with_ids, index_dir, seg_size=seg_size, text_col=text_col,
            resume=True,
        )
    finally:
        persisted = getattr(assigned, "_ojs_persisted", None)
        if persisted is not None:
            persisted.unpersist()


def start_index_stream(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    schema,
    checkpoint_dir: str,
    seg_size: int = 100_000,
    max_files_per_trigger: int = 8,
):
    """File-source streaming ingestion: every new parquet file under
    input_path becomes part of the next micro-batch of index segments."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        append_batch(batch_df, index_dir, seg_size=seg_size)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
