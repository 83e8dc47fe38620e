package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.extensions.Similarity

/** Streaming maintenance of a persisted IVF index
  * ([[graft.extensions.Similarity.buildIvfIndex]]) — the sealed-segments +
  * growing-segment pattern of production vector stores, composed from the
  * pieces this engine already has:
  *
  *   - [[ingestEpoch]] is the `foreachBatch` body: assign the micro-batch
  *     against the FROZEN persisted centroids (the
  *     [[graft.extensions.Similarity.appendToIvfIndex]] contract — one
  *     corpus-size-independent broadcast-argmax pass) and land the
  *     assigned rows through [[IdempotentSink]]'s epoch-partitioned delta
  *     layout. Structured Streaming re-delivers micro-batches
  *     at-least-once with the SAME epoch id; a direct bucketed APPEND
  *     would duplicate the batch on recovery, while the dynamic
  *     partition-overwrite epoch write REPLACES `epoch=<id>` instead — the
  *     delta converges to exactly-once content with no marker bookkeeping.
  *   - Probes serve base ∪ delta via
  *     [[graft.extensions.Similarity.ivfTopKFromIndexWithDelta]] (the base
  *     join keeps its bucket-metadata exchange elimination; the delta join
  *     pays only the delta's size).
  *   - [[compactDelta]] folds accumulated epochs into the bucketed base —
  *     the rows are ALREADY assigned, so compaction is a pure bucketed
  *     append (no re-scoring). Retire the delta directory afterwards, out
  *     of band like every compaction; run it on the cadence the
  *     [[graft.extensions.Similarity.ivfStaleness]] profile adjudicates
  *     (the same profile decides when a full rebuild refreshes the frozen
  *     centroids themselves).
  *
  * StreamingSpec pins batch↔stream equivalence (streamed epochs probe
  * identically to the same batches appended directly), re-delivery
  * idempotence, and compaction equality.
  */
object StreamAnnIngest {

  /** `foreachBatch` body: frozen-centroid assignment → idempotent epoch
    * write under `deltaPath`.
    */
  def ingestEpoch(batch: DataFrame, epochId: Long, idCol: String,
      vecCol: String, centroidsTable: String, deltaPath: String): Unit =
    IdempotentSink.writeEpoch(
      Similarity.assignToFrozenCentroids(batch, idCol, vecCol, centroidsTable),
      epochId, deltaPath)

  /** Fold the delta epochs into the bucketed base assignment table (the
    * periodic compaction job). `buckets` must match the table's spec —
    * Spark rejects a mismatch loudly.
    */
  def compactDelta(spark: SparkSession, deltaPath: String,
      assignmentTable: String, buckets: Int = 8): Unit =
    spark.read.parquet(deltaPath).select("neighbor_id", "cid", "cv")
      .write.mode("append")
      .bucketBy(buckets, "cid").sortBy("cid")
      .format("parquet").saveAsTable(assignmentTable)
}
