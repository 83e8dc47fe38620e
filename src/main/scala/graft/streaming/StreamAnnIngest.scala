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
  *     append (no re-scoring) — and retires the delta directory as part of
  *     the operation (see its scaladoc for the crash-window honesty); run
  *     it on the cadence the
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
    * periodic compaction job) and RETIRE the delta directory on success —
    * deletion is part of the operation because the serving path
    * ([[graft.extensions.Similarity.ivfTopKFromIndexWithDelta]]) unions
    * base and delta with no dedup: a compacted-but-unretired delta would
    * double-count every folded vector (the same row occupying two top-k
    * slots). The append itself rides
    * [[graft.extensions.Similarity.appendAssigned]] — the ONE write recipe
    * shared with appendToIvfIndex, so the two writers cannot diverge on
    * layout; `buckets` must match the table's spec (Spark rejects a
    * mismatch loudly). A crash BETWEEN the append committing and the
    * delete leaves the double-count window open until compaction re-runs
    * or the dir is removed by hand — the honest limit of a
    * non-transactional table format (the repo-wide ACID-format
    * adjudication); at that point re-running compaction would fold the
    * delta twice, so recover by deleting the dir, not re-compacting.
    * Serving keeps working through every state (missing dir reads as
    * empty).
    */
  def compactDelta(spark: SparkSession, deltaPath: String,
      assignmentTable: String, buckets: Int = 8): Unit = {
    Similarity.appendAssigned(Similarity.readDelta(spark, deltaPath),
      assignmentTable, buckets)
    val loc = new org.apache.hadoop.fs.Path(deltaPath)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }
}
