package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once-per-epoch parquet sink for `foreachBatch` — the idempotent
  * re-delivery pattern a production streaming ingest needs: Structured
  * Streaming guarantees at-least-once delivery of micro-batches to
  * `foreachBatch` (a batch is re-run after failure/restart with the SAME
  * epoch id), so a plain append sink duplicates rows on recovery. Writing
  * each epoch under its own `epoch=<id>` partition with dynamic partition
  * overwrite makes re-delivery REPLACE the epoch's output instead:
  * re-running epoch N rewrites exactly partition `epoch=N` and touches
  * nothing else, so the sink converges to exactly-once content.
  *
  * Usage:
  * {{{
  * stream.writeStream.foreachBatch { (df, id) =>
  *   IdempotentSink.writeEpoch(df, id, "/lake/raw/events")
  * }.start()
  * }}}
  *
  * Scale posture: each epoch is an independent partitioned write (no read
  * of prior epochs, no global state); downstream readers see the table as
  * ordinary partitioned parquet and prune on `epoch` like any partition
  * column. Compaction of many small epoch partitions is the standard
  * periodic rewrite job, out of band.
  */
object IdempotentSink {

  def writeEpoch(df: DataFrame, epochId: Long, path: String): Unit = {
    val s = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "dynamic") // overwrite ONLY the partitions being written
    try df.withColumn("epoch", lit(epochId))
      .write.mode("overwrite").partitionBy("epoch").parquet(path)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }
}
