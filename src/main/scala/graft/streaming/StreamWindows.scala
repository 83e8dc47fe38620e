package graft.streaming

import graft.extensions.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregations over the events stream (reference
  * `ReadMe.md:99-100` lists streaming ingestion as a future enhancement; the
  * north star makes it a first-class surface).
  *
  * Every transform is DataFrame-in/DataFrame-out and uses only event-time
  * columns, so the SAME function body runs in batch (`spark.read`) and in
  * streaming (`spark.readStream`) — batch runs give the oracle-checkable
  * semantics, streaming runs are covered by MemoryStream suites.
  *
  * Scale posture: windowed aggregation state is keyed by (window, group key)
  * and bounded by the watermark — state store size is O(active windows ×
  * keys), independent of stream length. All aggregates are partial
  * (map-side) before the state-store shuffle.
  */
object StreamWindows {

  /** Tumbling event-time windows × event_type: count + summed value.
    * `total_value` uses [[Det.exactSum]] (order-independent decimal sum) —
    * the same contract as every batch money aggregate, so results are
    * identical across partitionings, engines, and the batch/stream boundary.
    */
  def tumblingTypeStats(events: DataFrame, watermarkDelay: String = "10 minutes",
      width: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.exactSum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding windows (width, slide) × user: per-user rolling activity. */
  def slidingUserActivity(events: DataFrame, watermarkDelay: String = "10 minutes",
      width: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), width, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Det.exactSum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Native session windows (gap-merged) per user — Spark's built-in
    * `session_window` equivalent of graft.extensions.Sessionize.
    */
  def sessionWindowStats(events: DataFrame, watermarkDelay: String = "30 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), Det.exactSum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"), col("total_value"))

  /** Streaming exact dedup on a key within the watermark horizon — the
    * streaming face of Dedup.exactGroups (state is bounded by the watermark,
    * unlike a plain dropDuplicates whose state grows forever).
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)
}
