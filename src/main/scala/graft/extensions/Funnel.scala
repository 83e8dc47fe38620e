package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-scoped funnel conversion: within each gap-based session, did a
  * `toType` event occur at-or-after the session's FIRST `fromType` event?
  * The product-analytics primitive (click→purchase conversion) expressed
  * as composition: [[Sessionize.withSessionIds]] labeling → one window min
  * → one grouped aggregation.
  *
  * Scale shape: everything after the session labeling shares the labeling's
  * (user) hash partitioning — the first-from window and the final (user,
  * session) aggregation introduce no new exchange, so the whole funnel is
  * ONE shuffle end-to-end (PlanSpec-pinned). Session state per user is
  * bounded by the gap horizon, exactly like h4.
  */
object Funnel {

  /** One row per (user, session): `n_events`, `has_from` (0/1), `converted`
    * (0/1 — a `toType` at-or-after the first `fromType`; sessions with no
    * `fromType` are never converted).
    */
  def sessionConversion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gapSeconds: Long, fromType: String, toType: String,
      eventIdCol: String = "event_id"): DataFrame = {
    val tagged = Sessionize.withSessionIds(events, userCol, tsCol, gapSeconds, eventIdCol)
    val w = Window.partitionBy(col(userCol), col("session_n"))
    tagged
      .withColumn("__first_from",
        min(when(col(typeCol) === fromType, col(tsCol))).over(w))
      .groupBy(col(userCol), col("session_n"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col(typeCol) === fromType, 1).otherwise(0)).as("has_from"),
        max(when(col(typeCol) === toType && col(tsCol) >= col("__first_from"), 1)
          .otherwise(0)).as("converted"))
  }
}
