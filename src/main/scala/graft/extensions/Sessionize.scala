package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream, batch formulation:
  * a new session starts when the gap to the previous event of the same user
  * exceeds `gapSeconds`; session ids are the running count of session starts
  * (lag + cumulative sum — one shuffle on user_id, then two window passes
  * over the same partitioning, which Catalyst executes with a single sort).
  *
  * The streaming variant (graft.streaming.StreamSessionize) shares the same
  * output contract via flatMapGroupsWithState.
  */
object Sessionize {

  /** Events with their `session_n` label attached — the building block for
    * session-scoped analytics (intervals below, funnel conversion in
    * [[Funnel]]): lag + cumulative-sum over ONE (user, ts, id) sort; both
    * window passes share the partitioning, so Catalyst plans a single
    * exchange + sort.
    */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, eventIdCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(eventIdCol))
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1)
          .when(unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_n",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts", "__new_session")
  }

  /** Session intervals with FULL-precision timestamp bounds (µs) — the form
    * downstream temporal operators (e.g. range joins) must consume; the
    * formatted [[sessions]] view truncates bounds to seconds for display.
    */
  def sessionIntervals(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, eventIdCol: String = "event_id",
      valueCol: String = "value"): DataFrame =
    withSessionIds(events, userCol, tsCol, gapSeconds, eventIdCol)
      .groupBy(col(userCol), col("session_n"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("s_start"),
        max(col(tsCol)).as("s_end"),
        Det.exactSum(col(valueCol)).as("total_value"))

  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, eventIdCol: String = "event_id",
      valueCol: String = "value"): DataFrame =
    sessionIntervals(events, userCol, tsCol, gapSeconds, eventIdCol, valueCol)
      .select(col(userCol), col("session_n"), col("n_events"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        date_format(col("s_end"), "yyyy-MM-dd HH:mm:ss").as("end_s"),
        col("total_value"))
}
