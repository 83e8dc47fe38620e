package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics read over activity data: users
  * grouped by first-seen week, tracked by distinct-active weeks since.
  * Weeks are integer day-offsets from a fixed anchor date divided by 7 —
  * no engine week-of-year conventions (ISO vs US week numbering disagree
  * across engines; an anchored integer division cannot).
  *
  * 100 TB posture: one scan reduces events to distinct (user, week) —
  * partial-aggregated, shuffle rows = active user-weeks, not events; the
  * per-user first-week aggregate reuses the same user partitioning; the
  * cohort join is user-keyed (co-partitioned with the first aggregate
  * under AQE); final counts partial-aggregate to cohort×offset cells.
  * Nothing after the first reduction is corpus-sized.
  */
object Retention {

  /** Weekly cohort retention matrix: (cohort_week, week_offset, n_users,
    * cohort_size, retention 4-dp). `anchorDate` is an ISO date at or
    * before the earliest event.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      anchorDate: String): DataFrame = {
    val userWeeks = events.select(col(userCol).as("u"),
      (datediff(to_date(col(tsCol)), to_date(lit(anchorDate)))).as("d"))
      .select(col("u"), expr("d div 7").as("wk"))
      .distinct()
    val first = userWeeks.groupBy("u").agg(min("wk").as("cohort_week"))
    val sizes = first.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    userWeeks.join(first, "u")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(sizes, "cohort_week")
      .withColumn("retention", Det.floorRound(
        col("n_users").cast("double") / col("cohort_size").cast("double"), 4))
      .select("cohort_week", "week_offset", "n_users", "cohort_size", "retention")
  }
}
