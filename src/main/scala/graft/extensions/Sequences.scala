package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics — the order-aware layer over the reference's
  * clickstream-style activity data: first-order Markov transition
  * estimates and frequent entry paths. Orders events per user by
  * (timestamp, id) — the id tiebreak makes every window total, so both
  * engines agree on sequence order even under timestamp collisions.
  *
  * 100 TB posture: both ops start from ONE window over the per-user
  * partitioning (users shuffle once; per-user event counts are bounded in
  * clickstream data). Transition counts partial-aggregate to at most
  * |types|² rows; path counts to distinct-prefix cardinality; everything
  * after the window is category-sized, not corpus-sized. The row-normalize
  * join touches the |types|² table only, and top-k paths are
  * TakeOrderedAndProject.
  */
object Sequences {

  /** First-order Markov transition matrix: (prev_type, next_type, cnt,
    * p 6-dp) with p row-normalized over prev_type. Adjacent-event pairs
    * come from ONE lead window per user.
    */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val tot = trans.groupBy("prev_type").agg(sum("cnt").as("prev_tot"))
    trans.join(tot, "prev_type")
      .withColumn("p", Det.floorRound(
        col("cnt").cast("double") / col("prev_tot").cast("double"), 6))
      .select("prev_type", "next_type", "cnt", "p")
  }

  /** Top-`k` entry paths: each user's first `len` events joined with ">"
    * into a path string, counted across users. The ordered concatenation
    * is sort_array-over-collected-(rn, type) structs — deterministic
    * because rn is a total per-user rank.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, len: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val paths = events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= len)
      .groupBy(col(userCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rn"), col(typeCol).as("t")))),
          x => x.getField("t")),
        ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** Gaps-and-islands consecutive-day activity streaks. Per user: streak
    * count, longest streak length (days), and that streak's start date
    * (earliest on ties). The island id is the classic `day − row_number`
    * constant — pure integer date math, no engine week/epoch conventions.
    *
    * Scale: the first aggregate collapses raw events to distinct
    * (user, day) — the only corpus-sized shuffle; the windows and island
    * aggregates all reuse the user partitioning, and output is one row
    * per user.
    */
  def activityStreaks(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol)
    val days = events
      .select(col(userCol), col(tsCol).cast("date").as("day"))
      .distinct()
    val islands = days.withColumn("grp",
      date_sub(col("day"),
        row_number().over(byUser.orderBy("day"))))
    val streaks = islands.groupBy(col(userCol), col("grp"))
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    streaks
      .withColumn("rk", row_number().over(
        byUser.orderBy(col("len").desc, col("start_day"))))
      .withColumn("n_streaks", count(lit(1)).over(byUser))
      .filter(col("rk") === 1)
      .select(col(userCol), col("n_streaks"), col("len").as("longest_days"),
        date_format(col("start_day"), "yyyy-MM-dd").as("streak_start"))
  }
}
