package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the marketing-analytics successor
  * to last-touch h36: every touch in the lookback window shares the
  * conversion's value equally (linear model), reported by touch position
  * (first / middle / last), so the position-based story ("do openers or
  * closers drive value?") reads off the same table.
  *
  * Determinism: the conversion value quantizes to exact cents with ONE
  * IEEE multiply (`floor(value·100 + 0.5)` — identical on identical
  * doubles), each touch's credit is the exact integer division of
  * `cents·10⁴` by n_touches (micro-dollar units). Both Spark's `div`
  * and DuckDB's integer `//` truncate toward zero (verified empirically
  * on duckdb 1.0.0: `SELECT CAST(-7 AS BIGINT) // CAST(2 AS BIGINT)`
  * = -3, same as Spark `-7L div 2L`), so plain `div` matches the
  * oracle exactly — including for NEGATIVE conversion values (refunds).
  * All sums are integer sums.
  *
  * 100 TB posture: the touch×conversion pairing is
  * [[RangeJoin.bandedRangeJoin]] — user-key + time-bucket equi-join, never
  * a cross product; the per-conversion count/rank windows partition on the
  * conversion id (parallel across conversions); the final aggregate is
  * 3 rows. Nothing global.
  */
object Attribution {

  /** Linear multi-touch attribution of `conversions` value across
    * same-user `touches` in the trailing `windowSeconds`, summarized by
    * touch position. Output: (position, n_touches, credit_micro,
    * credit_value) — position ∈ first/middle/last (a single-touch
    * conversion counts as `first`), credit in exact micro-dollar integers
    * plus the double rendering.
    */
  def linearByPosition(touches: DataFrame, conversions: DataFrame,
      userCol: String, touchTs: String, touchId: String,
      convTs: String, convId: String, convValue: String,
      windowSeconds: Long): DataFrame = {
    val conv = conversions.select(
      col(userCol), col(convTs), col(convId),
      floor(col(convValue) * 100 + 0.5).cast("long").as("_cents"),
      (col(convTs) - expr(s"INTERVAL $windowSeconds SECONDS")).as("_w_start"))
    // bucket ≈ window/4: each conversion interval explodes onto ~5 buckets
    // (bounded replication) while buckets stay fine enough to prune pairs
    val paired = RangeJoin.bandedRangeJoin(
      touches.select(col(userCol), col(touchTs), col(touchId)),
      conv, Seq(userCol), touchTs, "_w_start", convTs,
      bucketSeconds = math.max(3600L, windowSeconds / 4))
    val w = Window.partitionBy(convId)
    val ranked = paired
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_rk", row_number().over(
        w.orderBy(col(touchTs), col(touchId))))
      .withColumn("credit_micro",
        // Spark `div` and DuckDB `//` both truncate toward zero, so this
        // matches the oracle for negative (refund) values too; _n ≥ 1
        expr("(_cents * 10000) div _n"))
      .withColumn("position",
        when(col("_rk") === 1, "first")
          .when(col("_rk") === col("_n"), "last")
          .otherwise("middle"))
    ranked.groupBy("position")
      .agg(count(lit(1)).as("n_touches"),
        sum("credit_micro").as("credit_micro"))
      .withColumn("credit_value",
        col("credit_micro").cast("double") / 1000000.0)
  }
}
