package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing.
  *
  * Scale posture (100 TB): everything here is a single window pass
  * partitioned by the series key — Spark shuffles once on the key and
  * sorts within partitions, the same shape as any keyed window. No
  * iteration, no driver-side state.
  */
object Timeseries {

  /** Fixed-horizon exponentially-weighted moving average: for each row,
    * `ewma = Σ_k w_k·x_{t-k} / Σ_k w_k` over the most recent
    * `weights.length` rows of the key's series (missing history terms are
    * excluded from both sums, so the leading rows are averages over the
    * history that exists).
    *
    * The recursive EWMA (`e_t = α·x_t + (1-α)·e_{t-1}`) needs an unbounded
    * sequential scan; truncating to a fixed horizon makes it a bounded set
    * of `lag`s evaluated in ONE window projection — and, because both the
    * numerator and denominator are written as the same left-associated
    * chain of literal-coefficient multiply-adds, the doubles are computed
    * with identical IEEE ops in identical order by any engine (the Q
    * determinism contract), which a `pow(α,k)` formulation would not
    * guarantee. With α=0.7 a 10-term horizon carries >97% of the recursive
    * EWMA's total weight.
    *
    * @param weights  w_0 (current row) first; decimal literals so every
    *                 engine parses bit-identical constants
    */
  def ewmaFixedHorizon(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], valueCol: String,
      weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val terms: Seq[(Column, Double)] = weights.zipWithIndex.map {
      case (wk, 0) => (col(valueCol), wk)
      case (wk, k) => (lag(col(valueCol), k).over(w), wk)
    }
    val num = terms.map { case (c, wk) => coalesce(c, lit(0.0)) * lit(wk) }
      .reduceLeft(_ + _)
    val den = terms.map { case (c, wk) =>
      when(c.isNull, lit(0.0)).otherwise(lit(wk))
    }.reduceLeft(_ + _)
    df.withColumn("ewma", num / den)
  }
}
