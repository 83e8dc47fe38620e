package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile estimation — the mergeable-sketch answer to
  * per-group quantiles at scale. Exact per-group percentiles need a full
  * sort (or Spark's approx_percentile, whose interpolation is
  * engine-internal and unreproducible elsewhere — see the Q determinism
  * contract); a fixed-width histogram is a tiny, order-independent,
  * perfectly mergeable summary whose quantile answers are deterministic
  * integers: the lower bound of the first bin where the cumulative count
  * crosses the rank.
  *
  * Scale shape: binning is a scan-side projection; the aggregation is one
  * partial-aggregated shuffle with output cardinality |groups|·|bins|; the
  * cumulative window runs over ≤ |bins| rows per group. Nothing grows with
  * row count — this is how a 100 TB pipeline reports p50/p90 per slice.
  *
  * Rank predicates are kept in integer arithmetic (`cum·2 ≥ total`,
  * `cum·10 ≥ total·9`) — no double division anywhere, so any engine
  * reproduces the bins exactly.
  */
object Histograms {

  /** Bin index of `v` under fixed width `binWidth` (floor division —
    * identical IEEE op in every engine for exact-decimal inputs).
    */
  def bin(v: Column, binWidth: Double): Column =
    floor(v / binWidth).cast("int")

  /** Per-group histogram p50/p90 estimates: (group, n, p50_lo, p90_lo)
    * where pXX_lo = binWidth · (first bin whose cumulative count reaches
    * the rank) — the quantile's bin lower bound.
    */
  def quantileEstimates(df: DataFrame, groupCol: String, valCol: String,
      binWidth: Double): DataFrame = {
    val binned = df.select(col(groupCol).as("grp"), bin(col(valCol), binWidth).as("b"))
      .groupBy("grp", "b").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("grp").orderBy("b")
    val wAll = Window.partitionBy("grp")
    binned
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wAll))
      .groupBy("grp")
      .agg(max(col("total")).as("n"),
        (min(when(col("cum") * 2 >= col("total"), col("b"))) * binWidth).as("p50_lo"),
        (min(when(col("cum") * 10 >= col("total") * 9, col("b"))) * binWidth).as("p90_lo"))
  }
}
