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

  /** Decile curriculum buckets from the mergeable histogram: bin the value
    * column, find the 9 decile boundary BINS from the cumulative histogram
    * (`cum·10 ≥ total·d`, pure integer rank math), assign every row the
    * count of boundary bins at or below its own bin, and report per-decile
    * stats. All docs in one bin share a decile (sketch semantics — decile
    * sizes are N/10 up to bin granularity), every comparison is on integer
    * bin indices, so any engine reproduces the buckets exactly. This is how
    * a curriculum/length-bucketing stage orders 100 TB by sequence length
    * without ever sorting it.
    *
    * Shape: ONE scan-side binning projection + one partial-aggregated bin
    * count (output ≤ |bins| rows, corpus-size-independent); the cumulative
    * window and the 9-way boundary derivation run over that tiny relation;
    * the ≤9-row boundary table broadcasts back onto a second scan-side
    * projection (sum of 9 integer comparisons); per-decile stats are one
    * more partial aggregate. Nothing but the two scans grows with rows.
    *
    * Output: (decile, n_rows, min_val, max_val, sum_val) ordered by decile.
    */
  def decileBuckets(df: DataFrame, valCol: String, binWidth: Double): DataFrame = {
    val vals = df.select(col(valCol).cast("long").as("v"),
      bin(col(valCol), binWidth).as("b"))
    val bins = vals.groupBy("b").agg(count(lit(1)).as("c"))
    // bounded-window: the cumulative window runs over <= |bins| rows
    // (corpus-independent), so the single-partition WindowExec warning is
    // expected and pre-adjudicated — same argument as quantileEstimates'
    // per-group window
    val wCum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    val cum = bins
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(bins.agg(sum(col("c")).as("total"))))
    val bounds = cum
      .select(col("b"), col("cum"), col("total"),
        explode(sequence(lit(1), lit(9))).as("d"))
      .filter(col("cum") * 10 >= col("total") * col("d"))
      .groupBy("d").agg(min(col("b")).as("bb"))
      .agg(sort_array(collect_list(col("bb"))).as("bbs"))
    vals.crossJoin(broadcast(bounds))
      .select(col("v"),
        (lit(1) + size(filter(col("bbs"), x => col("b") > x))).cast("long")
          .as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_val"),
        max(col("v")).as("max_val"), sum(col("v")).as("sum_val"))
  }
}
