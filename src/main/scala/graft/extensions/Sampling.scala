package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training pipelines. Like [[Splits]], every
  * assignment is a pure function of a stable row id (md5 buckets), never
  * `rand()`: samples are reproducible across runs, engines, partitionings,
  * and cluster layouts, and a row's keep/drop decision never changes as the
  * corpus grows — the properties a 100 TB data pipeline needs for auditable
  * dataset cards and incremental rebuilds.
  *
  * Scale shape: [[stratified]] is a pure per-row filter (no shuffle at all —
  * it evaluates inside the scan's codegen stage and pushes nothing wide);
  * [[groupTopK]] is one shuffle on the stratum key, with Catalyst's
  * InferWindowGroupLimit inserting a map-side Partial WindowGroupLimit so
  * each scan partition forwards at most k rows per stratum (see
  * Similarity.bruteForceTopK for the same pinned shape).
  */
object Sampling {

  /** Per-stratum keep predicate: row kept iff its md5 bucket (0..255, see
    * [[Splits.bucketHex]]) is below the stratum's cutoff. `rates` maps
    * stratum value → buckets-in-256 (205 ≈ 80.1%); unlisted strata use
    * `defaultBuckets`.
    */
  def stratifiedKeep(id: Column, stratum: Column,
      rates: Seq[(String, Int)], defaultBuckets: Int = 0): Column = {
    require(rates.forall { case (_, n) => n >= 0 && n <= 256 },
      "bucket counts must be 0..256")
    def cut(n: Int) = if (n >= 256) "zz" else f"$n%02x"
    val cutoff = rates.foldLeft(lit(cut(defaultBuckets))) { case (acc, (k, n)) =>
      when(stratum === k, cut(n)).otherwise(acc)
    }
    Splits.bucketHex(id) < cutoff
  }

  /** Stratified sample of `df`: keep each row iff [[stratifiedKeep]]. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultBuckets: Int = 0): DataFrame =
    df.filter(stratifiedKeep(col(idCol), col(strataCol), rates, defaultBuckets))

  /** Exactly-k-per-group deterministic sample: rank rows within each group
    * by (md5(id), id) — a pseudorandom but engine-portable total order — and
    * keep rank ≤ k. Unlike reservoir sampling, the selected set is a pure
    * function of the ids present, so it is stable under repartitioning and
    * reproducible in any engine.
    */
  def groupTopK(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
