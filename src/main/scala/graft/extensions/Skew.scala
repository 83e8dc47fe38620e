package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB. AQE's skew-join
  * handling (on by default in Spark 4) covers sort-merge joins adaptively;
  * these cover the two shapes AQE does not: aggregation skew (one giant
  * group serializing into one reducer) and broadcast-infeasible hot-key
  * joins where the build side is too big to broadcast but the probe side's
  * key distribution is pathological.
  *
  * Measured, not assumed (ScaleBench `skewjoin`/`skewagg`, BASELINE.md):
  * with half of an 80M-row probe on one key (640 MB hot partition, above
  * AQE's 256 MB split threshold) [[saltedJoin]] ran ~25% faster than the
  * plain join while AQE's split measured no difference at all on that
  * shape; below real skew (160 MB hot partition) all variants are equal
  * and the salt's build-side replication is pure overhead. For
  * AGGREGATION the same experiment lands the other way: a plain
  * groupBy-sum/count over the identical hot-key distribution beat
  * [[saltedSumCount]] 3.5 s to 7.8 s, because hash aggregation's
  * map-side partial step already collapses the hot group to one row per
  * map partition before the shuffle — group-key skew never serializes
  * into one reducer for partial-aggregable functions. Profile with
  * [[heavyKeyProfile]] first; salt joins under real skew, and do NOT
  * salt algebraic aggregates.
  *
  * Salts are derived from `monotonically_increasing_id` — the salt value
  * never affects the RESULT (stage 2 merges across salts; the join
  * replicates the small side per salt), only the shuffle distribution, so
  * determinism of output is preserved.
  */
object Skew {

  /** Salted sum/count (two-stage aggregation packaged end-to-end): returns
    * `keys..., sum_<valueCol>, count_rows` with no single-reducer hot key.
    *
    * When to use — narrower than it looks (measured, see the object
    * scaladoc / ScaleBench `skewagg`): for partial-aggregable functions
    * like these, Spark's map-side combine already collapses a hot group to
    * one partial row per map partition, so the PLAIN groupBy beat this
    * form 3.5 s to 7.8 s under a 50%-one-key distribution — the salt's
    * second shuffle stage is pure overhead there. The two-stage skeleton
    * earns its keep only where map-side combine is absent or defeated
    * (non-mergeable accumulators built on this pattern, or engines/modes
    * without partial aggregation); it is kept oracle-proven-equivalent
    * (h37) so that swap stays safe.
    *
    * Determinism: counts and integral/decimal sums are exactly those of a
    * plain groupBy. A raw DOUBLE sum is equal only up to floating-point
    * reassociation (the two-stage reduction folds in a different order) —
    * for money columns pass `exactScale = Some(2)` to sum via DECIMAL(18,2)
    * per [[Det.exactSum]], which is order-independent and therefore
    * bit-identical to the plain groupBy and to other engines.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 32, exactScale: Option[Int] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val v = exactScale match {
      case Some(s) => col(valueCol).cast(s"decimal(18,$s)")
      case None    => col(valueCol)
    }
    val partial = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(v).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("__sum"), sum(col("__pcnt")).as("count_rows"))
    val outSum = exactScale match {
      case Some(_) => col("__sum").cast("double")
      case None    => col("__sum")
    }
    partial.select(keys.map(col) ++ Seq(outSum.as(s"sum_$valueCol"), col("count_rows")): _*)
  }

  /** Salted equi-join for a skewed probe side against a non-broadcastable
    * build side: probe rows get a salt in [0, buckets); the build side is
    * replicated once per salt value; the join key becomes (key, salt). Result
    * rows are exactly those of `probe.join(build, keys)` — each probe row
    * matches exactly one replica of each matching build row.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedProbe = probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets)).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedProbe.join(saltedBuild, keys :+ "__salt").drop("__salt")
  }

  /** Shuffle-skew diagnostic: the top-k heaviest keys with their absolute
    * counts, 6-dp share of all rows, and cumulative share — the profile you
    * read BEFORE choosing between a plain groupBy, [[saltedSumCount]], or
    * [[saltedJoin]] (a top key holding >1/partitions of the rows is the
    * skew smoking gun).
    *
    * Shape: one partial-aggregated per-key count (the same shuffle the real
    * aggregation would pay), then TakeOrderedAndProject for the top-k (≤ k
    * rows forwarded per partition, no global sort); the total broadcasts;
    * the cumulative window runs over exactly k rows. Shares divide exact
    * integers — deterministic in every engine.
    *
    * Output: (rank, key, cnt, share, cum_share) ordered by rank.
    */
  def heavyKeyProfile(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = perKey.agg(sum(col("cnt")).as("total"))
    val top = perKey.orderBy(col("cnt").desc, col("key")).limit(k)
    // bounded-window: runs over exactly the k rows the limit kept — the
    // single-partition WindowExec warning is expected and pre-adjudicated
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("key"))))
      .withColumn("cum", sum(col("cnt")).over(w))
      .select(col("rank").cast("long").as("rank"), col("key"), col("cnt"),
        Det.floorRound(col("cnt").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        Det.floorRound(col("cum").cast("double") / col("total").cast("double"), 6)
          .as("cum_share"))
  }
}
