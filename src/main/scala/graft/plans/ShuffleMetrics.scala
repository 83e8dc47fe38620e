package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Executed-plan shuffle inspection — the volume a real cluster pays.
  *
  * Exchange COUNT read off a static plan is a misleading scale proxy: a plan
  * can trade ONE corpus-sized exchange for several pair-sized ones and win
  * (the incremental-dedup per-branch verify split does exactly that — count
  * rose 15→22 while shuffled records fell 27%). What scales with the corpus
  * is the records/bytes actually WRITTEN to shuffles, which only the
  * executed plan's metrics carry. This helper executes a DataFrame and sums
  * those metrics over every physical exchange, descending through AQE
  * wrappers ([[AdaptiveSparkPlanExec]]) and query stages ([[QueryStageExec]]
  * — both LEAF nodes to a naive `plan.collect`, so the recursion is manual)
  * and skipping [[ReusedExchangeExec]] (one physical shuffle, however many
  * consumers).
  *
  * Used by the scale harness (`graft.tools.ScaleBench` mat modes) for
  * measured A/Bs, and by Round11Spec as a regression guard: the top dedup
  * consumers carry pinned record ceilings so a future edit cannot silently
  * re-inflate shuffle volume.
  */
object ShuffleMetrics {

  /** Summed write-side shuffle volume of one executed plan. */
  final case class ShuffleVolume(exchanges: Int, records: Long, bytes: Long)

  /** All physical shuffle exchanges of an EXECUTED plan, descending through
    * AQE wrappers and query stages; reused exchanges are excluded — they
    * reference a shuffle already counted, not a second physical one.
    */
  def collectShuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
    case a: AdaptiveSparkPlanExec => collectShuffles(a.executedPlan)
    case q: QueryStageExec        => collectShuffles(q.plan)
    case _: ReusedExchangeExec    => Seq.empty
    case e: ShuffleExchangeLike   => e +: e.children.flatMap(collectShuffles)
    case other                    => other.children.flatMap(collectShuffles)
  }

  /** Execute `df` (all partitions, no row transfer to the driver) and sum
    * its executed plan's shuffle write metrics. Call on a FRESHLY built
    * DataFrame: metric accumulators live on the plan's exchange nodes, so
    * re-executing the same instance would double-count.
    */
  def measure(df: DataFrame): ShuffleVolume = {
    df.queryExecution.toRdd.foreach(_ => ())
    val sh = collectShuffles(df.queryExecution.executedPlan)
    ShuffleVolume(
      sh.size,
      sh.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum,
      sh.map(_.metrics.get("dataSize").map(_.value).getOrElse(0L)).sum)
  }
}
