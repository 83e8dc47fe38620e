package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer-base segmentation over the transactional star — the marketing
  * analytics the reference's curated zone exists to serve (fact table +
  * customer dim; ReadMe.md's "customer activity" charter), expressed as
  * engine operators with exact arithmetic.
  *
  * 100 TB posture: both operators aggregate the fact table FIRST (one
  * partial-aggregated shuffle keyed on the entity), then rank the
  * entity-sized aggregate with [[Ranking]]'s two-phase construction — no
  * single-partition window ever sees more than one row per partition of
  * prefix metadata. The only corpus-sized exchange is the initial keyed
  * aggregation.
  */
object Segmentation {

  /** RFM quintile segmentation: per entity, days-since-last-activity
    * (recency), activity count (frequency), exact-decimal spend
    * (monetary), each scored 1–5 by global ntile, plus the composite
    * `rfm = r·100 + f·10 + m`. Scores use [[Ranking.globalRowNumber]] +
    * [[Ranking.ntileFromRank]] — integer math identical to the oracle's
    * `ntile(5) OVER (ORDER BY …)`. Sort orders make 5 = "best" bucket
    * count low recency/high frequency/high monetary as 1-is-low ntiles:
    * recency ranks descending (stalest first), frequency/monetary
    * ascending — matching the conventional "5 is best" reading while
    * keeping every order a unique total order (entity key tiebreak).
    *
    * All three rankings run in ONE two-phase pass (round 7; previously
    * three sequential passes — each [[Ranking.globalRowNumber]] costs a
    * RangePartitioner sampling job plus ~4 stages, and chaining them made
    * pass k's sampling recompute passes 1..k-1's whole lineage, ~12 stages
    * of pure latency). The fusion: union the three metrics into one
    * (metric, sort_value, entity) relation — recency negated so every
    * metric ranks ASCENDING, values cast to one exact decimal type so the
    * union is typable — and rank it by (metric, sort_value, entity), a
    * unique total order. All of metric i's rows precede metric i+1's and
    * each metric contributes exactly n rows, so rank-within-metric =
    * global_rank − metric·n, in pure integer math. One pivot aggregate
    * turns the 3n scored rows back into n (entity, r, f, m) rows.
    *
    * 100 TB posture: one range shuffle of 3n narrow rows replaces three
    * of n (same volume, one boundary-sampling pass), the pivot is one
    * partial-aggregated entity-keyed shuffle, and the join back to the
    * metrics is entity-keyed (broadcast at small n via AQE). Still no
    * corpus-sized single-partition window anywhere.
    */
  def rfmSegments(activity: DataFrame, entityCol: String, dateCol: String,
      amountCol: String, asOfDate: String, buckets: Int = 5): DataFrame = {
    val m = activity
      .groupBy(col(entityCol).as("entity_id"))
      .agg(
        max(col(dateCol).cast("date")).as("_last"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,2)")).as("_mon"))
      .withColumn("recency_days",
        datediff(lit(asOfDate).cast("date"), col("_last")))
      .drop("_last")
      // FIVE consumers read the per-entity metric relation (the count, the
      // three ranking branches, the final join) — checkpoint it so the
      // activity scan + aggregate run once (round 22, guide §1.2)
      .localCheckpoint(eager = false)
    val n = m.agg(count(lit(1)).as("_n"))
    // decimal(38,6) holds every metric exactly: recency/frequency are
    // integral, _mon is decimal(28,2) from the sum — all cast lossless
    def branch(idx: Int, v: Column): DataFrame =
      m.select(col("entity_id"), lit(idx).as("_metric"),
        v.cast("decimal(38,6)").as("_sv"))
    val unioned = branch(0, -col("recency_days")) // recency DESC ≡ −recency ASC
      .unionByName(branch(1, col("frequency")))
      .unionByName(branch(2, col("_mon")))
    val scored = Ranking.globalRowNumber(unioned,
        Seq(col("_metric"), col("_sv"), col("entity_id")), "_grn")
      .crossJoin(broadcast(n))
      .withColumn("_score", Ranking.ntileFromRank(
        col("_grn") - col("_metric").cast("long") * col("_n"), col("_n"), buckets))
      .groupBy("entity_id")
      .agg(
        max(when(col("_metric") === 0, col("_score"))).as("r_score"),
        max(when(col("_metric") === 1, col("_score"))).as("f_score"),
        max(when(col("_metric") === 2, col("_score"))).as("m_score"))
    m.join(scored, "entity_id").select(
      col("entity_id"), col("recency_days"), col("frequency"),
      col("_mon").cast("double").as("monetary"),
      col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
  }

  /** Pareto/ABC classification: entities ranked by descending exact-decimal
    * value; each row carries its global rank, running value sum
    * ([[Ranking.globalRunningSum]] — two-phase, no corpus-sized global
    * window), share of total (one IEEE division of exact decimals, so both
    * engines compare identically at the class boundaries), and the A/B/C
    * class at the given cumulative-share cuts.
    *
    * Output: (key, rank, value, cum_share, abc_class, value_dec,
    * total_dec). The last two are intentional exact-decimal columns —
    * the row's value and the grand total as DECIMALs — so downstream
    * class-grain rollups (e.g. h90's per-class value share) can sum and
    * divide in exact arithmetic instead of re-deriving from the IEEE
    * `value` double.
    */
  def paretoAbc(df: DataFrame, keyCol: String, value: Column,
      aCut: Double = 0.80, bCut: Double = 0.95): DataFrame = {
    val base = df.select(col(keyCol).as("key"), value.as("_v"))
    val tot = base.agg(sum("_v").as("_tot"))
    Ranking.globalRunningSum(
        base.crossJoin(broadcast(tot)),
        Seq(col("_v").desc, col("key")), col("_v"), "rank", "_cum")
      .withColumn("cum_share",
        col("_cum").cast("double") / col("_tot").cast("double"))
      .withColumn("abc_class",
        when(col("cum_share") <= aCut, "A")
          .when(col("cum_share") <= bCut, "B").otherwise("C"))
      .select(col("key"), col("rank"), col("_v").cast("double").as("value"),
        col("cum_share"), col("abc_class"), col("_v").as("value_dec"),
        col("_tot").as("total_dec"))
  }
}
