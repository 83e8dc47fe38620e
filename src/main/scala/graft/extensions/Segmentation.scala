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
    val n = m.agg(count(lit(1)).as("_n"))
    def score(df: DataFrame, sort: Seq[Column], out: String): DataFrame =
      Ranking.globalRowNumber(df, sort, "_r")
        .withColumn(out, Ranking.ntileFromRank(col("_r"), col("_n"), buckets))
        .drop("_r")
    val scored = score(
      score(
        score(m.crossJoin(broadcast(n)),
          Seq(col("recency_days").desc, col("entity_id")), "r_score"),
        Seq(col("frequency"), col("entity_id")), "f_score"),
      Seq(col("_mon"), col("entity_id")), "m_score")
    scored.select(
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
        col("cum_share"), col("abc_class"), col("_v").as("_vdec"),
        col("_tot"))
  }
}
