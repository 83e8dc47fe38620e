package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis over the reference's retail domain
  * (transactions of products per customer order,
  * `/root/reference/generate_transaction.py:51`): which item pairs appear
  * in the same basket more often than independence predicts. The text-side
  * analog is h48's PMI collocations; this is the transactional form, with
  * lift as the association measure.
  *
  * 100 TB posture: baskets dedupe to distinct (basket, item) in one
  * partial-aggregated pass, the pair enumeration is a self-EQUI-join on
  * the basket id — cost Σ|basket|² with |basket| bounded by order size
  * (single digits in retail), never |items|² — and pair counts partial-
  * aggregate before their shuffle. Item marginals join back on the item
  * key (broadcast-able: catalog-sized, not corpus-sized); the top-k is
  * TakeOrderedAndProject, so no global sort ever materializes the full
  * pair table.
  */
object Baskets {

  /** Top-`k` co-occurring item pairs by pair count (lift as the measure,
    * 4-dp): `lift = n_baskets · c(a,b) / (c(a) · c(b))` over distinct
    * (basket, item) incidences, pairs oriented `item_a < item_b`.
    */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String,
      k: Int): DataFrame = {
    val b = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val itemCnt = b.groupBy("item").agg(count(lit(1)).as("c"))
    val nB = b.agg(countDistinct(col("basket")).as("n"))
    val pairs = b.as("x")
      .join(b.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
    pairs
      .join(itemCnt.select(col("item").as("item_a"), col("c").as("c_a")), "item_a")
      .join(itemCnt.select(col("item").as("item_b"), col("c").as("c_b")), "item_b")
      .crossJoin(broadcast(nB))
      .withColumn("lift", Det.floorRound(
        col("n").cast("double") * col("pair_cnt").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")), 4))
      .select("item_a", "item_b", "pair_cnt", "c_a", "c_b", "lift")
      .orderBy(col("pair_cnt").desc, col("item_a"), col("item_b"))
      .limit(k)
  }
}
