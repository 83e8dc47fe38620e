package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — fixed-size frequency estimation over unbounded token
  * streams (Cormode & Muthukrishnan 2005). Complements the corpus sketches
  * already here: h19 estimates DISTINCT counts, h34 quantiles; count-min
  * answers "how often does item x occur" in O(d·w) memory with one-sided
  * error (never under-estimates).
  *
  * Engine-portable construction: row `j`'s bucket for token `t` is the
  * first 16 bits of `md5(j || ':' || t)` mod `width` — the same md5-hex
  * derivation as [[Splits]]/[[Sampling]], so a DuckDB oracle replays the
  * sketch bit-for-bit (no seeded engine hash).
  *
  * 100 TB posture: the sketch build is ONE explode (token × d rows) into a
  * partial-aggregated groupBy of at most d·w cells — map-side combine
  * collapses the stream to ≤ d·w rows PER PARTITION before the shuffle,
  * so shuffle volume is O(partitions · d · w), independent of corpus
  * size; the sketch itself (d·w rows) broadcasts to whatever probes it.
  * Sketches from disjoint corpus shards merge by cell-wise addition — the
  * same mergeability argument as the h34 histogram.
  */
object Sketches {

  private def bucket(j: Int, t: Column, width: Int): Column =
    conv(substring(md5(concat(lit(j.toString), lit(":"), t)), 1, 4), 16, 10)
      .cast("long") % width

  /** The d×w cell counts of a count-min sketch over exploded `tokenCol`
    * occurrences: (row_id, bucket, cnt), at most d·w rows.
    */
  def countMinCells(tokens: DataFrame, tokenCol: String,
      depth: Int, width: Int): DataFrame =
    tokens.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("row_id"),
          bucket(j, col(tokenCol), width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row_id").as("row_id"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Heavy hitters with their sketch estimates: the exact top-`k` tokens
    * (count desc, token tiebreak) joined against the count-min estimate
    * `min_j cells[j][bucket_j(t)]`. `overestimate = est - exact >= 0`
    * always (count-min's one-sided guarantee) — the returned column is the
    * empirical check of that bound plus a direct read on collision noise
    * at the chosen d×w.
    */
  def countMinHeavyHitters(docs: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 256, k: Int = 20): DataFrame = {
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
    val cells = countMinCells(toks, "tok", depth, width)
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(k)
    val probes = top.select(col("tok"), col("exact_cnt"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("row_id"),
          bucket(j, col("tok"), width).as("bucket"))): _*)).as("p"))
      .select(col("tok"), col("exact_cnt"),
        col("p.row_id").as("row_id"), col("p.bucket").as("bucket"))
    probes.join(broadcast(cells), Seq("row_id", "bucket"))
      .groupBy("tok", "exact_cnt")
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("tok"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overestimate"))
  }
}
