package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical tests over contingency tables — the data-quality check
  * behind "did the event mix shift between segments": a chi-square test of
  * independence between two categorical columns. Complements the exact
  * moment statistics already here (e11 correlation, e12 z-scores) with a
  * categorical-association measure.
  *
  * Determinism: observed counts and marginal totals are exact integers;
  * each cell's expected value is ONE integer multiply cast to double and
  * ONE IEEE division; each cell's chi-square term is a fixed three-op IEEE
  * chain quantized to integer micro-units (the h68 KL device), so the
  * total is an order-independent integer sum — every engine agrees
  * bit-for-bit.
  *
  * 100 TB posture: one partial-aggregated cell count (shuffle rows =
  * |A|·|B| cells, not events), marginals re-aggregate the CELL table (not
  * the corpus), the 1-row grand total broadcasts, and the final chi-square
  * window runs over |A|·|B| rows only. Nothing after the first aggregate
  * touches corpus-sized data.
  */
object Stats {

  /** Chi-square independence over the (`aCol`, `bCol`) contingency table.
    * Output: one row per grid cell INCLUDING structural zeros (an
    * unobserved (a,b) combination still contributes `expected` to the
    * statistic — omitting it understates dependence; the degenerate 2×2
    * diagonal would read χ²=n/2 instead of n) — (aCol, bCol, observed,
    * expected 4-dp, term_micro) — plus the repeated table-level
    * `chi2_micro`/`chi2` (micro-unit integer sum and its double
    * rendering). The grid is the cross of the two marginal tables
    * (category-cardinality sized, broadcast-able), never a corpus join.
    */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("observed"))
    val rowT = cells.groupBy(aCol).agg(sum("observed").as("row_tot"))
    val colT = cells.groupBy(bCol).agg(sum("observed").as("col_tot"))
    val tot = cells.agg(sum("observed").as("n"))
    val e = (col("row_tot") * col("col_tot")).cast("double") / col("n").cast("double")
    val o = col("observed").cast("double")
    val withTerms = rowT.crossJoin(colT)
      .join(cells, Seq(aCol, bCol), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("expected", Det.floorRound(e, 4))
      .withColumn("term_micro",
        floor((o - e) * (o - e) / e * 1000000.0 + 0.5).cast("long"))
    // bounded-window: the global sum runs over |A|×|B| contingency cells
    // (category-cardinality-sized, corpus-independent) — the
    // single-partition WindowExec warning is expected and pre-adjudicated
    withTerms
      .withColumn("chi2_micro", sum("term_micro").over(Window.partitionBy()))
      .select(col(aCol), col(bCol), col("observed"), col("expected"),
        col("term_micro"), col("chi2_micro"),
        (col("chi2_micro").cast("double") / 1000000.0).as("chi2"))
  }

  /** Market-concentration measures per group over an exact-decimal value:
    * Herfindahl–Hirschman index `Σ shareᵢ²` and the rank-form Gini
    * coefficient `(2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)` (i = ascending rank).
    *
    * Determinism: every sum is exact DECIMAL (value, value², rank·value —
    * order-independent integer arithmetic), and each output is ONE final
    * IEEE division of exact operands, identical in any engine. HHI is
    * computed as `Σx² / (Σx)²` — algebraically Σ(xᵢ/Σx)², but with the
    * division LAST so no double ever enters a sum.
    *
    * 100 TB posture: per-entity values arrive pre-aggregated (caller does
    * the fact-table reduce); the rank is a keyed window partitioned by
    * group (parallel across groups); the final aggregate emits one row per
    * group. Nothing global, nothing single-partition.
    */
  def concentration(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val ranked = df
      .withColumn("_cc_v", v)
      .withColumn("_cc_rk", row_number().over(Window.partitionBy(groupCol)
        .orderBy(col(valueCol), col(keyCol))))
    ranked.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_entities"),
        sum("_cc_v").as("_tot"),
        sum(col("_cc_v") * col("_cc_v")).as("_sumsq"),
        sum(col("_cc_rk") * col("_cc_v")).as("_wsum"))
      .select(
        col(groupCol), col("n_entities"),
        col("_tot").cast("double").as("total_value"),
        (col("_sumsq").cast("double") /
          (col("_tot").cast("double") * col("_tot").cast("double"))).as("hhi"),
        ((lit(2) * col("_wsum") - (col("n_entities") + 1) * col("_tot")).cast("double") /
          (col("n_entities") * col("_tot")).cast("double")).as("gini"))
  }
}
