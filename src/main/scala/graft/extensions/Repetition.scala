package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality metrics (Rae et al. 2021, "Scaling
  * Language Models", §A1.1 quality heuristics — public paper): natural text
  * has a characteristic type/token profile; boilerplate and generated spam
  * repeat tokens and n-grams far above it. Per document:
  *
  *   - `n_tokens`, `n_types` — token count and distinct-token count;
  *   - `ttr` — type/token ratio (1.0 = no repetition);
  *   - `top_frac` — fraction of tokens that are the single most frequent
  *     token (Gopher drops docs where this exceeds ~0.2 for 2-grams);
  *   - `dup_bigram_frac` — fraction of bigram occurrences that are
  *     repeats of an already-seen bigram (1 − distinct/total).
  *
  * Scale shape: every one of these is a PER-DOCUMENT statistic, so the
  * whole family is computed inside the row — `size`/`array_distinct` over
  * the scan-side token/bigram arrays, and the max token multiplicity as
  * [[graft.functions.MaxRunLength]] over the sorted token array (one
  * codegen'd loop; a histogram per row without building one). ZERO
  * exchanges at any corpus size: the metric projection rides the scan's
  * WholeStageCodegen stage, exactly like the quality/scrub projections.
  * (The previous formulation exploded tokens and bigrams into two
  * two-level groupBy branches joined back on doc_id — four data-dependent
  * shuffles whose volume grows with corpus vocabulary. Per-doc metrics
  * never needed cross-row aggregation; plan pinned exchange-free in
  * Round8Spec, value-equality property-tested against a driver-side fold.)
  */
object Repetition {

  /** Per-doc repetition metrics. Docs with zero tokens (or null text)
    * report n_tokens=0 and null ratios; docs with fewer than two tokens
    * report null dup_bigram_frac (no bigrams exist). Ratios are int/int
    * double divisions — identical IEEE ops in every engine — displayed
    * through [[Det.floorRound]](·, 6).
    */
  def metrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val withBg = base.withColumn("bgs", {
      val n1 = size(col("toks")) - 1
      val z = arrays_zip(slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1))
      when(size(col("toks")) >= 2,
        transform(z, s => concat_ws(" ", s.getField("0"), s.getField("1"))))
        .otherwise(array().cast("array<string>"))
    })
    val nToks = size(col("toks"))
    val nBgs = size(col("bgs"))
    def ratio(num: Column, den: Column): Column =
      Det.floorRound(num.cast("double") / den.cast("double"), 6)
    val maxRun = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MaxRunLength(
        org.apache.spark.sql.GraftColumnBridge.expression(
          sort_array(col("toks")))))
    withBg.select(
      col("doc_id"),
      coalesce(nToks.cast("long"), lit(0L)).as("n_tokens"),
      coalesce(size(array_distinct(col("toks"))).cast("long"), lit(0L))
        .as("n_types"),
      when(nToks > 0, ratio(size(array_distinct(col("toks"))), nToks))
        .otherwise(lit(null).cast("double")).as("ttr"),
      when(nToks > 0, ratio(maxRun, nToks))
        .otherwise(lit(null).cast("double")).as("top_frac"),
      when(nBgs > 0, Det.floorRound(
          lit(1.0) - size(array_distinct(col("bgs"))).cast("double")
            / nBgs.cast("double"), 6))
        .otherwise(lit(null).cast("double")).as("dup_bigram_frac"))
  }
}
