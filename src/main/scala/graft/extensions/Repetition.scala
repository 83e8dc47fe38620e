package graft.extensions

import org.apache.spark.sql.DataFrame
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
  * Scale shape: tokens and bigrams are derived scan-side (codegen'd
  * split/slice/zip — the arrays_zip form, NOT a lambda capturing the token
  * array: HOF lambdas inline captured expressions per element, see
  * TextOps.shingles3), then ONE explode→two-level aggregation per metric
  * family, partial-aggregated map-side. The per-(doc,token) partial agg
  * bounds shuffle volume by the VOCABULARY per doc, not token count. The
  * two aggregate branches join back on doc_id — both sides already hash-
  * partitioned on doc_id, so the join reuses the exchange.
  */
object Repetition {

  /** Per-doc repetition metrics. Docs with zero tokens report n_tokens=0
    * and null ratios; docs with a single token report null
    * dup_bigram_frac (no bigrams exist). Ratios are int/int double
    * divisions — identical IEEE ops in every engine — displayed through
    * [[Det.floorRound]](·, 6).
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
    val tokStats = withBg.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        max("c").as("top_count"))
    val bgStats = withBg.select(col("doc_id"), explode(col("bgs")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), count(lit(1)).as("n_distinct_bigrams"))
    base.select(col("doc_id"))
      .join(tokStats, Seq("doc_id"), "left")
      .join(bgStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        Det.floorRound(col("n_types").cast("double") / col("n_tokens").cast("double"), 6).as("ttr"),
        Det.floorRound(col("top_count").cast("double") / col("n_tokens").cast("double"), 6).as("top_frac"),
        Det.floorRound(lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("dup_bigram_frac"))
  }
}
