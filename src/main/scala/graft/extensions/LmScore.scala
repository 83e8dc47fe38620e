package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the classic perplexity-
  * proxy quality filter (CCNet / Wenzek et al. 2019 filter by LM score;
  * here the LM is the corpus's own unigram distribution, so no external
  * model ships): score(doc) = Σ m(t)·ln(c(t)/N) over its tokens, averaged
  * per token. Low (very negative) averages = rare-token-heavy docs
  * (gibberish, encoding junk); high = stopword soup.
  *
  * Determinism: per-token log-probabilities are quantized to micro-unit
  * longs (ln of an identical int/int double division is cross-engine safe
  * — verified for h19/h27), document sums are exact integer arithmetic
  * (order-independent), and the average is one double division — the same
  * fixed-point scheme as Similarity.kmeansStep.
  *
  * Scale shape: ONE (doc, token) partial-aggregated explode bounds all
  * downstream cardinality by per-doc vocabulary; the vocabulary table
  * (with its 1-row total crossed in) joins back WITHOUT an explicit
  * broadcast() hint on the vocab side — a hint is honored regardless of
  * build-side size and would force an oversized broadcast at web-scale
  * vocabularies, whereas leaving the choice to Catalyst/AQE broadcasts
  * under the threshold and degrades to a shuffle join on token above it.
  * (The 1-row total keeps its hint: it can never outgrow the threshold.)
  * The final per-doc aggregation partial-aggregates map-side.
  */
object LmScore {

  /** (doc_id, n_tokens, sum_q, avg_logprob): sum_q is the exact micro-unit
    * integer score; avg_logprob = sum_q / (n_tokens · 10⁶) as a double.
    */
  def unigramScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docTok = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
    val vocab = docTok.groupBy("tok").agg(sum(col("m")).as("c"))
    val total = vocab.agg(sum(col("c")).as("n_total"))
    val lp = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        floor(log(col("c").cast("double") / col("n_total").cast("double")) * 1e6 + 0.5)
          .cast("long").as("q"))
    docTok.join(lp, "tok")
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_tokens"), sum(col("m") * col("q")).as("sum_q"))
      .select(col("doc_id"), col("n_tokens"), col("sum_q"),
        (col("sum_q").cast("double") / (col("n_tokens").cast("double") * 1e6))
          .as("avg_logprob"))
  }
}
