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
    // TWO consumers (the vocabulary roll-up and the final score join) read
    // the (doc, token) aggregate — checkpoint it so the tokenize + explode
    // + aggregate chain runs once, not per consumer (round 22; guide §1.2
    // "don't compute twice"). At real scale this is the bucketed
    // (doc, token, m) table the scaladoc names.
    val docTok = docs
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("m"))
      .localCheckpoint(eager = false)
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

  /** Bigram conditional LM scoring over the same corpus-trained scheme:
    * score(doc) = Σ m(b)·ln(c(b) / c(first(b)·)) over its bigram
    * occurrences — the MLE P(w₂|w₁) with no smoothing needed because every
    * scored bigram came from the training corpus itself (self-scoring; an
    * external-corpus variant would add a backoff to [[unigramScores]]'s
    * table, same shapes). Bigrams are built with the zipped-slice shingle
    * form (codegen'd, no captured-expr recompute); the left-word
    * denominator c(w₁·) derives FROM the bigram table (group by first
    * word), never from a second tokenize. The (doc, bigram) aggregate and
    * the bigram-count table are each lazily checkpointed (round 22): Spark
    * plans no exchange reuse across the three aggregate chains, so the
    * pre-checkpoint plan re-ran the corpus explode per consumer; at real
    * scale these are the bucketed (doc, bigram, m) / (bigram, c) tables a
    * pipeline materializes once. Fixed-point micro-unit sums as in
    * [[unigramScores]]; joins
    * back without broadcast hints for the same web-scale reason. Docs
    * with < 2 tokens have no bigrams and are absent.
    */
  def bigramScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // THREE consumers read the (doc, bigram) aggregate (the bigram count
    // table — itself read twice: numerator and w1-denominator — plus the
    // final score join): checkpoint both relations so the tokenize +
    // shingle + aggregate chain runs once and the bigram-count aggregate
    // once (round 22 — the plan previously scanned the corpus three
    // times; the scaladoc's recompute-over-persist note predates lazy
    // localCheckpoint here).
    val docBg = docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.shingles2(TextOps.tokens(col(textCol)))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("m"))
      .localCheckpoint(eager = false)
    val cb = docBg.groupBy("bg").agg(sum(col("m")).as("c_bg"))
      .localCheckpoint(eager = false)
    val cw = cb.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c_bg")).as("c_w"))
    val lp = cb.join(cw, substring_index(cb("bg"), " ", 1) === cw("w1"))
      .select(col("bg"),
        floor(log(col("c_bg").cast("double") / col("c_w").cast("double")) * 1e6 + 0.5)
          .cast("long").as("q"))
    docBg.join(lp, "bg")
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_bigrams"), sum(col("m") * col("q")).as("sum_q"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_q"),
        (col("sum_q").cast("double") / (col("n_bigrams").cast("double") * 1e6))
          .as("avg_logprob"))
  }
}
