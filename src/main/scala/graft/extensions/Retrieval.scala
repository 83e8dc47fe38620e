package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — BM25 scoring (Robertson & Walker's
  * probabilistic ranking function; the public formula, e.g. Robertson &
  * Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and Beyond").
  * The missing "search" capability next to the dense-ANN operators
  * ([[Similarity]]): score only the postings of the QUERY terms, never the
  * whole term space.
  *
  * 100 TB shape — the inverted-index access path, expressed relationally:
  *   - the `isin(queryTerms)` predicate lands INSIDE the scan-side projection
  *     (filter on the exploded token before any shuffle), so the only rows
  *     that ever reach an exchange are (doc, query-term) postings — cost is
  *     proportional to the query terms' document frequency, not corpus size;
  *   - corpus stats (N, total token count) and per-term document frequencies
  *     are tiny aggregates (|terms| rows) that BROADCAST back — no second
  *     pass over the corpus joins anything big;
  *   - the final top-k is `ORDER BY ... LIMIT k` = TakeOrderedAndProject
  *     (per-partition heaps, k rows to the driver — never a global sort);
  *   - at real scale the postings table is the thing to materialize once
  *     (bucketed by term) and reuse across queries; this operator IS that
  *     table's build + probe expressed over raw docs.
  *
  * Determinism (Q contract): each (doc, term) contribution is quantized to
  * micro-units with an IDENTICAL double op tree in both engines —
  * `floor(idf · tfPart · 10⁶ + 0.5)` from integer tf/df/N/len inputs — then
  * summed as BIGINT (order-independent), with ONE final double division for
  * display. Ranking uses the exact integer score.
  */
object Retrieval {

  /** BM25 top-k: docs ranked against `queryTerms`.
    * Output: (doc_id, n_terms, score_q, score) ordered by score desc.
    *
    * @param k1 term-frequency saturation (standard 1.2)
    * @param b  length normalization (standard 0.75)
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc"), col("toks"), size(col("toks")).as("len"))
      .filter(col("len") > 0)

    // Corpus stats: one row (N docs, total token count). Broadcast.
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(col("len").cast("long")).as("sum_len"))

    // Query-term postings: the isin() filter runs on the exploded token
    // scan-side, so the (doc, term, tf) aggregate only ever sees query-term
    // hits. tf is partial-aggregated before the (doc, term) exchange.
    val postings = toks
      .select(col("doc"), col("len"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc", "len", "term")
      .agg(count(lit(1)).as("tf"))

    // Document frequency per query term: |queryTerms| rows. Broadcast back.
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))

    // Per-(doc, term) BM25 contribution in micro-units. The double tree
    // (ln of an int-derived quotient, times the saturation quotient) is
    // written identically in the DuckDB oracle.
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val avgLen = col("sum_len").cast("double") / col("n_docs")
    val tfPart = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / avgLen))
    val contrib = postings
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc"), col("term"),
        floor(idf * tfPart * 1e6 + 0.5).cast("long").as("q"))

    contrib
      .groupBy("doc")
      .agg(count(lit(1)).as("n_terms"), sum("q").as("score_q"))
      .select(col("doc").as("doc_id"), col("n_terms"), col("score_q"),
        (col("score_q").cast("double") / 1e6).as("score"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke & Buettcher
    * 2009): fuse the sparse BM25 ranking with a dense cosine-ANN ranking of
    * the same id space — `score(d) = Σ_retrievers 1/(kRrf + rank_r(d))`,
    * the standard score-free fusion modern retrieval stacks run.
    *
    * 100 TB shape: each retriever independently produces its own BOUNDED
    * top-`poolSize` candidate list (BM25 = postings-bounded +
    * TakeOrderedAndProject; dense = [[Similarity.bruteForceTopK]]'s
    * two-phase per-partition group limit, or any ANN variant with the same
    * output contract) — fusion then joins two ≤poolSize-row relations:
    * trivially broadcastable, cost independent of corpus size. The
    * rank-over-candidates windows run on poolSize rows, never the corpus.
    *
    * Determinism: ranks are exact integers (BM25 ranks on integer score_q;
    * dense ranks on the 4-dp floor-rounded cosine with id tiebreaks — the
    * h2-proven machinery), each contribution is `floor(10⁹/(kRrf+rank)+0.5)`
    * as a BIGINT, the fused score an integer sum — engine-identical, with
    * one display division.
    */
  def hybridRrfTopK(docs: DataFrame, embs: DataFrame,
      queryTerms: Seq[String], queryVecId: Long, k: Int,
      poolSize: Int = 100, kRrf: Int = 60): DataFrame = {
    // bounded-window: ranks within each candidate pool run over ≤poolSize
    // rows (never the corpus) — the single-partition WindowExec warning is
    // expected and pre-adjudicated
    val sparse = bm25TopK(docs, "doc_id", "text", queryTerms, poolSize)
      .select(col("doc_id").as("id"),
        row_number().over(Window.orderBy(col("score_q").desc, col("doc_id")))
          .cast("long").as("r_sparse"))
    val dense = Similarity.bruteForceTopK(
        embs, embs.filter(col("vec_id") === queryVecId),
        "vec_id", "embedding", poolSize)
      .select(col("neighbor_id").as("id"), col("rank").cast("long").as("r_dense"))
    def contrib(r: org.apache.spark.sql.Column) =
      coalesce(floor(lit(1e9) / (lit(kRrf.toDouble) + r) + 0.5).cast("long"), lit(0L))
    sparse.join(dense, Seq("id"), "full_outer")
      .select(col("id"), col("r_sparse"), col("r_dense"),
        (contrib(col("r_sparse")) + contrib(col("r_dense"))).as("rrf_q"))
      .withColumn("rrf", col("rrf_q").cast("double") / 1e9)
      .orderBy(col("rrf_q").desc, col("id"))
      .limit(k)
  }
}
