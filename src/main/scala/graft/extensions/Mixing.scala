package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-selection / data-mixing operators for training-corpus curation.
  *
  * The reference pipeline stops at a curated star schema
  * (`/root/reference/data_processing.py:253-263`); these operators cover the
  * corpus-selection stage a pre-training pipeline runs on top of it:
  * importance weighting a raw corpus toward a target distribution (DSIR,
  * Xie et al., NeurIPS 2023) and rebalancing per-domain sampling rates to a
  * target token mixture.
  *
  * Everything follows the repo determinism contract: probability ratios are
  * evaluated with an identical double op tree in Spark and DuckDB, then
  * quantized to micro-units and summed as exact integers (the h39/h47
  * scheme), so document scores are order-independent and engine-identical.
  */
object Mixing {

  /** Number of hashed unigram feature buckets (md5 first-3-hex-chars). */
  val NBuckets = 4096

  /** DSIR-style importance weights: per-document log-likelihood ratio
    * between a target-subset hashed-unigram LM and the raw-corpus LM.
    *
    * Features are hashed unigrams — `substring(md5(token), 1, 3)` buckets
    * tokens into 4096 engine-portable bins (the same md5 device as
    * `Splits`/`Sampling`). Both LMs use add-one smoothing over the bucket
    * space, so buckets unseen in the target stay finite. Per-bucket
    * log-ratio `ln((ct+1)/(Nt+B) / ((cr+1)/(Nr+B)))` is one double op tree
    * (identical in DuckDB), quantized to micro-units; a document's weight is
    * the exact integer sum Σ m(b)·q(b) over its bucket counts.
    *
    * 100 TB posture (round 22): the per-document bucket histogram is a
    * strictly per-row statistic, so it is computed IN the scan by the
    * native codegen'd [[graft.functions.TokenBucketCounts]] (bucket = the
    * md5 first-12-bit integer, the bijective image of the 3-hex-char
    * prefix — every grouping keyed on it is isomorphic to the hex form the
    * oracle replays) — no corpus-token explode, no (doc, bucket) aggregate
    * exchange at all. The exploded histogram relation (rows bounded by
    * per-doc DISTINCT buckets, ≤4096/doc, not token count) is
    * localCheckpoint'd once and feeds BOTH consumers — the round-21 form
    * re-ran tokenize+explode+aggregate per consumer: three scans, six
    * exchanges for one statistic (guide §1.2 "don't compute twice",
    * §2.4 remove shuffles). The two LMs derive from one conditional-sum
    * pass over it; the per-bucket ratio table is ≤4096 rows and broadcasts
    * back — bounded by construction, independent of corpus size.
    *
    * Output: (doc_id, n_tokens, weight_q, avg_logratio) — `weight_q` the
    * exact micro-unit integer log-weight, `avg_logratio` the per-token
    * mean as one double division (h39's rendering).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column): DataFrame = {
    val b = lit(NBuckets.toDouble)
    val docTok = docs
      .select(col(idCol).as("doc_id"), targetPred.as("in_target"),
        explode(org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.TokenBucketCounts(
            org.apache.spark.sql.GraftColumnBridge.expression(
              TextOps.tokens(col(textCol)))))).as("__e"))
      .select(col("doc_id"), col("in_target"),
        col("__e.b").as("bucket"), col("__e.cnt").as("m"))
      .localCheckpoint(eager = false)
    val lm = docTok
      .groupBy("bucket")
      .agg(sum(col("m")).as("cr"),
        sum(when(col("in_target"), col("m")).otherwise(0L)).as("ct"))
    val totals = lm.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val ratio = lm.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(
          ((col("ct").cast("double") + 1.0) / (col("nt").cast("double") + b)) /
            ((col("cr").cast("double") + 1.0) / (col("nr").cast("double") + b)))
          * 1e6 + 0.5).cast("long").as("q"))
    docTok.join(broadcast(ratio), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_tokens"), sum(col("m") * col("q")).as("weight_q"))
      .select(col("doc_id"), col("n_tokens"), col("weight_q"),
        (col("weight_q").cast("double") / (col("n_tokens").cast("double") * 1e6))
          .as("avg_logratio"))
  }

  /** DSIR's selection step: Gumbel top-k resampling — drawing k documents
    * without replacement with probability ∝ exp(log-weight) is exactly
    * "top-k by (log w + Gumbel noise)" (Gumbel-max trick; the procedure the
    * DSIR paper uses). The noise is deterministic and engine-portable: the
    * document's md5 first-byte bucket (the [[Splits]] device) gives
    * u = (bucket + 0.5)/256, and g = −ln(−ln u) — hex decoded with ascii
    * arithmetic, the whole key one identical double op tree in both
    * engines, quantized to micro-units for the final integer ordering.
    *
    * 100 TB posture: the Gumbel key is a scan-stage projection on the
    * (already tiny) per-doc weight relation; top-k is
    * TakeOrderedAndProject — ≤ k rows forwarded per partition, no global
    * sort ever materializes.
    *
    * Output: the k selected docs — (doc_id, n_tokens, weight_q, score_q,
    * score), score = log-weight + Gumbel in micro-units.
    */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val weights = dsirWeights(docs, idCol, textCol, targetPred)
    val h = md5(col("doc_id").cast("string"))
    def hexDigit(c: org.apache.spark.sql.Column) =
      ascii(c) - 48 - when(ascii(c) >= 97, 39).otherwise(0)
    val bucket = hexDigit(substring(h, 1, 1)) * 16 + hexDigit(substring(h, 2, 1))
    val u = (bucket.cast("double") + 0.5) / 256.0
    val gumbel = -log(-log(u))
    val scoreQ = floor(
      (col("weight_q").cast("double") / 1e6 + gumbel) * 1e6 + 0.5).cast("long")
    weights
      .withColumn("score_q", scoreQ)
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_tokens"), col("weight_q"), col("score_q"),
        (col("score_q").cast("double") / 1e6).as("score"))
  }

  /** Per-domain distribution drift: KL(P_domain ‖ P_corpus) over unigram
    * token distributions — the standard "how far is this slice from the
    * mixture" diagnostic when composing a training recipe (a domain with
    * near-zero KL adds little diversity; a high-KL domain shifts the
    * mixture). No smoothing is needed: every domain token occurs in the
    * corpus by construction, so every log ratio is finite.
    *
    * Determinism: per-(domain, token) term `ln((m/N_d)/(c/N))` is one
    * double op tree (identical in DuckDB), quantized to micro-nats; the
    * domain KL is the exact integer sum Σ m·q over its tokens divided by
    * N_d — order-independent, engine-identical (the [[dsirWeights]]/h39
    * scheme).
    *
    * 100 TB posture: ONE token explode feeds a partial-aggregated
    * (domain, token) count — shuffle volume bounded by per-domain distinct
    * vocabulary, not token count; the corpus distribution re-aggregates
    * that same relation (no second scan); the term join is an equi-join on
    * token between two vocabulary-sized relations; the final per-domain
    * aggregate is partial again. Nothing scales with raw corpus bytes
    * except the initial scan.
    *
    * Output: (domain, n_tokens, vocab, kl_q, kl_nats).
    */
  def domainKl(docs: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val dt = docs
      .select(col(domainCol).as("domain"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("domain", "tok")
      .agg(count(lit(1)).as("m"))
    val corpus = dt.groupBy("tok").agg(sum(col("m")).as("c"))
    val domTotals = dt.groupBy("domain").agg(sum(col("m")).as("nd"))
    val corpusTotal = corpus.agg(sum(col("c")).as("n"))
    val terms = dt.join(corpus, "tok")
      .join(domTotals, "domain")
      .crossJoin(broadcast(corpusTotal))
      .select(col("domain"), col("m"), col("nd"),
        floor(log(
          (col("m").cast("double") / col("nd").cast("double")) /
            (col("c").cast("double") / col("n").cast("double")))
          * 1e6 + 0.5).cast("long").as("q"))
    terms.groupBy("domain")
      .agg(max(col("nd")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("m") * col("q")).as("kl_q"))
      .select(col("domain"), col("n_tokens"), col("vocab"), col("kl_q"),
        (col("kl_q").cast("double") / (col("n_tokens").cast("double") * 1e6))
          .as("kl_nats"))
  }

  /** Temperature-scaled source mixture — the α-smoothing recipe
    * multilingual corpora use (mBERT/XLM-R/mT5): sampling probability
    * `p_i ∝ q_i^α` where `q_i` is source i's token share; α < 1 lifts
    * low-resource sources (α → 0 is uniform, α = 1 is proportional). The
    * output carries the integer-quantized share, the normalized sampling
    * probability, and the up-sampling factor `p_i / q_i` a sampler applies
    * per source.
    *
    * Determinism: the share quantizes to micro-units BEFORE the
    * exponentiation, and the default α = 0.5 exponentiates via `sqrt` —
    * which IEEE 754 requires to be correctly rounded, so Spark and any
    * oracle engine produce bit-identical doubles from the identical
    * quantized inputs (ln/pow only promise last-ulp-library behavior; sqrt
    * is exact). The normalization and the up-sample ratio are pure integer
    * division over the quantized values. Other α values go through `pow`,
    * whose last ulp is libm-specific — quantize more coarsely if
    * oracle-matching those.
    *
    * Shapes: per-doc token counts ride the scan (no explode), one
    * groupBy(source) over doc-sized rows, and the two totals rows broadcast
    * back — source cardinality is tiny by construction, so every join here
    * is a broadcast of a handful of rows. Sources whose quantized share is
    * zero are excluded (no finite up-sample factor is defined for them).
    */
  def temperatureMixture(docs: DataFrame, domainCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val perSource = docs
      .select(col(domainCol).as("source"),
        coalesce(size(TextOps.tokens(col(textCol))).cast("long"), lit(0L)).as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val totals = perSource.agg(sum(col("n_tokens")).as("t"))
    val share = perSource.crossJoin(broadcast(totals))
      .withColumn("share_q",
        floor(col("n_tokens").cast("double") * 1e6 / col("t").cast("double") + 0.5)
          .cast("long"))
      .filter(col("share_q") > 0)
    val shareD = col("share_q").cast("double") / 1e6
    val powCol = if (alpha == 0.5) sqrt(shareD) else pow(shareD, lit(alpha))
    val pq = share.withColumn("pow_q", floor(powCol * 1e6 + 0.5).cast("long"))
    val z = pq.agg(sum(col("pow_q")).as("z"))
    pq.crossJoin(broadcast(z))
      .withColumn("p_q", expr("CAST((pow_q * 1000000) div z AS BIGINT)"))
      .withColumn("upsample_q", expr("CAST((p_q * 1000000) div share_q AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share_q"),
        col("p_q"), col("upsample_q"),
        (col("p_q").cast("double") / 1e6).as("p"),
        (col("upsample_q").cast("double") / 1e6).as("upsample"))
  }

  /** EPOCH-CAPPED token-budget allocation (h126) — the mixture SOLVE the
    * published data recipes run after [[domainMixture]] measures shares:
    * given per-domain token counts, a total training-token `budget`, and a
    * repetition ceiling of `maxEpochsQ` micro-epochs per domain (the
    * "never sample any source more than ~E times" rule of the
    * Gopher/LLaMA-class recipes; Muennighoff et al. 2023 measure why), split
    * the budget UNIFORMLY across domains except where the ceiling binds,
    * redistributing capped domains' shortfall to the others — exact
    * water-filling, in closed form over one sorted pass:
    *
    * Sort domains by cap `c_d = (n_d · maxEpochsQ) div 10⁶` ascending (ties
    * by name). Domain at sorted position i (1-based, D domains, prefix_i =
    * Σ_{j≤i} c_j) is CAPPED iff `c_i · (D − i + 1) < B − prefix_{i−1}` —
    * the predicate is monotone along the sort (c ascending makes a failing
    * row's successors fail too), so the capped set is a PREFIX and one
    * window pass finds it. With k capped domains and `rem = B − prefix_k`:
    * every uncapped domain gets `base = rem div (D − k)` tokens, and the
    * first `rem mod (D − k)` uncapped domains (same sort order) get one
    * extra — a deterministic integer remainder rule, so Σ allocated =
    * min(B, Σ caps) EXACTLY and no double ever appears. The uncapped
    * allocation can never exceed its own cap: the smallest uncapped c
    * satisfies `c·(D−k) ≥ rem`, hence `c ≥ ceil(rem/(D−k)) ≥ base + extra`.
    *
    * 100 TB posture: the input is the DOMAIN relation (already aggregated —
    * corpus-independent cardinality), so the sort window and the one-row
    * totals broadcast are domain-count-sized; nothing corpus-shaped moves.
    *
    * Output: `domain, n_tokens, cap_tokens, allocated, epochs_q
    * (allocated·10⁶ div n_tokens, 0 for an empty domain), capped:int` —
    * the per-domain sampling budget a loader consumes.
    */
  def epochCappedBudget(domainTokens: DataFrame, domainCol: String,
      tokensCol: String, budget: Long, maxEpochsQ: Long): DataFrame = {
    require(budget >= 0 && maxEpochsQ > 0,
      s"need budget >= 0 and maxEpochsQ > 0, got $budget/$maxEpochsQ")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap_tokens"), col("domain"))
    // overflow-safe micro-unit product: n_tokens·maxEpochsQ overflows a
    // long once a domain passes ~9.2e18/maxEpochsQ tokens (~8.4e12 at 1.1
    // epochs — REACHABLE at the 100 TB posture, and ANSI mode turns the
    // wrap into a runtime error). Split n = q·10⁶ + r: (n·E) div 10⁶ =
    // q·E + (r·E) div 10⁶ EXACTLY (the q term is divisible by 10⁶), and
    // each factor stays ≤ ~1.1·n resp. 10⁶·E.
    val d = domainTokens.select(col(domainCol).as("domain"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("cap_tokens",
        expr(s"(n_tokens div 1000000) * $maxEpochsQ + " +
          s"((n_tokens % 1000000) * $maxEpochsQ) div 1000000"))
    val ranked = d
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("__prefix", coalesce(sum(col("cap_tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("__nd"))))
      .withColumn("capped",
        col("cap_tokens") * (col("__nd") - col("i") + 1) <
          lit(budget) - col("__prefix"))
    val tot = ranked.agg(
      coalesce(sum(when(col("capped"), col("cap_tokens"))), lit(0L))
        .as("__cappedSum"),
      coalesce(sum(col("capped").cast("long")), lit(0L)).as("__k"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("__rem", lit(budget) - col("__cappedSum"))
      .withColumn("__un", col("__nd") - col("__k"))
      .withColumn("allocated",
        when(col("capped"), col("cap_tokens"))
          .otherwise(expr("__rem div __un") +
            when(col("i") - col("__k") <= expr("__rem % __un"), 1L)
              .otherwise(0L)))
      .select(col("domain"), col("n_tokens"), col("cap_tokens"),
        col("allocated"),
        // same split for epochs_q: alloc·10⁶ div n = (alloc div n)·10⁶ +
        // ((alloc mod n)·10⁶) div n exactly; the residual term stays in
        // range for any n ≤ ~9.2e12 tokens per domain
        when(col("n_tokens") > 0,
          expr("(allocated div n_tokens) * 1000000 + " +
            "((allocated % n_tokens) * 1000000) div n_tokens"))
          .otherwise(lit(0L)).as("epochs_q"),
        col("capped").cast("int").as("capped"))
  }

  /** Per-domain token accounting + sampling weights toward a uniform token
    * mixture: `weight = (T/S) / tokens(domain)` — domains under-represented
    * in tokens get weight > 1, over-represented < 1 (the rebalancing step of
    * a DoReMi/uniform-mixture data recipe; the target shares are a constant
    * vector, uniform here).
    *
    * Shapes: per-doc token counts ride the scan (one codegen projection, no
    * explode); one groupBy(domain) over doc-count rows; the totals row
    * broadcasts back. Share and weight are micro-unit-quantized doubles with
    * identical op trees in both engines.
    *
    * Output: (domain, n_docs, n_tokens, share_q, weight_q, weight).
    */
  def domainMixture(docs: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val perDomain = docs
      .select(col(domainCol).as("domain"),
        coalesce(size(TextOps.tokens(col(textCol))).cast("long"), lit(0L)).as("n"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val totals = perDomain.agg(sum(col("n_tokens")).as("t"),
      count(lit(1)).as("s"))
    perDomain.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        floor(col("n_tokens").cast("double") * 1e6 / col("t").cast("double") + 0.5)
          .cast("long").as("share_q"),
        floor(col("t").cast("double") * 1e6 /
          (col("s").cast("double") * col("n_tokens").cast("double")) + 0.5)
          .cast("long").as("weight_q"))
      .withColumn("weight", col("weight_q").cast("double") / 1e6)
  }
}
