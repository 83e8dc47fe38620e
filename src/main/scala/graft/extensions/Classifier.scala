package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED quality classification — the gate every production LLM data
  * pipeline runs that the heuristic scores ([[Quality]], [[LmScore]]) only
  * approximate: a fastText-style linear classifier over hashed bag-of-bigram
  * features (Joulin et al. 2017's model family), trained IN-ENGINE with a
  * fixed number of full-batch gradient-descent steps so the whole training
  * run — not just the final scores — is deterministic and oracle-replayable.
  *
  * Determinism doctrine (the [[graft.queries.Q]] float rules, applied to a
  * trainer): weights live in fixed-point micro-units (longs), the logistic
  * link is the HARD sigmoid `clamp(z/4 + 1/2, 0, 1)` (integer shifts and
  * clamps — no transcendental whose last ulp could differ between engines),
  * per-step gradients are exact integer sums (partition-order independent),
  * and the weight update divides integers with explicit truncate-toward-zero
  * semantics. Every quantity in every step is therefore bit-reproducible in
  * DuckDB, which unrolls the steps as MATERIALIZED CTEs (the
  * [[TextAnalysis.bpeLearn]] multi-round-trainer pattern, h114).
  *
  * Labels come from a deterministic SEED RULE over the documents themselves
  * (weak supervision — the standard bootstrap when no labeled quality set
  * exists; the caller supplies the rule as a Column over the token array),
  * so no external data is needed and the oracle can replay the labels too.
  *
  * 100 TB posture: the featurized corpus `(id, y, feature-bucket array)` is
  * built in ONE scan (tokenize → bigrams → md5-hash → distinct buckets, all
  * codegen'd except the final dedup) and checkpointed; each gradient step is
  * then ONE pass over it — per-row score/error computed scan-side against
  * the BROADCAST weight vector (a (nBuckets+1)-element literal array — the
  * model is tiny by construction, that is the point of feature hashing),
  * followed by a feature-keyed aggregate that partial-aggregates to at most
  * nBuckets+1 rows per partition before a single tiny exchange, and a
  * (nBuckets+1)-row driver collect for the update (the
  * [[Dedup.connectedComponents]] / bpeLearn driver-argmax posture: driver
  * traffic is model-sized, never corpus-sized). No per-doc shuffle exists
  * anywhere in the loop.
  */
object Classifier {

  /** Micro-unit scale: probabilities and weights carry 10⁻⁶ resolution. */
  private val Micro = 1000000L

  /** Hard sigmoid in micro-units: `clamp((z_q + 2·10⁶) div 4, 0, 10⁶)` —
    * the piecewise-linear logistic link `clip(z/4 + 1/2, 0, 1)`. The
    * truncate-vs-floor ambiguity of integer division on negatives is
    * unreachable: every negative intermediate clamps to 0 either way.
    */
  private def hardSigmoidQ(zq: Column): Column =
    least(lit(Micro), greatest(lit(0L),
      floor((zq + lit(2L * Micro)).cast("double") / 4.0).cast("long")))

  /** The featurized corpus: one row per document with ≥ 2 tokens —
    * `(idCol, y:int, js:array<int>)` where `js` is the SORTED distinct set
    * of hashed-bigram feature buckets (binary features: presence, not
    * count — bounds every |z| by nBuckets·|w|max and measured better-
    * conditioned than raw counts at this lr) plus the bias bucket
    * `nBuckets`. Bucket = first 16 bits of `md5(tok_i ++ " " ++ tok_i+1)`
    * mod nBuckets — the [[Sketches]] engine-portable hash device.
    */
  private[graft] def hashedBigramRows(docs: DataFrame, idCol: String,
      textCol: String, seedRule: Column => Column,
      nBuckets: Int): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol),
        seedRule(col("__toks")).cast("int").as("y"),
        concat(
          array_sort(array_distinct(transform(
            TextOps.shingles2(col("__toks")),
            bg => (conv(substring(md5(bg), 1, 4), 16, 10).cast("long")
              % nBuckets).cast("int")))),
          array(lit(nBuckets))).as("js"))
  }

  /** Train `steps` full-batch gradient steps from zero weights and return
    * (final weights in micro-units, the featurized doc relation, N). The
    * update is `w_j ← w_j − truncDiv(g_j, 2N)` with
    * `g_j = Σ_docs∋j (p_q − y·10⁶)` — learning rate 1/2 over the mean
    * gradient, in micro-units.
    */
  private[graft] def trainState(docs: DataFrame, idCol: String,
      textCol: String, seedRule: Column => Column, nBuckets: Int,
      steps: Int): (Array[Long], DataFrame, Long) = {
    require(nBuckets >= 2 && steps >= 1,
      s"need nBuckets >= 2 and steps >= 1, got $nBuckets/$steps")
    // repartition BEFORE the featurize projection when the input layout is
    // narrower than the cluster: the md5-per-bigram work and every
    // subsequent gradient pass otherwise inherit the FILE layout (a
    // single-file corpus serializes the whole trainer through one task —
    // measured 4 s featurize + 1 s/step single-core at sf0.1, ~0.4 s +
    // 0.2 s/step at 32-way). Conditional, because an already-wide corpus
    // should NOT pay a corpus-sized raw-text exchange for nothing. Row
    // placement does not affect results: every step aggregate is an exact
    // integer sum.
    val par = docs.sparkSession.sessionState.conf.numShufflePartitions
    val src = if (docs.rdd.getNumPartitions < par) docs.repartition(par)
              else docs
    val rows = hashedBigramRows(src, idCol, textCol, seedRule, nBuckets)
      .localCheckpoint(eager = false)
    val n = rows.count()
    val w = Array.fill(nBuckets + 1)(0L)
    if (n > 0) {
      for (_ <- 1 to steps) {
        val g = gradient(rows, w)
        val d = 2L * n
        var j = 0
        while (j < w.length) {
          val gj = g(j)
          // truncate-toward-zero on both signs — matches the oracle's
          // sign-split `//` (floor ambiguity only exists on negatives)
          w(j) -= (if (gj >= 0) gj / d else -((-gj) / d))
          j += 1
        }
      }
    }
    (w, rows, n)
  }

  /** One step's gradient vector: scan-side z/error against the broadcast
    * literal weights, explode the bucket set, one partial-aggregated
    * (nBuckets+1)-row sum, collected to the driver.
    */
  private def gradient(rows: DataFrame, w: Array[Long]): Array[Long] = {
    val g = Array.fill(w.length)(0L)
    rows
      // the error term is computed in its OWN projection below the explode:
      // fused into the Generate's select it is re-evaluated per EXPLODED
      // row — |js| interpreted HOF folds per document instead of one
      // (measured ~5x on the step)
      .select((hardSigmoidQ(zQ(w)) - col("y").cast("long") * Micro).as("__err"),
        col("js"))
      .select(col("__err"), explode(col("js")).as("j"))
      .groupBy("j").agg(sum(col("__err")).as("g"))
      .collect()
      .foreach(r => g(r.getInt(0)) = r.getLong(1))
    g
  }

  /** `z_q = Σ_{j ∈ js} w_q[j]` — a scan-side fold over the bucket set
    * against the literal weight array (binary features, so no multiply).
    * The weights are ONE array-typed literal (`typedlit`), not a
    * CreateArray of nBuckets+1 scalar literals: higher-order functions
    * evaluate their lambda per element, and a CreateArray inside the fold
    * would re-materialize the whole weight array for every bucket of every
    * document every step (measured ~10× on the h116 training loop), while
    * an ArrayType literal is held by reference and indexed in place.
    */
  private def zQ(w: Array[Long]): Column = {
    val warr = typedlit(w.toIndexedSeq)
    aggregate(col("js"), lit(0L),
      (acc, j) => acc + element_at(warr, j + 1))
  }

  /** The h116 operator: train a hashed-bigram logistic (hard-sigmoid)
    * quality classifier with `steps` full-batch gradient steps against the
    * `seedRule` labels, then score every trainable document (≥ 2 tokens)
    * with the learned weights.
    *
    * Output: `idCol, y:int, score_q:long, pred:int` — `score_q` the
    * micro-unit hard-sigmoid probability of the positive class, `pred` its
    * 0.5 threshold. ClassifierSpec pins convergence (training loss falls,
    * accuracy beats the majority class) and the decision boundary against
    * a driver-side Scala replay; the h116 oracle replays all `steps`
    * gradient steps bit-for-bit in DuckDB.
    */
  def qualityLrScores(docs: DataFrame, idCol: String, textCol: String,
      seedRule: Column => Column, nBuckets: Int = 256,
      steps: Int = 12): DataFrame = {
    val (w, rows, _) = trainState(docs, idCol, textCol, seedRule, nBuckets, steps)
    rows.select(col(idCol), col("y"),
        hardSigmoidQ(zQ(w)).as("score_q"))
      .withColumn("pred", (col("score_q") >= lit(Micro / 2)).cast("int"))
  }
}
