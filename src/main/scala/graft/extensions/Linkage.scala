package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — entity resolution over dirty dimension
  * data (the reference curates free-text product/customer attributes,
  * `data_processing.py:253-263`; matching near-identical names is the step
  * after cleaning them). The classic two-phase shape: a cheap BLOCKING key
  * restricts candidate pairs to co-partitioned groups, then an exact
  * edit-distance verify runs only inside blocks.
  *
  * 100 TB posture: the candidate set is an equi-join on the blocking key —
  * one shuffle each side, cost Σ|block|², NEVER the |n|² cross product
  * (the plan contains no CartesianProduct / BroadcastNestedLoopJoin;
  * pinned in PlanSpec). Block-size skew is the knob that matters at scale:
  * a pathological block degrades to quadratic, so production pairs this
  * with the h71 heavy-key profile over the blocking key and either refines
  * the key (add a length bucket / first-token) or salts the oversized
  * blocks. The `levenshtein` verify is a codegen'd scalar on the joined
  * stream — no UDF, no re-scan.
  */
object Linkage {

  /** Within-block fuzzy self-pairs: rows sharing `blockCols` whose
    * lowercased `nameCol` values are within `maxDist` edits; `id_a < id_b`
    * canonical orientation, self-pairs excluded by the strict inequality.
    *
    * Verify-cost bounds (round 9), both result-identical to the plain
    * `levenshtein ≤ maxDist` filter the oracle replays:
    *   - a length-difference pre-prune (`levenshtein(x,y) ≥ |len x − len y|`
    *     always, so pairs failing it can never pass the verify) discards
    *     candidates for the cost of two length lookups — measured on the
    *     LOWERCASED names, the same strings the verify compares (full-case
    *     mapping can change character count);
    *   - the THRESHOLDED `levenshtein(_, _, maxDist)` builtin runs the
    *     banded O(len·maxDist) DP instead of the full O(len²) matrix and
    *     returns −1 above the bound — for survivors it returns the exact
    *     distance, so kept rows carry identical values.
    */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    // the prune must measure the SAME strings the verify compares: full
    // Unicode case mapping can change character count (U+0130 'İ' lowercases
    // to 2 chars), so pruning on raw lengths while verifying lowercased ones
    // could wrongly discard a pair that lowercasing brings within maxDist.
    // Lowercase SCAN-SIDE — once per input row, not once per joined pair
    // (the per-pair formulation measured ~1.8× slower at sf0.1: every
    // candidate pair paid two lower() calls before the prune could discard
    // it); the per-pair filter then touches only precomputed lengths,
    // exactly as cheap as the raw-length prune it replaces.
    val a = df.select(
      (col(idCol).as("id_a") +: col(nameCol).as("name_a") +:
        lower(col(nameCol)).as("lname_a") +: blockCols.map(col)): _*)
    val b = df.select(
      (col(idCol).as("id_b") +: col(nameCol).as("name_b") +:
        lower(col(nameCol)).as("lname_b") +: blockCols.map(col)): _*)
    a.join(b, blockCols, "inner")
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("lname_a")) - length(col("lname_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("lname_a"), col("lname_b"), maxDist))
      .filter(col("dist") =!= -1)
      .select((Seq(col("id_a"), col("id_b")) ++ blockCols.map(col) ++
        Seq(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))): _*)
  }
}
