package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (optionally) an ANSI-SQL
  * oracle string the driver runs through DuckDB over the same parquet tables.
  *
  * Contract (see /root/repo/SURVEY.md §2.4 and §7.5):
  *   - result columns are aliased identically in Spark and oracle SQL;
  *   - output carries a total ORDER BY (unique tiebreak) in both;
  *   - timestamps are formatted to second-precision strings in outputs;
  *   - float determinism rules (each violated pattern produced a real
  *     cross-engine mismatch before being outlawed):
  *     1. NEVER `round(sum(double))` — aggregation order differs between
  *        engines/partitionings; money columns (exact 2-dp data) sum as
  *        DECIMAL(18,2) (order-independent exact arithmetic), products of
  *        2-dp values as DECIMAL(18,4), rendered back to DOUBLE;
  *     2. NEVER `round()` a computed double for display — Spark rounds the
  *        shortest decimal repr, DuckDB the binary value, and they disagree
  *        at .xx5 ties (rationals like i/union or (r-1)/(n-1) hit ties
  *        exactly); use `floor(x*10^k + 0.5)/10^k`, which is deterministic
  *        on identical doubles (round() of RAW 2-dp columns is identity and
  *        allowed);
  *     3. doubles may only be compared/displayed when both engines compute
  *        them with IDENTICAL IEEE ops in IDENTICAL order (sequential
  *        per-row folds, window frames over a total order, or exact-decimal
  *        derivations) — never engine-internal algorithms (quantile_cont vs
  *        percentile interpolation differed in the last ulp).
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(run)
}
