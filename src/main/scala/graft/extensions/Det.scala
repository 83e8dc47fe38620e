package graft.extensions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two float-determinism primitives from the query contract
  * (graft.queries.Q scaladoc) — one implementation each, so every operator
  * and query references the rule by name instead of re-deriving it:
  *
  *   - [[floorRound]]: display rounding as `floor(x·10ᵏ + 0.5)/10ᵏ` —
  *     deterministic on identical doubles in every engine (`round()` is
  *     not: Spark rounds the shortest decimal repr, DuckDB the binary
  *     value; they disagree at .xx5 ties).
  *   - [[exactSum]]: money aggregation as a DECIMAL sum rendered back to
  *     double — exact integer arithmetic, independent of aggregation order,
  *     so identical across engines, partitionings, and data scales.
  */
object Det {

  /** Deterministic k-decimal display rounding of a computed double. */
  def floorRound(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 9)
    val m = math.pow(10, k)
    floor(c * m + 0.5) / m
  }

  /** Exact, order-independent sum of a k-decimal-valued double column. */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")
}
