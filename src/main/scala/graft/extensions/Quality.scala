package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation layer a curated
  * lakehouse zone runs before publishing a partition (the reference's
  * curation step drops/coerces bad rows one rule at a time; this is the
  * audited-report form of the same contracts: how MANY rows violate each
  * rule, without mutating anything).
  *
  * Scale design: all expectations against one source evaluate in a SINGLE
  * scan — each rule is a conditional-count aggregate (`sum(violated)`),
  * so N rules cost one pass + one 1-row aggregate, not N scans. The
  * 1-row-per-source aggregates are unpivoted to (rule, violations, total)
  * rows with a `stack` generator (the h38 column-profile device) and
  * unioned; cross-table rules (referential integrity, cross-field order)
  * arrive as pre-joined DataFrames with a violation flag and follow the
  * same path. Violation rates are ONE IEEE division of exact longs.
  */
object Quality {

  /** One expectation: a stable id, and the boolean "this row violates". */
  final case class Expectation(id: String, violated: Column)

  /** Evaluate a rule set against one source in a single scan.
    * Output: (rule_id, violations, total, violation_rate), one row per
    * rule, NOT ordered (caller composes/unions then orders).
    */
  def check(source: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty)
    // rule ids are interpolated into a selectExpr stack(...) below — restrict
    // them to identifier characters so a quote/space/paren in an id fails
    // loudly here instead of producing broken SQL (or an injected expression)
    // at analysis time; duplicates would silently collide on agg column names
    rules.foreach(r => require(r.id.matches("[A-Za-z0-9_]+"),
      s"rule id must match [A-Za-z0-9_]+: '${r.id}'"))
    require(rules.map(_.id).distinct.size == rules.size,
      s"duplicate rule ids: ${rules.map(_.id).diff(rules.map(_.id).distinct).distinct.mkString(",")}")
    val aggs = count(lit(1)).as("_total") +:
      rules.map(r => sum(when(r.violated, 1L).otherwise(0L)).as(s"_v_${r.id}"))
    val one = source.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r => s"'${r.id}', _v_${r.id}").mkString(", ")
    one.selectExpr(s"stack(${rules.size}, $stacked) AS (rule_id, violations)",
        "_total AS total")
      .select(col("rule_id"), coalesce(col("violations"), lit(0L)).as("violations"),
        col("total"))
      .withColumn("violation_rate", Det.floorRound(
        col("violations").cast("double") / col("total").cast("double"), 6))
  }
}
