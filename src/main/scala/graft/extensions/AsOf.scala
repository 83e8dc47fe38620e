package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the temporal join every
  * event/feature pipeline needs: for each left row, the latest right row
  * with `right.ts <= left.ts` in the same key group (left-outer semantics;
  * ties on ts broken toward the larger tiebreak value).
  *
  * Formulated as union → ONE window pass over (key, ts) — a single shuffle
  * on the key, O(n) state (just the running "last right payload"), no
  * range-condition cross-product. At 100 TB this is the only shape that
  * works: a naive `l JOIN r ON key AND r.ts <= l.ts` explodes to the full
  * per-key cross product before its top-1 filter.
  */
object AsOf {

  /** @param left        rows to enrich
    * @param right       rows providing the as-of payload
    * @param keyCols     equi-join key columns (present in both sides)
    * @param tsCol       event-time column name (both sides)
    * @param tieCol      unique per-side tiebreak column (both sides; ties on
    *                    ts resolve to the larger tie value, matching
    *                    `ORDER BY ts DESC, tie DESC LIMIT 1`)
    * @param payloadCols right columns to attach (prefixed `asof_` in output,
    *                    null when no right row is at or before the left row)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(payloadCols.map(col): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a right
    // row with ts == left.ts is visible to that left row ("at or before").
    // Null-ts right rows are excluded up front: `r.ts <= l.ts` is never true
    // for them declaratively, but nulls-first ordering would otherwise make
    // one the running match for left rows with no real predecessor.
    val r = right.filter(col(tsCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(tsCol), col(tieCol).as("__tie"),
        lit(0).as("__side"), payload.as("__r")): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), col(tieCol).as("__tie"),
        lit(1).as("__side"), lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // r lacks the left-only payload columns; allowMissingColumns null-fills
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      leftCols.map(col) ++
        payloadCols.map(p => col("__match").getField(p).as(s"asof_$p")): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the key group (left-outer; ties on ts break
    * toward the larger tiebreak, mirroring [[asOfJoin]]). Same union + one
    * window construction — the traversal just runs in descending ts, so
    * the running match is the nearest following right row. One shuffle,
    * O(1) window state, no cross product: the time-to-next-conversion
    * join at corpus scale.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(payloadCols.map(col): _*)
    val r = right.filter(col(tsCol).isNotNull).select(
      keyCols.map(col) ++ Seq(col(tsCol), col(tieCol).as("__tie"),
        lit(0).as("__side"), payload.as("__r")): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), col(tieCol).as("__tie"),
        lit(1).as("__side"), lit(null).cast(r.schema("__r").dataType).as("__r")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col): _*)
    // ts DESC walk: right rows still sort before left at equal ts (side
    // 0 < 1), so "at or after" includes ts equality; among equal-ts right
    // rows the tie-ASC order makes the LAST seen (= larger tie) win.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      leftCols.map(col) ++
        payloadCols.map(p => col("__match").getField(p).as(s"next_$p")): _*)
  }
}
