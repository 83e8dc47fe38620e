package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) merge — the incremental
  * alternative to the reference's nightly full dimension overwrite
  * (`flows.py:388-399` re-curates every dimension daily; `ReadMe.md:97-100`
  * lists ACID/incremental table formats as the planned evolution). A type-2
  * merge keeps every historical version effective-dated instead of
  * rewriting the table, which is the only strategy that survives at scale:
  * the nightly rewrite is O(|dim|) every day, the merge is O(|changed|).
  *
  * 100 TB posture: ONE full-outer shuffle join of the current dimension
  * slice against the update batch on the business key, followed by a
  * codegen'd per-row emit (0, 1 or 2 output rows via array+explode — no
  * second join, no window). History rows (`is_current = false`) never
  * enter the join: they are unioned through untouched, so cost tracks the
  * CURRENT slice + batch, not accumulated history. At real scale both
  * sides bucket by the key and the join co-locates shuffle-free; AQE
  * broadcasts genuinely small batches.
  */
object Cdc {

  /** Lift a plain dimension snapshot into SCD2 shape: every row current,
    * open-dated from `openFrom` (string date, engine-portable).
    */
  def scd2Init(snapshot: DataFrame, openFrom: String): DataFrame =
    snapshot
      .withColumn("valid_from", lit(openFrom))
      .withColumn("valid_to", lit(null).cast("string"))
      .withColumn("is_current", lit(true))

  /** Merge an update batch into an SCD2 dimension.
    *
    * `dim` carries (`keyCol`, attrs..., valid_from, valid_to, is_current);
    * `updates` carries (`keyCol`, attrs...). Semantics per business key:
    *   - update matches a current row with ANY attribute differing
    *     (null-safe compare): the current row closes (`valid_to =
    *     effectiveFrom`, `is_current = false`) and a new current version
    *     opens at `effectiveFrom`;
    *   - update identical to the current row: no-op (idempotent re-runs of
    *     the same batch do not grow history);
    *   - brand-new key: inserted as a current row from `effectiveFrom`;
    *   - current row with no update: unchanged. History rows pass through.
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], effectiveFrom: String): DataFrame = {
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val d = cur.as("d")
    val u = updates.as("u")
    val joined = d.join(u, col(s"d.$keyCol") <=> col(s"u.$keyCol"), "full_outer")

    val hasDim = col(s"d.$keyCol").isNotNull
    val hasUpd = col(s"u.$keyCol").isNotNull
    val changed = attrCols.map(c => !(col(s"d.$c") <=> col(s"u.$c")))
      .reduce(_ || _)

    def row(key: Column, attrs: Seq[Column], from: Column, to: Column,
        current: Column): Column =
      struct((key.as(keyCol) +: attrs.zip(attrCols).map { case (c, n) => c.as(n) }) ++
        Seq(from.as("valid_from"), to.as("valid_to"), current.as("is_current")): _*)

    val dimRow = row(col(s"d.$keyCol"), attrCols.map(c => col(s"d.$c")),
      col("d.valid_from"), col("d.valid_to"), col("d.is_current"))
    val closedRow = row(col(s"d.$keyCol"), attrCols.map(c => col(s"d.$c")),
      col("d.valid_from"), lit(effectiveFrom), lit(false))
    val newRow = row(col(s"u.$keyCol"), attrCols.map(c => col(s"u.$c")),
      lit(effectiveFrom), lit(null).cast("string"), lit(true))

    val emitted = joined.select(explode(
      when(hasDim && hasUpd && changed, array(closedRow, newRow))
        .when(hasDim && hasUpd, array(dimRow))        // identical: no-op
        .when(hasDim, array(dimRow))                  // untouched key
        .otherwise(array(newRow))                     // brand-new key
    ).as("r")).select("r.*")

    hist.unionByName(emitted)
  }

  /** Point-in-time (AS OF) dimension lookup against an SCD2 table: each
    * fact row joins the version whose `[valid_from, valid_to)` window
    * contains the fact's date (ISO-8601 date STRINGS compare
    * lexicographically — engine-portable, no date-type coercion; open
    * versions' NULL valid_to reads as 9999-12-31). Facts whose date
    * precedes every version (or whose key has no version) are absent —
    * inner-join semantics, the dimensional-modeling default.
    *
    * 100 TB posture: an EQUI-join on the business key carries the plan —
    * the date-window predicate filters the few versions per key on the
    * joined stream, so cost is fact-rows × versions-per-key, never a range
    * cross product. Dimensions bucket by key at real scale (or broadcast
    * when small); the version filter is a codegen'd string compare.
    */
  def scd2Lookup(facts: DataFrame, factKeyCol: String, factDateCol: String,
      dim: DataFrame, keyCol: String): DataFrame = {
    val f = facts.as("f")
    val d = dim.as("d")
    f.join(d,
      col(s"f.$factKeyCol") === col(s"d.$keyCol") &&
        col(s"f.$factDateCol") >= col("d.valid_from") &&
        col(s"f.$factDateCol") < coalesce(col("d.valid_to"), lit("9999-12-31")))
  }
}
