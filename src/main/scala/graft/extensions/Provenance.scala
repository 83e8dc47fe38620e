package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset versioning / provenance fingerprints for incremental pipelines.
  *
  * A training-data pipeline that re-runs daily (the reference deploys on a
  * daily cron, `/root/reference/flows.py:388-399`) needs a cheap answer to
  * "did this slice of the corpus change since the last run?" — re-running
  * dedup/mixing downstream of an unchanged partition is wasted compute, and
  * a changed fingerprint pins exactly which slices to reprocess. The
  * fingerprint here is content-defined and layout-independent: reordering
  * rows, repartitioning, or rewriting files leaves it unchanged; any row
  * added, dropped, or edited changes it (up to md5/60-bit-xor collisions).
  */
object Provenance {

  /** Per-group content fingerprint: each row hashes to
    * `md5(concat_ws(0x1f, coalesced content cols))`, the first 15 hex chars
    * parse as a 60-bit integer, and the group fingerprint is the pair
    * (row count, XOR of row hashes) — XOR is commutative/associative, so
    * the combine is order- and partitioning-independent, and every engine
    * agrees exactly (the md5-hex device of [[Splits]]/[[Sampling]], plus a
    * portable hex→int cast). NULLs coalesce to a 0x1e sentinel BEFORE
    * concat_ws (which would otherwise silently skip them, making
    * ("a", NULL) collide with ("a",)); the 0x1f unit separator keeps
    * ("ab","c") distinct from ("a","bc").
    *
    * 100 TB posture: one scan, all hashing in a single codegen projection,
    * one partial-aggregated groupBy — map-side XOR combines to one row per
    * (group, partition), so the shuffle carries group-cardinality rows.
    * Fingerprints of sub-slices XOR together into coarser slices (counts
    * add), so per-partition fingerprints roll up to a dataset version
    * without rescanning — the Merkle property, for free, from XOR.
    *
    * Output: (group cols…, n_rows, content_fp) with content_fp the 60-bit
    * XOR as a BIGINT.
    */
  def datasetFingerprint(df: DataFrame, groupCols: Seq[String],
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    val rowHash = conv(
      substring(
        md5(concat_ws("\u001f",
          contentCols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*)),
        1, 15),
      16, 10).cast("long")
    df.select(groupCols.map(col) :+ rowHash.as("__rh"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__rh)").as("content_fp"))
  }
}
