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

  /** The shared portable row hash: md5 over 0x1f-joined, 0x1e-null-coalesced
    * content columns, first 15 hex chars as a 60-bit BIGINT. Package-visible
    * so [[Chunking.exportManifest]]'s per-shard XOR fingerprint is THIS
    * device, not a drifting copy.
    */
  private[graft] def rowHash(contentCols: Seq[String]) = conv(
    substring(
      md5(concat_ws("\u001f",
        contentCols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*)),
      1, 15),
    16, 10).cast("long")

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
    df.select(groupCols.map(col) :+ rowHash(contentCols).as("__rh"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__rh)").as("content_fp"))
  }

  /** Row-level change feed between two snapshot versions — the
    * change-data-capture complement to [[datasetFingerprint]]'s slice-level
    * answer: WHICH keys were added, removed, or content-changed between v1
    * and v2. Unchanged keys are absent. Uses the same portable row hash, so
    * "changed" means any tracked content column differs (up to 60-bit md5
    * collision, same odds the fingerprint accepts).
    *
    * 100 TB posture: both sides reduce to (key, 60-bit hash) in a scan-side
    * codegen projection — the join carries 16 bytes/row, NOT the row
    * content — then ONE full-outer equi-join on the key; with both
    * snapshots bucketed by key (how a versioned lakehouse table is laid
    * out) the join co-locates shuffle-free. Output size is the churn, not
    * the corpus.
    *
    * Output: (keyCol, change_type ∈ added|removed|changed, old_fp, new_fp).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    val a = v1.select(col(keyCol).as("__k"), rowHash(contentCols).as("old_fp"))
    val b = v2.select(col(keyCol).as("__k"), rowHash(contentCols).as("new_fp"))
    a.join(b, Seq("__k"), "full_outer")
      .withColumn("change_type",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(col("__k").as(keyCol), col("change_type"),
        col("old_fp"), col("new_fp"))
  }
}
