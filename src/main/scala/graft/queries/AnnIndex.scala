package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** h108's persisted ANN structure: ONE IVF index per side of the
  * embeddings parity split (src = even labels, tgt = odd), built through
  * [[graft.extensions.Similarity.buildIvfIndex]] — the write-once
  * cid-bucketed layout whose probes [[graft.extensions.Similarity.ivfTopKFromIndex]]
  * serves without re-paying k-means or the corpus assignment pass.
  *
  * Built ONCE per (dir, SparkSession) and memoized: the index IS a
  * write-once artifact (that is its contract), so unlike DupGraph's
  * lazy constructions there is no materialize toggle — every caller shares
  * the same persisted tables, exactly like a production corpus version.
  * In Bench this makes the first attempt pay the build and every later
  * attempt measure the steady state (best-of-N keeps the steady reading);
  * Verify builds once and probes once. Table names carry an md5 tag of
  * the dir (collision-free, unlike String.hashCode). Same
  * single-writer-per-dir assumption as DupGraph.materializeBucketed: two
  * JVMs indexing the SAME dir concurrently would race on the warehouse
  * paths (the driver runs bench and verify on different SFs, and dev
  * workflows are one sbt process).
  */
object AnnIndex {
  private final case class Built(session: SparkSession, tables: Seq[String])
  private val memo = new ConcurrentHashMap[String, Built]()

  /** (srcCentroids, srcAssignment, tgtCentroids, tgtAssignment) managed
    * table names for `dir`'s embeddings under the h108 parameters
    * (nCentroids = 16, kmeansIters = 2, 8 buckets). A memo hit from a
    * stopped/replaced session rebuilds (buildIvfIndex clears stale
    * warehouse dirs first).
    */
  def h108Tables(s: SparkSession, dir: String): Seq[String] =
    memo.compute(dir, (_, prev) =>
      if (prev != null && (prev.session eq s) &&
          prev.tables.forall(s.catalog.tableExists))
        prev
      else {
        val embs = graft.Tables.embeddings(s, dir)
        // md5 of the dir, not its hashCode: String.hashCode collides across
        // dirs (the h14 fixture-path lesson), and a collision here would
        // silently probe another dir's index — 12 hex chars of md5 keep the
        // identifier short with a collision chance that is not a concern
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(12)
        val (sc, sa) = graft.extensions.Similarity.buildIvfIndex(
          embs.filter(col("label") % 2 === 0), "vec_id", "embedding",
          s"graft_ivf${hex}_src")
        val (tc, ta) = graft.extensions.Similarity.buildIvfIndex(
          embs.filter(col("label") % 2 === 1), "vec_id", "embedding",
          s"graft_ivf${hex}_tgt")
        Built(s, Seq(sc, sa, tc, ta))
      }).tables

  /** Drop the memo (tests that restart sessions). */
  def reset(): Unit = memo.clear()
}
