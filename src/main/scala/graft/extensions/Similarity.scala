package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the north star:
  *   - `bruteForceTopK` — exact baseline: broadcast the (small) query set,
  *     score every corpus vector with a codegen'd higher-order-function
  *     cosine, take per-query top-k with a window. Cost O(|Q|·|corpus|) but
  *     fully distributed and shuffle-free until the final tiny top-k.
  *   - `lshTopK` — scale path: random-hyperplane LSH. Each vector gets a
  *     `nPlanes`-bit signature computed scan-side from deterministic,
  *     seed-derived hyperplanes; candidates = same-bucket vectors, re-ranked
  *     exactly. At 100 TB the bucket join replaces the full cross product
  *     with collision groups (tunable recall via nPlanes/nTables).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * strictly sequential accumulation — the same op order as the DuckDB
    * oracle's list_aggregate('sum'), so rounded values agree cross-engine.
    *
    * Backed by the native codegen'd graft.functions.CosineSimilarity
    * expression (one fused allocation-free loop in WholeStageCodegen);
    * `cosineHof` is the built-in higher-order-function composition it
    * replaced — numerically identical (SimilaritySpec asserts bit equality),
    * ~10× slower on the pairwise hot paths because HOF lambdas are
    * interpreted.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Reference HOF formulation of [[cosine]] (kept for the equivalence test
    * and as the fallback shape for engines without the native expression).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact top-k neighbours per query vector (excluding self-matches).
    * Output: (query_id, rank, neighbor_id, cos).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): a seeded hash folded into [-0.5, 0.5). Same construction at every
    * executor — no driver-side randomness, no broadcast of plane matrices.
    */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table), lit(plane), dim), lit(1000000L)) / 1000000.0) - 0.5

  /** IVF (inverted-file) ANN — the second scale path, complementary to LSH:
    * a fixed set of `nCentroids` seed centroids (deterministically the
    * vectors with id < nCentroids — a real deployment would k-means these;
    * the partition/probe machinery is identical), every corpus vector
    * assigned to its nearest centroid in ONE broadcast pass (map-side
    * `max_by`, so the shuffle carries one row per vector), and each query
    * probing only its `nProbe` nearest centroids' inverted lists before an
    * exact re-rank. At 100 TB: candidate scans touch ~nProbe/nCentroids of
    * the corpus, and the assignment can be written once and reused as a
    * bucketed/partitioned layout keyed by `cid`.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val cent = corpus.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("centroid"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // nearest centroid per corpus vector: full-precision cosine, ties to the
    // smaller cid (max_by over a (cos, -cid) struct = argmax with that tiebreak)
    val assigned = c.join(broadcast(cent))
      .withColumn("acos", cosine(col("cv"), col("centroid")))
      .groupBy("neighbor_id")
      .agg(max_by(col("cid"), struct(col("acos"), (-col("cid")).as("t"))).as("cid"),
        first(col("cv")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("acos").desc, col("cid"))
    val probes = q.join(broadcast(cent))
      .withColumn("acos", cosine(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select("query_id", "qv", "cid")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(assigned, "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** `nPlanes`-bit signature of a vector under one LSH table — the native
    * codegen'd graft.functions.HyperplaneSignature (bit-compatible with
    * [[lshSignatureHof]], asserted in SimilaritySpec).
    */
  def lshSignature(vec: Column, table: Int, nPlanes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.HyperplaneSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), table, nPlanes))

  /** Reference HOF formulation of [[lshSignature]] (kept for the parity
    * test; nPlanes interpreted aggregates per row).
    */
  def lshSignatureHof(vec: Column, table: Int, nPlanes: Int): Column = {
    val vd = transform(vec, x => x.cast("double"))
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, i) => x * planeComponent(table, p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** ANN top-k via multi-table hyperplane LSH: bucket per table, exact
    * re-rank of in-bucket candidates, per-query top-k. Recall grows with
    * `nTables`; bucket size shrinks with `nPlanes`.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    def buckets(df: DataFrame, id: String, v: String) =
      (0 until nTables).map { t =>
        df.select(col(id), col(v),
          lit(t).as("table"), lshSignature(col(v), t, nPlanes).as("bucket"))
      }.reduce(_ unionByName _)
    val cb = buckets(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id", "cv")
    val qb = buckets(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv")
    val cand = cb.join(qb, Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct() // same pair may collide in several tables
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
