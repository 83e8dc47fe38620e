package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column vector operators beyond similarity search: scalar
  * quantization (the storage-compression step of every large ANN index) and
  * exact per-group centroids (class prototypes / cluster summaries).
  *
  * Determinism: quantization codes are pure integer results of identical
  * IEEE double ops in identical order (`floor((v − mn) · 255 / (mx − mn))`)
  * — mn/mx are exact selections, v is an exact float32 widening — so every
  * engine computes the same codes. Centroids use the same fixed-point
  * micro-unit scheme as Similarity.kmeansStep: order-independent integer
  * sums, ONE double division rendered to float.
  */
object Vectors {

  /** Global per-dimension int8 scalar quantization. Returns one row per
    * vector: (id, q_sum, q_min, q_max) — the code-sum checksum plus code
    * range, enough to verify the full code array without shipping it.
    *
    * Scale shape: posexplode is scan-side; per-dim min/max is a tiny
    * (dims-row) partial-aggregated shuffle; the code projection joins that
    * dims-row table back by BROADCAST (no repartition of the exploded
    * fact); the final per-vector agg partial-aggregates map-side. At
    * 100 TB the only wide exchange carries one row per (vector, dim)
    * pre-combined per partition — and a production variant would fuse the
    * explode away entirely once min/max are known (two linear scans).
    */
  def quantizeScalar(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = emb.select(col(idCol).as("vid"), posexplode(col(vecCol)))
      .select(col("vid"), col("pos"), col("col").cast("double").as("v"))
    val mm = x.groupBy("pos").agg(min("v").as("mn"), max("v").as("mx"))
    x.join(broadcast(mm), "pos")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(floor((col("v") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))).cast("int")))
      .groupBy("vid")
      .agg(sum(col("code")).as("q_sum"), min(col("code")).as("q_min"),
        max(col("code")).as("q_max"))
  }

  /** Exact per-group centroid, one row per (group, dim): micro-unit
    * fixed-point component sums (order-independent long arithmetic), then
    * one double division rendered to float — bit-identical across engines
    * and partitionings (the Similarity.kmeansStep scheme).
    *
    * Scale shape: quantize + explode scan-side, ONE partial-aggregated
    * shuffle keyed (group, dim) — output cardinality |groups|·dims,
    * independent of corpus size.
    */
  def groupCentroids(emb: DataFrame, groupCol: String, vecCol: String): DataFrame =
    emb.select(col(groupCol).as("grp"), posexplode(col(vecCol)))
      .select(col("grp"), col("pos"),
        floor(col("col").cast("double") * 1e6 + 0.5).cast("long").as("q"))
      .groupBy("grp", "pos")
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("grp"), col("pos"),
        (col("s").cast("double") / (col("n").cast("double") * 1e6))
          .cast("float").as("comp"),
        col("n"))

  /** [[groupCentroids]] reassembled as one `array<float>` row per group
    * (position-sorted), the shape joins and the native cosine kernel want.
    */
  def centroidVectors(emb: DataFrame, groupCol: String, vecCol: String): DataFrame =
    groupCentroids(emb, groupCol, vecCol)
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
        s => s.getField("comp")).as("centroid"))

  /** Centroid-distance outlier flagging (the CLIP-style "drop vectors far
    * from their class prototype" curation filter): cosine of each vector
    * against its group's exact centroid, flagged when below `threshold`.
    *
    * Scale shape: the centroid table is |groups| rows — broadcast to the
    * corpus scan, so the scoring pass is map-only (centroid build is the one
    * tiny [[groupCentroids]] shuffle). Cosine is the native codegen'd
    * kernel; a degenerate (zero-norm) vector scores null and flags null
    * rather than poisoning the filter (see CosineSimilarity scaladoc).
    */
  def labelOutliers(emb: DataFrame, idCol: String, groupCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val cent = centroidVectors(emb, groupCol, vecCol)
    emb.join(broadcast(cent), emb(groupCol) === cent("grp"))
      .withColumn("cos_c",
        Det.floorRound(Similarity.cosine(col(vecCol), col("centroid")), 4))
      .select(col(idCol), col(groupCol), col("cos_c"),
        (col("cos_c") < threshold).as("is_outlier"))
  }
}
