package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: match point rows to interval rows
  * (`start <= point <= end`) within a key, without the per-key cross
  * product a naive `JOIN ... ON ts BETWEEN start AND end` plans as.
  *
  * Shape: intervals explode onto the fixed-width time buckets they overlap
  * (`sequence(floor(start/W), floor(end/W))` — bounded by interval-length/W
  * rows per interval); points map to exactly one bucket; the join runs
  * equi on (key, bucket) and re-checks the exact band predicate. At 100 TB
  * the equi-join shuffles hash-partitioned buckets instead of replicating
  * whole key groups, and bucket width trades replication against selectivity
  * (pick W ≈ median interval length).
  */
object RangeJoin {

  /** @param points     rows with an instant column
    * @param intervals  rows with [startCol, endCol] (inclusive both ends)
    * @param keyCols    equi keys present in both sides
    * @param tsCol      instant column (timestamp) in `points`
    * @param startCol   interval start (timestamp) in `intervals`
    * @param endCol     interval end (timestamp) in `intervals`
    * @param bucketSeconds band width W
    * @return inner join of points × matching intervals (all columns of both)
    */
  def bandedRangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0)
    val p = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    p.join(iv, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval overlap join (`lStart <= rEnd AND rStart <= lEnd`,
    * inclusive ends), binned so it never plans as the BroadcastNestedLoopJoin
    * / CartesianProduct a raw two-sided range predicate forces.
    *
    * Both sides explode onto the fixed-width buckets they span, the join
    * runs equi on the bucket, and the exact predicate filters residual
    * candidates inside the join stream. A pair that overlaps across several
    * shared buckets would match once per bucket; instead of a distinct
    * (an extra shuffle carrying every matched pair), each match is kept only
    * in the FIRST bucket both sides share — `bucket == max(lFirst, rFirst)`
    * — a per-row predicate, so the output is exact with zero extra
    * exchanges. At 100 TB the bucket hash-partitions both sides; width W
    * trades per-row replication (span/W rows) against per-bucket candidate
    * volume — pick W near the median interval span.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0)
    def first(c: String) = floor(unix_timestamp(col(c)) / bucketSeconds)
    def span(s: String, e: String) =
      explode(sequence(first(s), first(e)))
    val l = left.withColumn("__lb", first(lStart))
      .withColumn("__bucket", span(lStart, lEnd))
    val r = right.withColumn("__rb", first(rStart))
      .withColumn("__bucket", span(rStart, rEnd))
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === greatest(col("__lb"), col("__rb")))
      .drop("__bucket", "__lb", "__rb")
  }
}
