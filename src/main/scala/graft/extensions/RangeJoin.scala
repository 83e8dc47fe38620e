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
}
