package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the pre-shuffle answer to
  * the star schema's repeated fact⋈dim and fact⋈fact joins at 100 TB: write
  * both sides bucketed (and sorted) by the join key once, and every
  * subsequent equi-join on that key runs with NO shuffle exchange on the
  * bucketed sides (Catalyst proves output partitioning satisfies the join's
  * distribution requirement; asserted in BucketingSpec).
  *
  * Bucket-count guidance at scale: pick `buckets` so one bucket of the fact
  * table ≈ one task's worth of data (128–512 MB); both join sides must use
  * the same bucket count and key for exchange elimination.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(buckets > 0 && bucketCols.nonEmpty)
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * a plain `spark.read.parquet` of the files would lose it).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
