package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: assignment is a
  * pure function of a stable id (first md5 byte → 256 buckets), so splits
  * are reproducible across runs, engines, and cluster layouts — unlike
  * `rand()`-seeded sampling, which changes with partitioning — and documents
  * never migrate between train/valid/test as the corpus grows.
  *
  * Bucket thresholds are hex-string cutoffs (lexicographic compare on
  * lowercase hex == numeric compare), so the exact same predicate runs in
  * any SQL engine. Granularity is 1/256 ≈ 0.4%: `trainBuckets = 205` ≈ 80.1%.
  */
object Splits {

  /** The 0..255 bucket of a row id (as its 2-char lowercase hex string). */
  def bucketHex(id: Column): Column = substring(md5(id.cast("string")), 1, 2)

  /** Split label: first `trainBuckets` buckets → train, next `validBuckets`
    * → valid, rest → test.
    */
  def splitLabel(id: Column, trainBuckets: Int = 205, validBuckets: Int = 25): Column = {
    require(trainBuckets >= 0 && validBuckets >= 0 &&
      trainBuckets + validBuckets <= 256, "bucket counts must fit in 256")
    // a cutoff of 256 has no 2-hex representation — "zz" sorts after every
    // hex pair, making the predicate always-true
    def cut(n: Int) = if (n >= 256) "zz" else f"$n%02x"
    val h = bucketHex(id)
    when(h < lit(cut(trainBuckets)), "train")
      .when(h < lit(cut(trainBuckets + validBuckets)), "valid")
      .otherwise("test")
  }

  /** Attach a `split` column to `df`. */
  def withSplit(df: DataFrame, idCol: String, trainBuckets: Int = 205,
      validBuckets: Int = 25): DataFrame =
    df.withColumn("split", splitLabel(col(idCol), trainBuckets, validBuckets))
}
