package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders over the driver testdata (`TESTDATA.md`).
  *
  * Design notes for 100 TB scale:
  *   - Loaders return plain lazy DataFrames — Catalyst pushes projections and
  *     filters from downstream operators into the parquet scan, so nothing is
  *     materialized here.
  *   - `events.ts` has shipped in two fixture shapes: parquet
  *     TIMESTAMP(NANOS), which Spark's vectorized reader only surfaces as a
  *     nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`), and plain
  *     µs TIMESTAMP without timezone, which Spark 4 surfaces as
  *     TIMESTAMP_NTZ. Either way the loader normalizes to session-zoned
  *     TimestampType (UTC session ⇒ exact epoch micros, agreeing with
  *     DuckDB) in one codegen'd projection, still vectorized.
  */
object Tables {

  /** Known table names (one parquet file/dir each under the sf dir). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    table match {
      case "events" => events(spark, sfDir)
      case t        => spark.read.parquet(path(sfDir, t))
    }

  /** `events` with `ts` surfaced as a microsecond TimestampType column.
    * Truncation (not rounding) ns→µs matches DuckDB's parquet reader.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(sfDir, "events"))
    raw.schema("ts").dataType match {
      case LongType => // ns-as-long: convert to µs timestamp.
        // `div` is exact integral division (no double intermediate) — epoch
        // nanos ~1.7e18 exceed 2^53, so floor(ts / 1000.0) would lose µs
        // precision; `ts div 1000` matches DuckDB's ns→µs truncation exactly.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // µs-precision parquet timestamp without timezone (current fixture
        // shape): surface as session-zoned TimestampType so downstream
        // epoch math (`cast(ts as bigint)`, unix_timestamp) resolves. The
        // session timezone is pinned to UTC everywhere (Bench/Verify/specs),
        // so the cast is a pure type relabel — identical epoch micros, and
        // DuckDB reads the same column as plain TIMESTAMP.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already a timestamp (e.g. rewritten fixture)
    }
  }

  // Convenience named loaders.
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
