package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order data layout — multi-dimensional clustering for file skipping,
  * the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`. Interleaving
  * the bits of two bucketized columns gives a 1-D sort key whose ranges
  * are compact in BOTH dimensions, so per-file min/max footer stats prune
  * selective predicates on either column — where a single-column sort
  * prunes only its leading column. The reference stores curated parquet
  * partitioned by date alone (`data_processing.py:405-413`); z-ordering is
  * what a 100 TB lakehouse adds inside those partitions.
  *
  * 100 TB posture: the z-value is a pure codegen'd scan-side projection
  * (shift/mask/add on two integers — no UDF, no sort). The real write
  * path clusters with `repartitionByRange(z)` — one range shuffle, the
  * same cost as any global layout pass and strictly cheaper than a
  * lexicographic multi-column sort of equal benefit. The stats query here
  * aggregates per target file — one partial-aggregated shuffle on
  * file_id — and emits exactly the min/max-per-file metadata a scan
  * planner consults, so `zorderFileStats` doubles as the skipping-benefit
  * report: tight per-file spans in both dimensions = effective pruning.
  */
object Layout {

  /** Bit-interleave two `bits`-wide non-negative bucket columns into a
    * Morton (z-order) value: x occupies even bit positions, y odd.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Assign rows to `nFiles` files by contiguous z-range over the
    * (`xBucket`, `yBucket`) grid (both in [0, 2^bits)), and report the
    * per-file footer stats a pruning scan would use: row count, z range,
    * and min/max of both bucket dimensions. `nFiles` must divide the
    * 2^(2·bits) z-space so file boundaries are exact bit prefixes.
    */
  def zorderFileStats(df: DataFrame, xBucket: String, yBucket: String,
      bits: Int, nFiles: Int): DataFrame = {
    val zSpace = 1L << (2 * bits)
    require(zSpace % nFiles == 0, "nFiles must divide the z-space")
    val perFile = zSpace / nFiles
    val z = zValue(col(xBucket).cast("long"), col(yBucket).cast("long"), bits)
    df.withColumn("z", z)
      .withColumn("file_id", expr(s"z div $perFile"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("z").as("z_min"), max("z").as("z_max"),
        min(xBucket).cast("long").as("x_min"),
        max(xBucket).cast("long").as("x_max"),
        min(yBucket).cast("long").as("y_min"),
        max(yBucket).cast("long").as("y_max"))
  }
}
