package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global total-order ranking that scales: `row_number() OVER (ORDER BY …)`
  * with no PARTITION BY plans as a single-partition WindowExec — every row
  * of the input funnels through ONE task, the definitional anti-pattern at
  * 100 TB. These helpers produce the identical numbers with the classic
  * two-phase construction instead:
  *
  *   1. range-repartition on the sort key (RangePartitioning: partition i
  *      holds strictly lower sort keys than partition i+1), rank locally
  *      within each partition — parallel across the cluster;
  *   2. aggregate ONE (count, sum) row per partition, prefix-sum those few
  *      rows (a global window over #partitions rows — thousands at cluster
  *      scale, not corpus-sized), broadcast the offsets back, and add.
  *
  * The result depends only on the total order (sort keys must form a
  * unique total order per the Q determinism contract), not on where the
  * sampled range boundaries land, so the output is deterministic even
  * though RangePartitioner's boundary sampling is not.
  *
  * Running sums use the same offsets with an exact DECIMAL value column —
  * order-independent integer arithmetic, so Spark and the oracle agree
  * bit-for-bit regardless of partitioning.
  *
  * CORRECTNESS INVARIANT — exchange reuse: the `local` subtree (range
  * exchange + local ranks) feeds BOTH the output join and the `offsets`
  * aggregate. RangePartitioner samples boundaries with a per-exchange
  * seed, so the construction is only correct because Catalyst's
  * ReuseExchange collapses the two identical exchanges into ONE — both
  * subtrees then see the same boundaries and partition ids. With
  * `spark.sql.exchange.reuse=false` the two subtrees could sample
  * DIFFERENT boundaries and the offsets would be applied to mismatched
  * partition ids, silently corrupting every rank — so these helpers
  * fail fast if the config is disabled rather than hinge on a default.
  */
object Ranking {

  private val PID = "_rk_pid"
  private val LRN = "_rk_lrn"

  // see "CORRECTNESS INVARIANT" above: without ReuseExchange the local-rank
  // and offsets subtrees may range-partition on different sampled boundaries
  private def requireExchangeReuse(df: DataFrame): Unit =
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "Ranking's two-phase construction requires spark.sql.exchange.reuse=true " +
        "(the local-rank and offsets subtrees must share one range exchange; " +
        "RangePartitioner boundary sampling varies per exchange)")

  /** `row_number() OVER (ORDER BY sort…)` as two-phase range-partitioned
    * rank. `sort` must be a unique total order.
    */
  def globalRowNumber(df: DataFrame, sort: Seq[Column], out: String): DataFrame = {
    requireExchangeReuse(df)
    val local = df.repartitionByRange(sort: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LRN, row_number().over(Window.partitionBy(PID).orderBy(sort: _*)))
    // bounded-window: ONE count row per partition (#partitions rows total)
    // — the single-partition WindowExec warning it logs is expected and
    // pre-adjudicated; this prefix sum IS phase 2 of the design above.
    // (Partitioning on a literal cannot silence it: Spark constant-folds
    // foldable partition keys back to an empty spec — probed on 4.1.)
    val offsets = local.groupBy(PID).agg(count(lit(1)).as("_rk_cnt"))
      .withColumn("_rk_off", coalesce(
        sum("_rk_cnt").over(Window.orderBy(PID)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(PID), col("_rk_off"))
    local.join(broadcast(offsets), Seq(PID))
      .withColumn(out, col("_rk_off") + col(LRN))
      .drop(PID, LRN, "_rk_off")
  }

  /** Two-phase global row_number PLUS running exact-decimal sum of
    * `value` over the same total order (frame = unbounded preceding to
    * current row). `value` must already be a DECIMAL column.
    */
  def globalRunningSum(df: DataFrame, sort: Seq[Column], value: Column,
      outRank: String, outCum: String): DataFrame = {
    requireExchangeReuse(df)
    val w = Window.partitionBy(PID).orderBy(sort: _*)
    val local = df.repartitionByRange(sort: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LRN, row_number().over(w))
      .withColumn("_rk_lcum",
        sum(value).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // bounded-window ×2: one (count, sum) row per partition — expected
    // single-partition WindowExec warnings, same adjudication as
    // globalRowNumber's offsets prefix sum
    val offsets = local.groupBy(PID)
      .agg(count(lit(1)).as("_rk_cnt"), sum(value).as("_rk_vsum"))
      .withColumn("_rk_off", coalesce(
        sum("_rk_cnt").over(Window.orderBy(PID)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_rk_voff",
        sum("_rk_vsum").over(Window.orderBy(PID)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(PID), col("_rk_off"), col("_rk_voff"))
    local.join(broadcast(offsets), Seq(PID))
      .withColumn(outRank, col("_rk_off") + col(LRN))
      .withColumn(outCum, when(col("_rk_voff").isNull, col("_rk_lcum"))
        .otherwise(col("_rk_lcum") + col("_rk_voff")))
      .drop(PID, LRN, "_rk_lcum", "_rk_off", "_rk_voff")
  }

  /** SQL `ntile(k)` bucket from a 1-based global rank, in pure integer
    * math (no window): with n rows the first `n % k` buckets take
    * `n/k + 1` rows, the rest `n/k` — exactly the standard semantics, so
    * the oracle's `ntile(k) OVER (ORDER BY …)` matches value-for-value.
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    // Column./ is IEEE division — floor+cast makes it integral. Exact for
    // n ≤ 2⁵² (doubles represent every integer there); beyond that no
    // single ntile input is realistic.
    def idiv(a: Column, b: Column): Column =
      floor(a.cast("double") / b.cast("double")).cast("long")
    val base = idiv(n, lit(k))
    val rem = pmod(n, lit(k))
    val cut = (base + lit(1)) * rem // rows in the oversized buckets
    when(rank <= cut, idiv(rank - 1, base + 1) + 1)
      .otherwise(rem + idiv(rank - cut - 1, base) + 1)
      .cast("int")
  }
}
