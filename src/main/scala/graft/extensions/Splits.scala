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

  /** Deterministic token-budget PPS (probability-proportional-to-size)
    * sampling — systematic selection over the cumulative weight mass: lay
    * every row's weight on the integer number line in id order and pick
    * each row whose interval `(cum − w, cum]` crosses a multiple of
    * `step = max(1, total div n)`. Rows are selected with probability
    * proportional to weight (a row with w ≥ step is ALWAYS picked, with
    * `n_hits` ≥ 1 multiplicity), exactly `total div step` hits are drawn,
    * and the whole construction is pure integer math — reproducible across
    * runs, engines and partitionings, and replayable by the SQL oracle
    * (unlike rand()-keyed PPS, which changes with layout). The canonical
    * use: sample ~n documents proportional to token counts so the draw's
    * expected token mass matches a training-mix budget.
    *
    * The cumulative sum is a DISTRIBUTED TWO-LEVEL PREFIX SCAN, not a
    * global window: ids bucket by `id div bucketWidth`; per-bucket totals
    * aggregate map-side (nBuckets rows out); their exclusive running
    * offsets compute on that tiny totals relation (the only unpartitioned
    * window — bounded by nBuckets, then broadcast back); and the
    * corpus-sized within-bucket cumsum is a window PARTITIONED by bucket.
    * Every corpus-scale operation is partition-parallel — the classic scan
    * decomposition. At 100 TB, bucketWidth sizes buckets to a partition,
    * and the same two-phase shape serves any id-ordered prefix aggregate
    * (quota fills, curriculum cutoffs, token-budget truncation).
    *
    * Output: picked rows only — (id, w, cum, pick_idx, n_hits), pick_idx
    * the index of the first step multiple inside the row's interval.
    */
  def ppsSample(df: DataFrame, idCol: String, weight: Column, n: Int,
      bucketWidth: Long = 1L << 20): DataFrame = {
    require(n >= 1, s"sample size n must be >= 1, got $n")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // NULL and negative weights both clamp to 0 (and are then excluded by
    // the w > 0 pick filter): a negative w would make the cumulative sum
    // non-monotonic, silently breaking the systematic-selection invariants
    // (duplicate/missed picks, wrong n_hits) the contract promises
    val w = df.select(col(idCol).as("id"),
      greatest(coalesce(weight.cast("long"), lit(0L)), lit(0L)).as("w"))
    val b = w.withColumn("bucket", expr(s"id div $bucketWidth"))
    val total = b.agg(sum(col("w")).as("total"))
    twoLevelCum(b, Seq(col("id")))
      .crossJoin(broadcast(total))
      .withColumn("step", greatest(lit(1L), expr(s"total div $n")))
      .filter(col("w") > 0 &&
        expr("cum div step") > expr("(cum - w) div step"))
      .select(col("id"), col("w"), col("cum"),
        expr("CAST((cum - w) div step + 1 AS BIGINT)").as("pick_idx"),
        expr("CAST(cum div step - (cum - w) div step AS BIGINT)").as("n_hits"))
  }

  /** Token-budget fill — "take the BEST documents until the budget is
    * spent": rows are laid on the cumulative weight line in descending
    * `score` order (id tiebreak) and every positive-weight row whose
    * interval starts before `budget` is kept, so the kept set is exactly
    * the greedy quality-first fill of a token budget (the boundary
    * document that exhausts the budget ships — drop the last row
    * client-side for a strict-under fill). The selection recipe of a
    * "fill N tokens with the highest-quality data" training mix, as pure
    * integer math: reproducible across runs, engines and layouts, and
    * replayable by a single SQL cumsum.
    *
    * `score` must be a [0,1] value already quantized to 4 dp (the
    * [[TextAnalysis.qualityScore]] contract); it is lifted to integer
    * 10⁻⁴ units and the prefix sum runs over the same DISTRIBUTED
    * TWO-LEVEL SCAN as [[ppsSample]] — here the buckets are descending
    * score BANDS (`(10000 − score_q) div bandWidth`, ascending bucket ⇔
    * descending score range, so the band concatenation IS the global
    * order), the within-band cumsum is band-partitioned, and only the
    * ≤ 10000/bandWidth band totals cross the one tiny unpartitioned
    * window. A skewed score distribution concentrates rows in few bands —
    * shrink bandWidth (more, smaller bands) the way you would re-bucket
    * any range partitioning.
    *
    * `tieWidth` is the escape hatch for the DEGENERATE distribution no
    * bandWidth can split — mass TIES on few quantized values (worst case:
    * every score equal, one band holds the corpus and its window
    * serializes through one task). With `tieWidth > 0` (requires
    * `bandWidth == 1`), the bucket becomes the PAIR
    * `(10000 − score_q, id div tieWidth)`: a width-1 band holds a single
    * quantized score, so subdividing it by id ranges is still exactly the
    * global `(score desc, id)` order — the concatenation of (band asc,
    * id-range asc, id asc) IS (score desc, id) when each band is one score
    * — and the window partition count scales with the corpus again
    * (ties/tieWidth partitions instead of 1). Size tieWidth like
    * [[ppsSample]]'s bucketWidth: one id-range ≈ one comfortable task. The
    * kept set and every cum are IDENTICAL to the plain path
    * (PropertySpec pins the equality); only the partitioning changes.
    *
    * Output: kept rows only — (id, w, score_q, cum).
    */
  def budgetFill(df: DataFrame, idCol: String, weight: Column, score: Column,
      budget: Long, bandWidth: Int = 100, tieWidth: Long = 0L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bandWidth >= 1 && bandWidth <= 10000,
      s"bandWidth must be in [1, 10000], got $bandWidth")
    require(tieWidth >= 0, s"tieWidth must be >= 0, got $tieWidth")
    require(tieWidth == 0 || bandWidth == 1,
      s"tieWidth > 0 requires bandWidth == 1 (a multi-score band subdivided " +
        s"by id is no longer the global score order); got bandWidth=$bandWidth")
    // same NULL/negative clamp as ppsSample — the cum line must be monotonic
    val rows = df.select(col(idCol).as("id"),
      greatest(coalesce(weight.cast("long"), lit(0L)), lit(0L)).as("w"),
      floor(score * 1e4 + 0.5).cast("long").as("score_q"))
    val b =
      if (tieWidth == 0)
        rows.withColumn("bucket", expr(s"(10000 - score_q) div $bandWidth"))
      else
        rows.withColumn("bucket",
          struct(expr("10000 - score_q").as("band"),
            expr(s"id div $tieWidth").as("sub")))
    twoLevelCum(b, Seq(col("score_q").desc, col("id")))
      .filter(col("w") > 0 && col("cum") - col("w") < budget)
      .select(col("id"), col("w"), col("score_q"), col("cum"))
  }

  /** The distributed two-level prefix scan [[ppsSample]] and [[budgetFill]]
    * share: `rows` carries (`bucket`, `w`, order columns…) where ascending
    * `bucket` concatenated with the within-bucket `order` IS the intended
    * global order. Per-bucket totals aggregate map-side; their exclusive
    * running offsets compute on the tiny totals relation (the only
    * unpartitioned window — nBuckets rows) and broadcast back; the
    * row-level cumsum is a bucket-PARTITIONED window. Returns the input
    * plus `cum`.
    */
  private def twoLevelCum(rows: DataFrame,
      order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totals = rows.groupBy("bucket").agg(sum(col("w")).as("bw"))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum(col("bw")).over(wOff), lit(0L)))
      .select("bucket", "off")
    val wIn = Window.partitionBy("bucket").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.join(broadcast(offsets), "bucket")
      .withColumn("cum", col("off") + sum(col("w")).over(wIn))
      .drop("off")
  }
}
