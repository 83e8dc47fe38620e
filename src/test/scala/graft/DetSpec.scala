package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Det, Splits}

/** The determinism primitives (Q contract rules) and hash-split invariants. */
class DetSpec extends SparkSpec {
  import spark.implicits._

  test("exactSum is invariant under repartitioning (order-independent)") {
    val vals = (1 to 10000).map(i => (i % 7, (i % 997) / 100.0 + 0.01))
    def total(parts: Int) = vals.toDF("k", "v").repartition(parts)
      .groupBy("k").agg(Det.exactSum($"v").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(total(1) === total(32))
  }

  test("floorRound: deterministic at exact .5 boundaries, matches round off-tie") {
    val df = Seq(0.15625, 0.12344, 0.12346, -0.25, 1.99995).toDF("x")
      .select($"x", Det.floorRound($"x", 4).as("fr"), round($"x", 4).as("rd"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(rows(0.15625) === 0.1563) // the 5/32 tie: floor formula picks up
    assert(rows(0.12344) === 0.1234)
    assert(rows(0.12346) === 0.1235)
    assert(rows(1.99995) === 2.0)
    // off-tie values agree with plain round()
    assert(df.filter($"x" =!= 0.15625 && $"x" >= 0 && $"fr" =!= $"rd").count() === 0)
  }

  test("ppsSample: hand-checked picks; two-level scan == single cumsum; hit count exact") {
    // total 100, n = 4 → step 25; cums 10,40,40,45,60,100 → multiples
    // 25,50,75,100 land in ids 1, 4, 5, 5 (id 5 spans two multiples)
    val tiny = Seq((0L, 10L), (1L, 30L), (2L, 0L), (3L, 5L), (4L, 15L), (5L, 40L))
      .toDF("id", "w")
    val out = Splits.ppsSample(tiny, "id", $"w", n = 4, bucketWidth = 2L)
      .orderBy("id")
      .select("id", "cum", "pick_idx", "n_hits")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 40L, 1L, 1L), (4L, 60L, 2L, 1L), (5L, 100L, 3L, 2L)))

    // real corpus: the two-level scan must equal a single global cumsum
    // (integer addition reassociates), hits must sum to total div step,
    // and the draw must be partitioning-invariant
    val docs = Tables.documents(spark, sf)
    val w = docs.select($"doc_id".as("id"),
      size(graft.extensions.TextOps.tokens($"text")).cast("long").as("w"))
    val total = w.agg(sum($"w")).head().getLong(0)
    val step = math.max(1L, total / 100)
    def draw(df: org.apache.spark.sql.DataFrame) =
      Splits.ppsSample(df, "id", $"w", n = 100, bucketWidth = 64L)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    val d1 = draw(w)
    assert(d1.toSeq.map(_._3).sum === total / step)
    assert(draw(w.repartition(17)) === d1)
    // single-window replay (the oracle's shape) on the driver
    val rows = w.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val expected = rows.flatMap { case (id, wi) =>
      val prev = cum; cum += wi
      if (wi > 0 && cum / step > prev / step) Some((id, cum, cum / step - prev / step))
      else None
    }.toSet
    assert(d1 === expected)
  }

  test("budgetFill: hand-checked greedy fill; band scan == single-order cumsum") {
    // quality order: id4 (1.0, w=0 → excluded), id0 (.9, 10), id2 (.9, 30),
    // id1 (.5, 20), id3 (.2, 40); cums 10/40/60 — budget 45 keeps 0, 2 and
    // the boundary doc 1, never 3
    val tiny = Seq((0L, 10L, 0.9), (1L, 20L, 0.5), (2L, 30L, 0.9),
      (3L, 40L, 0.2), (4L, 0L, 1.0)).toDF("id", "w", "q")
    val out = Splits.budgetFill(tiny, "id", $"w", $"q", budget = 45L)
      .orderBy("id").select("id", "w", "score_q", "cum")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 10L, 9000L, 10L), (1L, 20L, 5000L, 60L),
      (2L, 30L, 9000L, 40L)))

    // real corpus: the banded two-level scan must equal the single-order
    // greedy fill, and be partitioning-invariant
    val q = graft.extensions.TextAnalysis.qualityScore(
      Tables.documents(spark, sf), "doc_id", "text")
    def fill(df: org.apache.spark.sql.DataFrame) =
      Splits.budgetFill(df, "doc_id", $"n_tokens", $"quality_score", 5000L)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val got = fill(q)
    assert(fill(q.repartition(17)) === got)
    val rows = q.select($"doc_id", $"n_tokens",
        floor($"quality_score" * 1e4 + 0.5).cast("long").as("sq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, sq) => (-sq, id) }
    var cum = 0L
    val expected = rows.flatMap { case (id, w, _) =>
      val prev = cum; cum += w
      if (w > 0 && prev < 5000L) Some((id, cum)) else None
    }.toSet
    assert(got === expected)
  }

  test("hash split: exhaustive, disjoint, partition-invariant, ~80/10/10") {
    val ids = spark.range(20000).toDF("id")
    val s1 = Splits.withSplit(ids, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Splits.withSplit(ids.repartition(17), "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    assert(s1.values.sum === 20000L)
    assert(s1.keySet === Set("train", "valid", "test"))
    assert(math.abs(s1("train") / 20000.0 - 205.0 / 256) < 0.01)
    assert(math.abs(s1("valid") / 20000.0 - 25.0 / 256) < 0.01)
  }
}
