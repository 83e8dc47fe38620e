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
