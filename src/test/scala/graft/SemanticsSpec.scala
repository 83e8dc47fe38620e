package graft

import org.apache.spark.sql.functions._

/** Edge-semantics unit tests for the reference's trickier operators
  * (SURVEY.md §7.4): pandas-capitalize, coerce-parse, fillna, deterministic
  * dedup.
  */
class SemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("pandas capitalize: first char upper, ALL remaining lower (≠ initcap)") {
    val df = Seq("home goods", "HOME GOODS", "a", "", "éclair TART")
      .toDF("s")
      .select(concat(upper(substring($"s", 1, 1)), lower(expr("substring(s, 2)"))).as("cap"))
    assert(df.as[String].collect().toSeq ===
      Seq("Home goods", "Home goods", "A", "", "Éclair tart"))
  }

  test("pandas capitalize is idempotent") {
    val in = Seq("Home Goods", "x", "ALL CAPS").toDF("s")
    val once = in.select(concat(upper(substring($"s", 1, 1)), lower(expr("substring(s, 2)"))).as("s"))
    val twice = once.select(concat(upper(substring($"s", 1, 1)), lower(expr("substring(s, 2)"))).as("s"))
    assert(once.as[String].collect().toSeq === twice.as[String].collect().toSeq)
  }

  test("try_to_timestamp coerces malformed input to null (pandas errors='coerce')") {
    val df = Seq("2024-01-02 03:04:05", "not-a-date", "2024-13-45 99:99:99", "")
      .toDF("ts_s")
      .select(try_to_timestamp($"ts_s", lit("yyyy-MM-dd HH:mm:ss")).as("ts"))
    val got = df.select($"ts".isNotNull).as[Boolean].collect().toSeq
    assert(got === Seq(true, false, false, false))
  }

  test("fillna via coalesce") {
    val df = Seq(Some("A"), None, Some("B")).toDF("seg")
      .select(coalesce($"seg", lit("Unknown")).as("seg"))
    assert(df.as[String].collect().toSeq === Seq("A", "Unknown", "B"))
  }

  test("deterministic dedup keeps the min-keyed row regardless of input order") {
    val a = Seq((1, "x", 10), (1, "y", 5), (2, "z", 7)).toDF("k", "v", "ord")
    val b = Seq((2, "z", 7), (1, "y", 5), (1, "x", 10)).toDF("k", "v", "ord")
    def dedup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(min(struct($"ord", $"v")).as("m"))
        .select($"k", $"m.v".as("v"))
        .orderBy($"k")
    assert(dedup(a).collect().toSeq === dedup(b).collect().toSeq)
  }

  test("events loader surfaces ts as a usable timestamp") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    assert(ev.filter($"ts".isNull).count() === 0)
    val y = ev.select(year($"ts")).distinct().as[Int].collect()
    assert(y.forall(_ >= 2000))
  }
}
