package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.extensions.TextOps
import graft.functions.{GraftFunctions, MaxRunLength, SimHashLong, WinnowMins}

/** Round 10: SQL registration of the native kernels. Each kernel's SQL form
  * must be expression-identical to the Scala-API (bridge) form — asserted
  * value-for-value over the real documents corpus, not a toy literal.
  */
class Round10Spec extends SparkSpec {

  private def docTokens = {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
  }

  test("simhash_long: SQL form == Scala-API form on real tokens") {
    val both = docTokens.select(
      col("doc_id"),
      GraftColumnBridge.column(SimHashLong(
        GraftColumnBridge.expression(col("toks")), 24)).as("api"),
      expr("simhash_long(toks, 24)").as("sql"))
    assert(both.filter(not(col("api") <=> col("sql"))).count() === 0)
    assert(both.filter(col("api").isNotNull).count() > 0)
  }

  test("winnow_mins: SQL form == Scala-API form on real shingles") {
    val both = docTokens
      .select(col("doc_id"), TextOps.shingles3(col("toks")).as("sh"))
      .select(
        GraftColumnBridge.column(WinnowMins(
          GraftColumnBridge.expression(col("sh")), 4)).as("api"),
        expr("winnow_mins(sh, 4)").as("sql"))
    assert(both.filter(not(col("api") <=> col("sql"))).count() === 0)
    assert(both.filter(size(col("api")) > 0).count() > 0)
  }

  test("max_run_length: SQL form == Scala-API form on sorted tokens") {
    val both = docTokens.select(
      GraftColumnBridge.column(MaxRunLength(
        GraftColumnBridge.expression(sort_array(col("toks"))))).as("api"),
      expr("max_run_length(sort_array(toks))").as("sql"))
    assert(both.filter(not(col("api") <=> col("sql"))).count() === 0)
    assert(both.filter(col("api") > 1).count() > 0)
  }

  test("parameter arguments must be constant INTs (clear error otherwise)") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      docTokens.select(expr("simhash_long(toks, size(toks))")).collect()
    }
    assert(e.getMessage.contains("constant INT"), e.getMessage)
    val n = intercept[Exception] {
      docTokens.select(expr("winnow_mins(toks, CAST(NULL AS INT))")).collect()
    }
    assert(n.getMessage.contains("must not be NULL"), n.getMessage)
  }

  test("extensions surface injects every native function") {
    // GraftExtensions.apply injects exactly GraftFunctions.all, so the
    // descriptor set IS the extensions surface; register() installs the same
    // seq imperatively — assert the set and that each resolves in-session.
    val names = GraftFunctions.all.map(_._1.funcName).toSet
    assert(names === Set(
      "cosine_sim", "simhash_long", "winnow_mins", "max_run_length"))
    GraftFunctions.register(spark)
    names.foreach { fn =>
      assert(spark.catalog.functionExists(fn), s"$fn not registered")
    }
  }
}
