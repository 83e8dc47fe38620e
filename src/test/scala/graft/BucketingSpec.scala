package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed layout: same-key, same-count bucketed tables join with no
  * shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists — remove it so saveAsTable can recreate
    val dir = new java.io.File(s"spark-warehouse/$name")
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("bucketed fact-fact join eliminates both shuffle exchanges") {
    dropTable("b_orders")
    dropTable("b_lineitem")
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 4, Seq("o_orderkey"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1") // force the non-broadcast path to expose exchanges
    try {
      val joined = Bucketing.readBucketed(spark, "b_orders")
        .join(Bucketing.readBucketed(spark, "b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // and the result is still the plain join's result
      val expect = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey").count()
      assert(joined.count() === expect)
    } finally spark.conf.set(key, prev)
  }

  test("non-bucketed same join shuffles (control)") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val plain = Tables.orders(spark, sf).select("o_orderkey")
        .join(Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey")),
          "o_orderkey")
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set(key, prev)
  }
}
