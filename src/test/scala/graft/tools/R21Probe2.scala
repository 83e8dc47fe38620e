package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: why does h122's clean stage cost ~4 s when h22 costs 0.7 s? */
object R21Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    spark.range(100000).selectExpr("sum(id % 7)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = graft.Tables.documents(spark, sfDir)
    import graft.extensions._
    println(s"[probe] docs partitions=${docs.rdd.getNumPartitions} rows=${docs.count()}")

    (1 to 3).foreach { round =>
      println(s"== round $round ==")
      val base = docs.select(col("doc_id"), col("text"), col("source"),
        coalesce(size(TextOps.tokens(col("text"))), lit(0)).cast("long")
          .as("__ntok"))
      time("base noop (tokenize only)")(noop(base))
      time("base.filter(cleanKeep) noop")(
        noop(TextAnalysis.withCleanKeep(base, "text", "__keep")
          .filter(col("__keep"))))
      time("cleanCorpus noop (h22 form)")(
        noop(TextAnalysis.cleanCorpus(docs, "doc_id", "text")))
      time("base repartitioned filter noop")(
        noop(TextAnalysis.withCleanKeep(base.repartition(32), "text", "__keep")
          .filter(col("__keep"))))
      val p1 = time("filter+persist+count") {
        val d = TextAnalysis.withCleanKeep(base, "text", "__keep")
          .filter(col("__keep")).persist()
        d.count(); d
      }
      p1.unpersist(false)
      val p2 = time("repart+filter+persist+count") {
        val d = TextAnalysis.withCleanKeep(base.repartition(32), "text", "__keep")
          .filter(col("__keep")).persist()
        d.count(); d
      }
      p2.unpersist(false)
    }
    spark.stop()
  }
}
