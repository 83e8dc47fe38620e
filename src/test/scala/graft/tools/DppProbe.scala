package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: find the conf under which dynamic partition pruning fires on
  * test-sized data (the PlanSpec DPP pin uses the result).
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val scratch = "/tmp/dpp_probe/fact"
    val dimPath = "/tmp/dpp_probe/dim"
    graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(scratch)
    Seq(("click", 1), ("view", 2), ("purchase", 3))
      .toDF("event_type", "grp").write.mode("overwrite").parquet(dimPath)

    def tryIt(tag: String)(conf: => Unit): Unit = {
      conf
      val dim = spark.read.parquet(dimPath).filter(col("grp") === 1)
      val joined = spark.read.parquet(scratch).join(dim, "event_type")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString +
        joined.queryExecution.optimizedPlan.toString
      println(s"[dppprobe] $tag: dpp=${p.contains("dynamicpruning")}")
    }
    tryIt("defaults")(())
    tryIt("nostats")(spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false"))
    tryIt("ratio5")(spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "5"))
    tryIt("noAQE")(spark.conf.set("spark.sql.adaptive.enabled", "false"))
    spark.stop()
  }
}
