package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0, "entry returned no rows")
    // duplicate-name check must run PRE-Map (toMap silently collapses
    // duplicates): Registry.all carries the require on the raw Seq, and the
    // Map must not have dropped anything relative to it
    require(graft.SparkEntry.queries.size == graft.queries.Registry.all.size,
      "SparkEntry.queries dropped entries relative to Registry.all")
    val q = graft.SparkEntry.queries.size
    val o = graft.SparkEntry.oracleSql.size
    println(s"[smoke] queries=$q oracleSql=$o")
    require(graft.SparkEntry.oracleSql.keySet.subsetOf(graft.SparkEntry.queries.keySet))
    spark.stop()
  }
}
