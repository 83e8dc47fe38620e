package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: executed shuffle volume (exchanges / records / bytes — the
  * [[graft.plans.ShuffleMetrics]] write-side totals) for named queries at a
  * scale dir, fresh-built per query like Round11Spec's measurement protocol.
  * Used to measure the values new Round11/Round12 ceilings pin.
  *
  * Usage: Test/runMain graft.tools.VolumeProbe <sfDir> <name> [<name>…]
  */
object VolumeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      graft.queries.DupGraph.reset()
      val vol = graft.plans.ShuffleMetrics.measure(
        graft.SparkEntry.queries(n)(spark, sfDir))
      println(s"[volume] $n@$sfDir exchanges=${vol.exchanges} " +
        s"records=${vol.records} bytes=${vol.bytes}")
    }
    spark.stop()
  }
}
