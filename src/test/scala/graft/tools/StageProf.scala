package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only per-stage profiler for the h122 curation pipeline: replays
  * [[graft.extensions.Pipeline.curate]]'s stage chain with an action +
  * wall-clock timestamp after each stage boundary, so optimization rounds
  * can attribute the query's seconds to stages before touching one.
  * Numbers are attribution evidence only (the stage boundaries force extra
  * materializations the production plan overlaps).
  *
  * Usage: Test/runMain graft.tools.StageProf [sfDir]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(100000).selectExpr("sum(id % 7)").collect()

    import graft.extensions._
    val t0 = System.nanoTime()
    var last = t0
    def lap(label: String): Unit = {
      val now = System.nanoTime()
      println(f"[stageprof] $label%-28s +${(now - last) / 1e9}%6.2f s  total ${(now - t0) / 1e9}%6.2f s")
      last = now
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val idCol = "doc_id"; val textCol = "text"
    val par = spark.sessionState.conf.numShufflePartitions
    val src = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val base = TextAnalysis.withCleanKeep(
      src.select(col(idCol), col(textCol), col("source"),
        coalesce(size(TextOps.tokens(col(textCol))), lit(0)).cast("long")
          .as("__ntok")),
      textCol, "__keep").localCheckpoint(eager = false)
    base.write.format("noop").mode("overwrite").save()
    lap("base (clean signals)")
    val cleanDocs = base.filter(col("__keep")).drop("__keep")
    val repIds = cleanDocs
      .select(col(idCol), md5(TextOps.normalized(col(textCol))).as("__fp"))
      .groupBy("__fp").agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val repDocs = cleanDocs.join(repIds, idCol).persist()
    repDocs.write.format("noop").mode("overwrite").save()
    lap("repDocs (exact dedup)")
    val pairs = Dedup.verifiedNearDupScores(
      repDocs.select(col(idCol), col(textCol)), idCol, textCol,
      minJaccardQ = 5000L).localCheckpoint(eager = false)
    pairs.write.format("noop").mode("overwrite").save()
    lap("pairs (LSH+verify)")
    val keptDocs = repDocs
      .join(pairs.filter(col("jacc_q") >= 8000L)
        .select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .localCheckpoint(eager = false)
    keptDocs.write.format("noop").mode("overwrite").save()
    lap("keptDocs (near dedup)")
    val keptIds = keptDocs.select(col(idCol))
    val leakPairs = pairs
      .join(keptIds.toDF("id_a"), "id_a")
      .join(keptIds.toDF("id_b"), "id_b")
      .select("id_a", "id_b")
    val moves = Dedup.splitRepair(leakPairs, policy = "move_to_train")
      .localCheckpoint(eager = false)
    moves.write.format("noop").mode("overwrite").save()
    lap("moves (CC repair)")
    val gatedIds = Classifier.qualityLrScores(keptDocs, idCol, textCol,
        toks => size(filter(toks, t => t === "spark")) >= 2, 256, 8)
      .filter(col("pred") === 1)
      .select(col(idCol))
    val gatedDocs = keptDocs.join(gatedIds, idCol)
      .localCheckpoint(eager = false)
    gatedDocs.write.format("noop").mode("overwrite").save()
    lap("gatedDocs (classifier)")
    val rawSplit = keptIds.withColumn("split", Splits.splitLabel(col(idCol)))
    val effSplit = rawSplit
      .join(moves.select(col("doc_id").as(idCol), col("split_new")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("split_new"), col("split")).as("split"))
    val trainDocs = gatedDocs
      .join(effSplit.filter(col("split") === "train").select(col(idCol)), idCol)
      .localCheckpoint(eager = false)
    trainDocs.write.format("noop").mode("overwrite").save()
    lap("trainDocs (select)")
    val manifest = Chunking.exportManifest(trainDocs, idCol, textCol,
      29L, 256, 4L, 16)
    manifest.agg(count(lit(1))).head()
    lap("manifest (pack+export)")
    spark.stop()
  }
}
