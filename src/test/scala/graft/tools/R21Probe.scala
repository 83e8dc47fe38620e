package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for the round-21 optimization session:
  * times the component stages of the expensive composed queries (h122's
  * pipeline stages, the classifier trainer's featurize-vs-steps split)
  * so optimization effort lands where the seconds are.
  *
  * Usage: Test/runMain graft.tools.R21Probe [sfDir]
  */
object R21Probe {
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
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = graft.Tables.documents(spark, sfDir)
    import graft.extensions._

    // ---- h122 stage decomposition (mirrors Pipeline.curate) ----
    (1 to 2).foreach { round =>
      println(s"== h122 decomposition, round $round ==")
      val base = time("stage-0 checkpoint (tokens+keep)") {
        val par = spark.sessionState.conf.numShufflePartitions
        val src = if (docs.rdd.getNumPartitions < par) docs.repartition(par)
                  else docs
        val b = TextAnalysis.withCleanKeep(
          src.select(col("doc_id"), col("text"), col("source"),
            coalesce(size(TextOps.tokens(col("text"))), lit(0)).cast("long")
              .as("__ntok")),
          "text", "__keep").localCheckpoint(eager = false)
        b.count(); b
      }
      val cleanDocs = time("clean filter") {
        val d = base.filter(col("__keep")).drop("__keep")
        d.count(); d
      }
      val repDocs = time("exact reps") {
        val repIds = cleanDocs
          .select(col("doc_id"), md5(TextOps.normalized(col("text"))).as("__fp"))
          .groupBy("__fp").agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val d = cleanDocs.join(repIds, "doc_id").persist()
        d.count(); d
      }
      val pairs = time("verifiedNearDupScores build") {
        val p = Dedup.verifiedNearDupScores(
          repDocs.select(col("doc_id"), col("text")), "doc_id", "text",
          minJaccardQ = 5000L).localCheckpoint(eager = false)
        noop(p); p
      }
      val keptDocs = time("kept anti-join") {
        val d = repDocs.join(
          pairs.filter(col("jacc_q") >= 8000L)
            .select(col("id_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti").localCheckpoint(eager = false)
        d.count(); d
      }
      val keptIds = keptDocs.select(col("doc_id"))
      time("splitRepair (CC loop)") {
        val leakPairs = pairs
          .join(keptIds.toDF("id_a"), "id_a")
          .join(keptIds.toDF("id_b"), "id_b")
          .select("id_a", "id_b")
        noop(Dedup.splitRepair(leakPairs, policy = "move_to_train"))
      }
      val gatedDocs = time("qualityLrScores (8 steps) + gate") {
        val g = Classifier.qualityLrScores(keptDocs, "doc_id", "text",
            toks => size(filter(toks, t => t === "spark")) >= 2, 256, 8)
          .filter(col("pred") === 1).select(col("doc_id"))
        val d = keptDocs.join(g, "doc_id").localCheckpoint(eager = false)
        d.count(); d
      }
      time("exportManifest agg") {
        val m = Chunking.exportManifest(gatedDocs, "doc_id", "text",
          29L, 256, 4L, 16)
        m.agg(coalesce(sum(col("n_docs")), lit(0L)),
          coalesce(sum(col("n_tokens")), lit(0L)), count(lit(1))).head()
      }
      time("10 parallel ledger cells (sim)") {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val fs = Seq(base, cleanDocs, repDocs, keptDocs, gatedDocs).map(d =>
          Future(d.agg(count(lit(1)),
            coalesce(sum(col("__ntok")), lit(0L))).head())) ++
          Seq(Future(pairs.filter(col("jacc_q") >= 8000L).count()),
            Future(keptIds.count()))
        fs.foreach(Await.result(_, Duration.Inf))
        pool.shutdown()
      }
      cleanDocs.unpersist(false); repDocs.unpersist(false)
    }

    // ---- trainer decomposition ----
    (1 to 2).foreach { round =>
      println(s"== h116 trainer decomposition, round $round ==")
      val t0 = System.nanoTime()
      val scored = Classifier.qualityLrScores(docs, "doc_id", "text",
        toks => size(filter(toks, t => t === "spark")) >= 2, 256, 12)
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(f"[probe] trainState(12 steps)+plan          $tBuild%8.3f s")
      time("final scoring noop")(noop(scored))
    }

    spark.stop()
  }
}
