package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm one-time session costs (JVM, codegen framework, parquet reader,
    // shuffle machinery) so the first measured query isn't charged for them.
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      // noop sink materializes every output column (a count() would let
      // Catalyst prune the projections being measured)
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name: $e")
          None
        }
      }
      // best of 2 runs per query: sf0.1 per-query times are dominated by
      // fixed stage latency, and a single GC/compilation stall on one run
      // showed 2-5x swings round-to-round (BENCH_r02 h5=25s vs 5.5s rerun).
      // min-of-2 keeps plan-level regressions visible (both runs pay them)
      // while de-noising one-off stalls. A query enters `failed` only when
      // BOTH attempts crash — a run-1 success with a run-2 crash still has a
      // valid timing, and nothing is listed twice.
      val times = List(once(), once()).flatten
      // a multi-minute HOST freeze can span both back-to-back runs (observed
      // 2026-08-13: a ~1 s query measured 127 s on both attempts while the
      // rest of the run was normal — see BASELINE.md), which best-of-2
      // cannot de-noise. No single declared query exceeds ~12 s median at
      // sf0.1 even on a 2x-slow host, so a best-of-2 above 25 s is far more
      // likely a stall than a plan: take one later third sample. A genuine
      // regression still shows (all three samples pay it).
      val retried =
        if (times.nonEmpty && times.min > 25.0) times ++ once() else times
      if (retried.isEmpty) failed ::= name
      name -> retried.sorted.headOption.getOrElse(0.0)
    }
    // 3-decimal (ms) precision: the driver locates this line in a bounded
    // tail window of stdout — full double precision pushed the 66-query line
    // past the window in round 3 (BENCH_r03 parsed:null). ms precision keeps
    // the line well under the window at 100+ queries and loses nothing at
    // the 0.1s+ timescales being compared.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Per-query keys are the short id prefix ("h41", not
    // "h41_simhash_near_dup") — the short form keeps the line ~1.3 KB at
    // 100+ queries, far inside the driver's tail window. Nothing else
    // enforces prefix uniqueness (SparkEntry.queries is a Map, so even
    // full-name duplicates would be silently dropped upstream), so fail
    // loudly here rather than emit duplicate JSON keys that lose a timing.
    val prefixes = results.keys.toSeq.map(_.takeWhile(_ != '_'))
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate bench key prefixes: ${prefixes.diff(prefixes.distinct).distinct.mkString(",")}")
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + f3(v)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // a crashed query records ~0s — surface failures in the JSON so a broken
    // round can never read as a performance win
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
