package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Histograms, Repetition, Sampling, Scrub, Vectors}

/** Round-4 operators: deterministic sampling, PII scrub, repetition
  * metrics, embedding quantization, histogram quantiles, group centroids.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // --- Sampling ---------------------------------------------------------

  test("stratified sample is a deterministic pure function of ids") {
    val ev = Tables.events(spark, sf)
    val rates = Seq("purchase" -> 256, "click" -> 128, "view" -> 64)
    val a = Sampling.stratified(ev, "event_id", "event_type", rates)
      .select("event_id").as[Long].collect().toSet
    val b = Sampling.stratified(ev.repartition(13), "event_id", "event_type", rates)
      .select("event_id").as[Long].collect().toSet
    assert(a === b) // partitioning-independent
    val purchases = ev.filter($"event_type" === "purchase")
      .select("event_id").as[Long].collect().toSet
    assert(purchases.subsetOf(a)) // rate 256/256 keeps everything
    val nView = ev.filter($"event_type" === "view").count()
    val nViewKept = Sampling.stratified(ev, "event_id", "event_type", rates)
      .filter($"event_type" === "view").count()
    // 64/256 = 25% nominal; md5 buckets are uniform, allow wide slack
    assert(nViewKept > nView / 8 && nViewKept < nView / 2,
      s"kept $nViewKept of $nView views")
    // default rate 0 drops unlisted strata entirely
    val kept = Sampling.stratified(ev, "event_id", "event_type", rates)
      .select("event_type").distinct().as[String].collect().toSet
    assert(!kept.contains("error") && !kept.contains("signup"))
  }

  test("groupTopK returns exactly min(k, |group|) rows per group, stably") {
    val ev = Tables.events(spark, sf)
    val sizes = Sampling.groupTopK(ev, "event_type", "event_id", 50)
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val full = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    full.foreach { case (t, n) => assert(sizes(t) === math.min(50L, n)) }
    val a = Sampling.groupTopK(ev, "event_type", "event_id", 50)
      .select("event_id").as[Long].collect().toSet
    val b = Sampling.groupTopK(ev.repartition(7), "event_type", "event_id", 50)
      .select("event_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("groupTopK plans a two-phase (Partial) WindowGroupLimit") {
    val p = Sampling.groupTopK(Tables.events(spark, sf), "event_type", "event_id", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
  }

  // --- Scrub ------------------------------------------------------------

  test("scrubPii redacts emails and phones; counts match") {
    val df = Seq(
      ("hi bob@corp.io and alice.smith@mail.example.org", 2, 0),
      ("call +1-555-0199 or 44-555-0100", 0, 2),
      ("mixed a@b.co then 1-234-5678", 1, 1),
      ("clean text, no pii at all", 0, 0))
      .toDF("t", "emails", "phones")
    val out = df.select(Scrub.scrubPii($"t").as("s"),
      Scrub.emailCount($"t").as("ne"), Scrub.phoneCount($"t").as("np"),
      $"emails", $"phones").collect()
    out.foreach { r =>
      assert(r.getInt(1) === r.getInt(3), r.toString)
      assert(r.getInt(2) === r.getInt(4), r.toString)
      assert(!r.getString(0).contains("@") || r.getString(0).contains("<EMAIL>"))
    }
    val s0 = out(0).getString(0)
    assert(s0 === "hi <EMAIL> and <EMAIL>")
    assert(out(1).getString(0) === "call <PHONE> or <PHONE>")
  }

  // --- Repetition -------------------------------------------------------

  test("repetition metrics match hand-computed values") {
    val docs = Seq(
      (1L, "a a b"),        // 3 tokens, 2 types, bigrams {a a, a b} all distinct
      (2L, "x x x x"),      // bigrams: x x ×3 → dup frac 1 - 1/3
      (3L, "solo"),         // one token: no bigrams
      (4L, ""))             // empty: no tokens
      .toDF("doc_id", "text")
    val m = Repetition.metrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getLong(1) === 3L && m(0).getLong(2) === 2L)
    assert(m(0).getDouble(3) === 0.666667) // ttr
    assert(m(0).getDouble(4) === 0.666667) // top_frac (a appears 2/3)
    assert(m(0).getDouble(5) === 0.0)      // all bigrams distinct
    assert(m(1).getDouble(5) === 0.666667) // 1 - 1/3
    assert(m(2).getLong(1) === 1L && m(2).isNullAt(5)) // no bigrams
    assert(m(3).getLong(1) === 0L && m(3).isNullAt(3)) // no tokens
  }

  // --- Vectors ----------------------------------------------------------

  test("quantizeScalar codes span [0, 255] and hit the range endpoints") {
    val emb = Tables.embeddings(spark, sf)
    val q = Vectors.quantizeScalar(emb, "vec_id", "embedding").collect()
    assert(q.length === emb.count())
    q.foreach { r =>
      assert(r.getInt(2) >= 0 && r.getInt(3) <= 255, r.toString)
    }
    // some vector holds the global per-dim min (code 0) / max (code 255)
    assert(q.exists(_.getInt(2) === 0))
    assert(q.exists(_.getInt(3) === 255))
  }

  test("groupCentroids: singleton group reproduces its vector (±1 micro-unit)") {
    val one = Seq((7L, Array(0.25f, -1.5f, 3.125f))).toDF("g", "v")
    val c = Vectors.groupCentroids(one, "g", "v").orderBy("pos")
      .select("comp").as[Float].collect()
    assert(c.zip(Seq(0.25f, -1.5f, 3.125f)).forall {
      case (a, b) => math.abs(a - b) <= 1e-6f
    })
    val ev = Tables.embeddings(spark, sf)
    val cents = Vectors.groupCentroids(ev, "label", "embedding")
    val dims = ev.select(size($"embedding")).as[Int].head()
    val labels = ev.select("label").distinct().count()
    assert(cents.count() === labels * dims) // |groups| · dims, not corpus-sized
  }

  // --- Histograms -------------------------------------------------------

  test("histogram quantile estimates bracket the exact percentiles") {
    // 100 values 0..99, width 10: p50 rank crosses in bin 4 (cum 50 at v=49),
    // p90 in bin 8 (cum 90 at v=89)
    val df = spark.range(100).select(lit("g").as("g"), $"id".cast("double").as("v"))
    val r = Histograms.quantileEstimates(df, "g", "v", 10.0).head()
    assert(r.getLong(1) === 100L)
    assert(r.getDouble(2) === 40.0, s"p50_lo ${r.getDouble(2)}")
    assert(r.getDouble(3) === 80.0, s"p90_lo ${r.getDouble(3)}")
  }
}
