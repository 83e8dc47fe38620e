package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Funnel, Histograms, LmScore, Repetition, Sampling, Scrub, Vectors}

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

  test("stratified sample plans as a pure scan-stage filter (no exchange)") {
    val p = Sampling.stratified(Tables.events(spark, sf), "event_id",
      "event_type", Seq("purchase" -> 128)).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("quantizeScalar joins the per-dim min/max back by broadcast") {
    val p = Vectors.quantizeScalar(Tables.embeddings(spark, sf), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
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

  test("scrubPii is idempotent over realistic contact blobs") {
    val blob = concat($"c_name", lit(" contact: user"),
      $"c_custkey".cast("string"), lit("@example.com or +1-555-"),
      lpad(pmod($"c_custkey", lit(10000)).cast("string"), 4, "0"))
    val once = Tables.customer(spark, sf).select(Scrub.scrubPii(blob).as("s"))
    val n = once.filter(Scrub.scrubPii($"s") =!= $"s").count()
    assert(n === 0)
  }

  test("simhash banding finds EVERY pair within maxHamming (pigeonhole recall)") {
    import graft.extensions.Dedup
    val docs = Tables.documents(spark, sf)
    val found = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 2, 4, 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigs = Dedup.simhashLongs(docs, "doc_id", "text", 32)
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 2
    } yield (ia, ib)).toSet
    assert(found === brute) // banding is pruning, not approximation
    // integer signature bits ↔ string signature characters
    val strSigs = Dedup.simhashesN(docs, "doc_id", "text", 32)
      .as[(Long, String)].collect().toMap
    sigs.take(50).foreach { case (id, s) =>
      assert(java.lang.Long.toBinaryString(s).reverse.padTo(32, '0').reverse
        === strSigs(id), s"sig mismatch for doc $id")
    }
  }

  test("simhash pairing verifies BEFORE the distinct (only verified pairs shuffle)") {
    import graft.extensions.Dedup
    val p = Dedup.simhashNearDupPairs(Tables.documents(spark, sf),
      "doc_id", "text", 2, 4, 32).queryExecution.executedPlan.toString
    // the dedup aggregate groups the verified projection (id_a, id_b,
    // hamming) — a distinct over raw candidate rows (with sig columns)
    // would key on sig_a/sig_b instead, the 65s-at-sf0.1 shape
    assert("keys=\\[[^\\]]*hamming".r.findFirstIn(p).isDefined, p)
    assert(!"keys=\\[[^\\]]*sig_a".r.findFirstIn(p).isDefined, p)
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

  // --- LmScore ----------------------------------------------------------

  test("unigram LM scores match hand-computed fixed-point values") {
    val docs = Seq((1L, "a a a"), (2L, "a z")).toDF("doc_id", "text")
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val qa = q(4.0 / 5.0); val qz = q(1.0 / 5.0)
    val out = LmScore.unigramScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 3 * qa)
    assert(out(1).getLong(2) === qa + qz)
    val (avg1, avg2) = (out(0).getDouble(3), out(1).getDouble(3))
    assert(avg1 < 0 && avg2 < 0 && avg1 > avg2) // rare-token doc scores lower
  }

  // --- Funnel -----------------------------------------------------------

  test("funnel conversion: purchase before first click does not convert") {
    import java.sql.Timestamp
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ev = Seq(
      // user 1, one session: purchase BEFORE first click → not converted
      (1L, t(0), "purchase", 1L), (1L, t(5), "click", 2L),
      // user 2, one session: click then purchase → converted
      (2L, t(0), "click", 3L), (2L, t(10), "purchase", 4L),
      // user 2, second session (gap > 30 min): click only → not converted
      (2L, t(50), "click", 5L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Funnel.sessionConversion(ev, "user_id", "ts", "event_type",
      1800L, "click", "purchase")
      .orderBy("user_id", "session_n")
      .select("user_id", "session_n", "n_events", "has_from", "converted")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3), r.getInt(4))).toSeq === Seq(
      (1L, 1L, 2L, 1, 0), (2L, 1L, 2L, 1, 1), (2L, 2L, 1L, 1, 0)))
  }

  test("funnel is one shuffle end-to-end (window + agg reuse the partitioning)") {
    val p = Funnel.sessionConversion(Tables.events(spark, sf), "user_id", "ts",
      "event_type", 1800L, "click", "purchase")
      .queryExecution.executedPlan.toString
    assert(p.split("Exchange").length - 1 === 1, p)
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
