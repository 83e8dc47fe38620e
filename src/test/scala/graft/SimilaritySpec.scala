package graft

import org.apache.spark.sql.functions._

import graft.extensions.Similarity
import graft.functions.GraftFunctions

/** Native CosineSimilarity expression: bit-for-bit parity with the HOF
  * composition (the oracle contract), codegen activation, null semantics,
  * SQL registration, and ANN recall.
  */
class SimilaritySpec extends SparkSpec {

  private def embs = Tables.embeddings(spark, sf)

  test("native cosine == HOF cosine bit-for-bit on real embeddings") {
    val a = embs.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = embs.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = a.join(b, col("id_a") < col("id_b")).limit(20000)
      .select(
        Similarity.cosine(col("va"), col("vb")).as("fast"),
        Similarity.cosineHof(col("va"), col("vb")).as("hof"))
    // exact double equality — same op order, same promotions
    assert(pairs.filter(col("fast") =!= col("hof")).count() === 0)
    assert(pairs.filter(col("fast").isNull).count() === 0)
  }

  test("native cosine runs inside WholeStageCodegen") {
    val plan = embs.select(Similarity.cosine(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // `*(n)` marks operators fused into a WholeStageCodegen span — the
    // projection containing cosine_sim must carry it (i.e. doGenCode was
    // used, no interpreted fallback)
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_sim") && l.trim.startsWith("*(")), plan)
  }

  test("null semantics: null array, length mismatch, null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),
      (2L, None, Some(Seq(1.0f, 2.0f))),
      (3L, Some(Seq(1.0f)), Some(Seq(1.0f, 2.0f))),
      // zero-norm vector: cosine undefined → null (NOT NaN, which would
      // sort above every real cosine and win every top-k)
      (4L, Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 2.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("cosine_sim registers as a SQL function (extensions surface)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(r) < 1e-12)
  }

  test("native hyperplane signature == HOF signature bit-for-bit") {
    val both = embs.select(
      Similarity.lshSignature(col("embedding"), table = 1, nPlanes = 6).as("fast"),
      Similarity.lshSignatureHof(col("embedding"), table = 1, nPlanes = 6).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() === 0)
    assert(both.filter(col("fast").isNull).count() === 0)
  }

  test("LSH ANN recall vs brute force") {
    val qs = embs.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(embs, qs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(embs, qs, "vec_id", "embedding", 5, nPlanes = 6, nTables = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // smoke bound only: sf0.001 has few vectors, so bucket collisions are
    // sparse and recall is noisy — the bound guards "candidates are real
    // neighbours at all", not production recall (which nTables tunes up)
    val recall = (lsh intersect exact).size.toDouble / exact.size
    assert(recall >= 0.15, s"LSH recall too low: $recall")
  }

  test("margin mining == driver-side brute-force replay, and prunes map-side") {
    val src = embs.filter(col("label") % 2 === 0)
    val tgt = embs.filter(col("label") % 2 === 1)
    val out = Similarity.marginMining(src, tgt, "vec_id", "embedding", k = 4)

    // the row_number <= k filters must plan as two-phase WindowGroupLimits
    // (each scan partition forwards <= k candidates per vector) — the shape
    // the 100 TB posture claims
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)

    // full driver replay with the same fixed-point math
    def vecs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Array[Float])] =
      df.select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq.sortBy(_._1)
    val sv = vecs(src); val tv = vecs(tgt)
    def cq(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4 + 0.5).toLong
    }
    val pairs = for ((si, sa) <- sv; (ti, ta) <- tv) yield (si, ti, cq(sa, ta))
    def topk(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = // (otherId, cq)
      rows.sortBy { case (id, c) => (-c, id) }.take(4)
    val bySrc = pairs.groupBy(_._1).map { case (s0, ps) =>
      s0 -> topk(ps.map(p => (p._2, p._3))) }
    val byTgt = pairs.groupBy(_._2).map { case (t0, ps) =>
      t0 -> topk(ps.map(p => (p._1, p._3))) }
    val expected = bySrc.map { case (s0, top) =>
      val (bestT, c) = top.head
      val (sx, nx) = (top.map(_._2).sum, top.size.toLong)
      val ktop = byTgt(bestT)
      val (sy, ny) = (ktop.map(_._2).sum, ktop.size.toLong)
      val den = sx * ny + sy * nx
      val mq = if (c > 0 && den > 0) Some(2 * c * nx * ny * 1000000L / den) else None
      (s0, bestT, c, mq, ktop.head._1 == s0)
    }.toSet
    val got = out.collect().map { r =>
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e4),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(5))
    }.toSet
    assert(got.size === sv.size)
    assert(got === expected)
  }

  test("marginMiningFromTopK: exact-fed == marginMining bit-for-bit; IVF-fed mines real pairs") {
    val src = embs.filter(col("label") % 2 === 0)
    val tgt = embs.filter(col("label") % 2 === 1)
    val direct = Similarity.marginMining(src, tgt, "vec_id", "embedding", k = 4)
    // any generator emitting the bruteForceTopK contract plugs in after a
    // role rename; the parity split makes the two id sets disjoint, so the
    // generator's self-pair exclusion never fires
    def roles(df: org.apache.spark.sql.DataFrame, qAs: String, nAs: String) =
      df.select(col("query_id").as(qAs), col("neighbor_id").as(nAs),
        col("rank"), col("cos"))
    val exactFed = Similarity.marginMiningFromTopK(
      roles(Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", 4),
        "src_id", "tgt_id"),
      roles(Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", 4),
        "tgt_id", "src_id"))
    assert(direct.exceptAll(exactFed).count() === 0)
    assert(exactFed.exceptAll(direct).count() === 0)

    // the documented scale path: IVF candidate lists feed the same tail
    val ivfFed = Similarity.marginMiningFromTopK(
      roles(Similarity.ivfTopK(tgt, src, "vec_id", "embedding", 4),
        "src_id", "tgt_id"),
      roles(Similarity.ivfTopK(src, tgt, "vec_id", "embedding", 4),
        "tgt_id", "src_id"))
    val exactBest = direct.select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ivfBest = ivfFed.select("src_id", "tgt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ivfBest.nonEmpty && ivfBest.size <= exactBest.size)
    // smoke recall bound (like the LSH test): sf0.001's 2-of-16-centroid
    // probes are coarse — this guards "the tail mines real neighbors from
    // ANN lists", not production recall (nProbe/nCentroids tune that up)
    val agree = ivfBest.count { case (s, t) => exactBest.get(s).contains(t) }
      .toDouble / ivfBest.size
    info(s"IVF-fed best-pair agreement with exact: $agree")
    assert(agree >= 0.3, s"IVF-fed agreement too low: $agree")
  }

  test("IVF index: FromIndex == inline ivfTopK exactly; construction shuffles gone") {
    import graft.plans.ShuffleMetrics
    val qs = embs.filter(col("vec_id") < 8)
    val (ct, at) = Similarity.buildIvfIndex(embs, "vec_id", "embedding",
      s"graft_ivftest_pid${ProcessHandle.current().pid()}")
    try {
      // identical output: the index path shares the probe tail and the
      // deterministic fixed-point k-means reproduces the same centroids
      val inline = Similarity.ivfTopK(embs, qs, "vec_id", "embedding", 5)
      val fromIdx = Similarity.ivfTopKFromIndex(spark, ct, at, qs,
        "vec_id", "embedding", 5)
      assert(inline.exceptAll(fromIdx).count() === 0)
      assert(fromIdx.exceptAll(inline).count() === 0)
      // steady-state: the k-means + assignment construction shuffles are
      // paid at build time, not per probe — executed records must collapse
      val vInline = ShuffleMetrics.measure(
        Similarity.ivfTopK(embs, qs, "vec_id", "embedding", 5))
      val vIdx = ShuffleMetrics.measure(
        Similarity.ivfTopKFromIndex(spark, ct, at, qs, "vec_id", "embedding", 5))
      info(s"inline records=${vInline.records} fromIndex records=${vIdx.records}")
      assert(vIdx.records > 0)
      assert(vIdx.records * 2 < vInline.records,
        s"index path shuffled ${vIdx.records} vs inline ${vInline.records} — " +
          "construction work leaked into the steady state")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ct")
      spark.sql(s"DROP TABLE IF EXISTS $at")
    }
  }

  test("IVF index append: frozen-centroid batch assignment, layout intact") {
    import spark.implicits._
    val base = embs.filter(col("vec_id") < 400)
    val batch = embs.filter(col("vec_id") >= 400)
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_ivfapp_pid${ProcessHandle.current().pid()}")
    try {
      Similarity.appendToIvfIndex(batch, "vec_id", "embedding", ct, at)
      // content == a driver frozen-centroid argmax over ALL vectors (same
      // double math, same (acos, -cid) tie rule) — pins both the appended
      // batch's assignment AND that the base rows were left untouched
      val cents = spark.table(ct).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val want = embs.select("vec_id", "embedding").collect().map { r =>
        val v = r.getSeq[Float](1).toArray
        r.getLong(0) -> cents.map { case (cid, cv) => (cos(v, cv), -cid, cid) }.max._3
      }.toMap
      val got = spark.table(at).select("neighbor_id", "cid")
        .as[(Long, Long)].collect().toMap
      assert(got.size === want.size) // every vector exactly once, none lost
      assert(got === want)
      // probes run through the appended layout
      val qs = embs.filter(col("vec_id") < 8)
      val res = Similarity.ivfTopKFromIndex(spark, ct, at, qs,
        "vec_id", "embedding", 5)
      assert(res.count() === qs.count() * 5)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ct")
      spark.sql(s"DROP TABLE IF EXISTS $at")
    }
  }

  test("ivfStaleness: profile == driver replay; rotated appends raise the staleness signals") {
    val base = embs.filter(col("vec_id") < 400)
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_ivfstale_pid${ProcessHandle.current().pid()}")
    try {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      // exact replay of the diagnostic chain: one fixed-point k-means step
      // over the current assignment, per-vector argmax against it (tie →
      // lowest cid), micro-quantized integer means, frozen-vs-refreshed
      // centroid cosine
      def replay(): Set[(Long, Long, Long, Long, Long, Long, Long)] = {
        val asg = spark.table(at).select("neighbor_id", "cid", "cv").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
        val frozen = spark.table(ct).collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        val refreshed = asg.groupBy(_._2).map { case (cid, vs) =>
          val dim = vs.head._3.length
          cid -> Array.tabulate(dim) { d =>
            val s = vs.map(v => math.floor(v._3(d).toDouble * 1e6 + 0.5).toLong).sum
            (s.toDouble / (vs.length.toDouble * 1e6)).toFloat
          }
        }
        val perVec = asg.map { case (id, acid, v) =>
          val scored = refreshed.toSeq.map { case (cid, c) => (cid, cos(v, c)) }
          val best = scored.maxBy { case (cid, a) => (a, -cid) }._1
          (id, acid, best,
            math.floor(scored.toMap.apply(acid) * 1e6 + 0.5).toLong,
            math.floor(scored.map(_._2).max * 1e6 + 0.5).toLong)
        }
        perVec.groupBy(_._2).map { case (cid, vs) =>
          val n = vs.length.toLong
          val so = vs.map(_._4).sum; val sb = vs.map(_._5).sum
          (cid, n, vs.count(_._3 != cid).toLong, so / n, sb / n,
            (sb - so) / n,
            math.floor(cos(frozen(cid), refreshed(cid)) * 1e6 + 0.5).toLong)
        }.toSet
      }
      def profile(): Set[(Long, Long, Long, Long, Long, Long, Long)] =
        Similarity.ivfStaleness(spark, ct, at).collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val before = profile()
      assert(before === replay())
      // distribution shift: append ROTATED vectors the frozen centroids
      // never saw — the staleness signals must move the honest direction
      val rotated = embs.filter(col("vec_id") >= 400)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(slice(col("embedding"), 33, 32),
            slice(col("embedding"), 1, 32)).as("embedding"))
      Similarity.appendToIvfIndex(rotated, "vec_id", "embedding", ct, at)
      val after = profile()
      assert(after === replay()) // replay holds over the appended state too
      val moveBefore = before.toSeq.map(_._3).sum
      val moveAfter = after.toSeq.map(_._3).sum
      info(s"would-move before=$moveBefore after=$moveAfter; " +
        s"min centroid_cos_q ${before.map(_._7).min} -> ${after.map(_._7).min}")
      assert(moveAfter > moveBefore,
        "appending shifted mass must raise the would-move churn")
      assert(after.map(_._7).min < before.map(_._7).min,
        "appending shifted mass must drag some frozen centroid off its refreshed position")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ct")
      spark.sql(s"DROP TABLE IF EXISTS $at")
    }
  }

  test("marginMiningFromTopK: tgt with no backward rows surfaces with NULL margin/is_mutual") {
    import spark.implicits._
    // forward: src 1's best (rank 1) is tgt 10, but the backward relation
    // never reached tgt 10 (an ANN generator probed only empty buckets for
    // it); src 2's best tgt 11 does carry backward rows and must keep the
    // exact integer margin. `rank` in backward is the per-tgt rank.
    val fwd = Seq(
      (1L, 10L, 1, 0.9), (1L, 11L, 2, 0.5),
      (2L, 11L, 1, 0.8)).toDF("src_id", "tgt_id", "rank", "cos")
    val bwd = Seq(
      (2L, 11L, 1, 0.8), (1L, 11L, 2, 0.5))
      .toDF("src_id", "tgt_id", "rank", "cos")
    val out = Similarity.marginMiningFromTopK(fwd, bwd).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the left-join path: src 1 SURVIVES (no silent drop) with tri-state
    // NULLs — no backward neighborhood to normalize or reciprocate against
    assert(out.keySet === Set(1L, 2L))
    val r1 = out(1L)
    assert(r1.getLong(1) === 10L)
    assert(r1.getDouble(2) === 0.9)
    assert(r1.isNullAt(3) && r1.isNullAt(4) && r1.isNullAt(5))
    // the populated path is untouched by the left join: sx=8000 nx=1
    // cq=8000, sy=13000 ny=2 → margin_q = 32e9 div 29000, mutual best
    val r2 = out(2L)
    assert(r2.getLong(1) === 11L)
    assert(r2.getLong(3) ===
      2L * 8000L * 1L * 2L * 1000000L / (8000L * 2L + 13000L * 1L))
    assert(r2.getBoolean(5))
  }

  test("buildIvfIndex rejects non-plain table prefixes") {
    // the stale-dir cleanup derives warehouse paths from the prefix — a
    // qualified or non-identifier prefix would compute a WRONG path
    for (bad <- Seq("db.qualified", "has-dash", "9leading_digit", ""))
      assertThrows[IllegalArgumentException] {
        Similarity.buildIvfIndex(embs, "vec_id", "embedding", bad)
      }
  }

  test("margin mining deflates hub matches: equal cosine, lower margin for the hub") {
    import spark.implicits._
    // 2-D unit vectors by angle: a hub cluster near 0 rad (the hub target
    // is everyone's near-match, so both neighborhood averages are high)
    // and one isolated pair near pi/2 (high mutual cosine, low averages).
    // Raw cosine scores the two best pairs identically; the ratio margin
    // must rank the isolated pair ABOVE the hub pair — the hubness
    // correction the operator exists for (Artetxe & Schwenk 2019 sec. 3).
    def vec(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // src ids 0..3 cluster at the hub; src 4 is isolated
    val src = Seq(
      (0L, vec(2)), (1L, vec(4)), (2L, vec(6)), (3L, vec(8)),
      (4L, vec(92))).toDF("vec_id", "embedding")
    // tgt 100 = the hub (angle 0); 101..102 hub-cluster fillers on the far
    // side of the hub (so the hub stays every clustered src's BEST match
    // while keeping their top-k neighborhoods dense); tgt 103 = the
    // isolated match (angle 90 = the same 2-degree gap to src 4)
    val tgt = Seq(
      (100L, vec(0)), (101L, vec(-3)), (102L, vec(-5)),
      (103L, vec(90))).toDF("vec_id", "embedding")
    val out = Similarity.marginMining(src, tgt, "vec_id", "embedding", k = 3)
      .select("src_id", "tgt_id", "cos", "margin")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val (hubTgt, hubCos, hubMargin) = out(0L)
    val (isoTgt, isoCos, isoMargin) = out(4L)
    assert(hubTgt === 100L)
    assert(isoTgt === 103L)
    // identical raw cosine (both best pairs are 2 degrees apart)...
    assert(hubCos === isoCos)
    // ...but the hub pair's margin is deflated by its dense neighborhood
    assert(isoMargin > hubMargin,
      s"isolated margin $isoMargin must exceed hub margin $hubMargin")
    assert(isoMargin > 1.2 && hubMargin < 1.1,
      s"expected a clear separation, got iso=$isoMargin hub=$hubMargin")
  }

  test("refreshIvfIndex == one more cold k-means iteration, bit-for-bit; epochs preserved") {
    import spark.implicits._
    val pid = ProcessHandle.current().pid()
    // warm-start contract: build(iters=1) + refresh ≡ build(iters=2) —
    // the refresh step IS the rebuild's next iteration (same exact
    // fixed-point kmeansStep, same broadcast-argmax re-assignment)
    val (ct1, at1) = Similarity.buildIvfIndex(embs, "vec_id", "embedding",
      s"graft_ivfref1_pid$pid", kmeansIters = 1)
    val (ct2, at2) = Similarity.buildIvfIndex(embs, "vec_id", "embedding",
      s"graft_ivfref2_pid$pid", kmeansIters = 2)
    try {
      Similarity.refreshIvfIndex(spark, ct1, at1)
      def cents(t: String) = spark.table(t).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
      assert(cents(ct1) === cents(ct2),
        "refreshed centroids differ from the cold build's next iteration")
      def asg(t: String) = spark.table(t).select("neighbor_id", "cid")
        .as[(Long, Long)].collect().toMap
      assert(asg(at1) === asg(at2),
        "refreshed assignment differs from the cold build's next iteration")
      // per-row epochs survive the refresh (the compaction watermark must
      // not be reset by index maintenance), and the swapped-in table still
      // serves bucketed probes
      assert(spark.table(at1).select("epoch").distinct().collect()
        .map(_.getLong(0)).toSeq === Seq(-1L))
      val qs = embs.filter(col("vec_id") < 8)
      val a = Similarity.ivfTopKFromIndex(spark, ct1, at1, qs,
        "vec_id", "embedding", 5)
      val b = Similarity.ivfTopKFromIndex(spark, ct2, at2, qs,
        "vec_id", "embedding", 5)
      assert(a.exceptAll(b).count() === 0)
      assert(b.exceptAll(a).count() === 0)
    } finally {
      for (t <- Seq(ct1, at1, ct2, at2)) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("rebuildIvfIndex == cold buildIvfIndex over the same content, bit-for-bit") {
    import spark.implicits._
    val pid = ProcessHandle.current().pid()
    // cold-rebuild contract: build on a base, append drift the frozen
    // centroids never saw, then rebuild IN PLACE — the rank re-seed + full
    // refinement must equal a cold buildIvfIndex over the grown corpus
    // (same seed rule, same iterations), which is exactly the property the
    // maintenance verdict leans on: the rebuild arm re-fits the grown
    // corpus as if built fresh, unlike the warm refresh's single step
    val base = embs.filter(col("vec_id") < 400)
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_ivfrb_pid$pid")
    val (ct2, at2) = Similarity.buildIvfIndex(embs, "vec_id", "embedding",
      s"graft_ivfrbtwin_pid$pid")
    try {
      Similarity.appendToIvfIndex(embs.filter(col("vec_id") >= 400),
        "vec_id", "embedding", ct, at)
      Similarity.rebuildIvfIndex(spark, ct, at)
      def cents(t: String) = spark.table(t).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
      assert(cents(ct) === cents(ct2),
        "in-place rebuild centroids differ from a cold build over the same corpus")
      def asg(t: String) = spark.table(t).select("neighbor_id", "cid")
        .as[(Long, Long)].collect().toMap
      assert(asg(at) === asg(at2),
        "in-place rebuild assignment differs from a cold build over the same corpus")
      // the rebuilt table still serves bucketed probes through the swap
      val qs = embs.filter(col("vec_id") < 8)
      assert(Similarity.ivfTopKFromIndex(spark, ct, at, qs,
        "vec_id", "embedding", 5).count() === 40)
    } finally {
      for (t <- Seq(ct, at, ct2, at2)) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("delta schema derives from the assignment table: int-id corpus round-trips through ingest and serve") {
    import spark.implicits._
    // regression for the hardcoded 'neighbor_id BIGINT' delta read: a
    // corpus with INT ids writes int-typed assignment and delta rows; the
    // derived-schema read must serve and fold them with the table's types
    val vecs = (0 until 64).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 0.37 + d).toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(corpus.filter(col("vec_id") < 48),
      "vec_id", "embedding", s"graft_ivfint_pid$pid", nCentroids = 4,
      kmeansIters = 1, buckets = 2)
    val deltaPath = s"target/scratch/ann_intid_delta_$pid"
    try {
      assert(spark.table(at).schema("neighbor_id").dataType ===
        org.apache.spark.sql.types.IntegerType)
      graft.streaming.StreamAnnIngest.ingestEpoch(
        corpus.filter(col("vec_id") >= 48), 0L, "vec_id", "embedding",
        ct, deltaPath)
      val served = Similarity.ivfTopKFromIndexWithDelta(spark, ct, at,
        deltaPath, corpus.filter(col("vec_id") < 4), "vec_id", "embedding",
        k = 3, nProbe = 2)
      assert(served.count() === 12)
      graft.streaming.StreamAnnIngest.compactDelta(spark, deltaPath, at,
        buckets = 2)
      assert(spark.table(at).count() === 64)
      assert(spark.table(at).select("neighbor_id").distinct().count() === 64)
      // refresh on a NON-default bucket layout must reproduce the table's
      // own spec (read from the catalog, not a parameter) — a fixed count
      // would silently rewrite the layout and break the next bucketed
      // append's spec check
      Similarity.refreshIvfIndex(spark, ct, at)
      Similarity.appendToIvfIndex(
        (100 until 104).map(i =>
          (i, Array.tabulate(4)(d => math.sin(i * 0.37 + d).toFloat)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", ct, at, buckets = 2)
      assert(spark.table(at).count() === 68)
    } finally {
      for (t <- Seq(ct, at)) spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("rebuildIvfIndex re-seeds at the BUILD capacity, not a shrunk live centroid count") {
    // kmeansStep drops clusters that lose all members, so the live centroid
    // count can fall below the build-time nCentroids; a rebuild seeded from
    // the live count would permanently shrink the index (round-18 review
    // finding). Simulate the shrunk state directly (overwrite the centroid
    // table with a strict subset, re-stamping the property the overwrite
    // drops, exactly as rewriteIvfIndex preserves it) and assert the
    // rebuild restores full capacity.
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(
      embs.filter(col("vec_id") < 400), "vec_id", "embedding",
      s"graft_ivfcap_pid$pid", nCentroids = 16)
    try {
      assert(Similarity.builtNCentroids(spark, ct) === Some(16))
      val shrunk = spark.table(ct).orderBy(col("cid")).limit(12).collect()
      val sch = spark.table(ct).schema
      spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(shrunk: _*)), sch)
        .write.mode("overwrite").format("parquet").saveAsTable(ct)
      spark.sql(s"ALTER TABLE $ct SET TBLPROPERTIES ('graft.ncentroids' = '16')")
      assert(spark.table(ct).count() === 12L)
      Similarity.rebuildIvfIndex(spark, ct, at)
      assert(spark.table(ct).count() === 16L,
        "rebuild lost the emptied clusters' capacity")
      // the property survives the rebuild's own centroid overwrite too
      assert(Similarity.builtNCentroids(spark, ct) === Some(16))
      // and a refresh (same rewrite core) keeps both capacity and property
      Similarity.refreshIvfIndex(spark, ct, at)
      assert(Similarity.builtNCentroids(spark, ct) === Some(16))
    } finally {
      for (t <- Seq(ct, at)) spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
