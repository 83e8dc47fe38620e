package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extensions.{Cdc, Dedup, Graph}

/** Round-9 tests: degree-ordered orientation in the triangle enumeration —
  * per-node counts identical to the id-ordered wedge join the oracle
  * replays, and the hub fixture where id-ordering does Θ(n²) wedge work
  * while the orientation does zero (the adversarial-skew case the 100 TB
  * posture names).
  */
class Round9Spec extends SparkSpec {

  import spark.implicits._

  /** Canonical a<b edge list from raw (x, y) rows — the same hygiene
    * triangleStats applies internally.
    */
  private def canon(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("x", "y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .filter($"a" =!= $"b").distinct()

  test("h67 hub fixture: degree orientation collapses the skewed wedge join") {
    // star with a MID-id hub: node 20 joined to every other id in 1..41.
    // id-ordered wedges center at the middle id of each a<b<c path, so the
    // hub contributes (#spokes below) x (#spokes above) = 19*21 = 399 — the
    // Sigma deg_hi^2 blow-up a skewed near-dup graph hits. Degree ordering
    // roots every edge at its degree-1 spoke, out-degree 1 everywhere, so
    // the wedge join has NOTHING to pair: zero wedges, same (empty)
    // triangle set.
    val hub = 20L
    val e = canon((1L to 41L).filter(_ != hub).map(s => (hub, s)))
    val idOrderedWedges = e.as("e1")
      .join(e.as("e2"), $"e1.b" === $"e2.a").count()
    assert(idOrderedWedges === 399L)
    val oriented = Graph.orientByDegree(e, Graph.degrees(e))
    assert(Graph.orientedWedges(oriented).count() === 0L)
    // and the stats themselves: hub degree 40, spokes degree 1, no triangles
    val stats = Graph.triangleStats(e.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = (1L to 41L).map { n =>
      if (n == hub) (n, 40L, 0L, 0.0) else (n, 1L, 0L, 0.0)
    }.toSet
    assert(stats === expected)
  }

  test("triangleStats counts a known graph exactly") {
    // K4 on {1,2,3,4} plus a pendant 5-1: each K4 node sits in 3 triangles;
    // node 1's degree rises to 4 so its clustering is 2*3/(4*3) = 0.5
    val k4 = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val e = canon(k4 :+ ((1L, 5L)))
    val got = Graph.triangleStats(e.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Set(
      (1L, 4L, 3L, 0.5),
      (2L, 3L, 3L, 1.0),
      (3L, 3L, 3L, 1.0),
      (4L, 3L, 3L, 1.0),
      (5L, 1L, 0L, 0.0))
    assert(got === expected)
  }

  test("degree-ordered triangle counts == id-ordered counts on the dup graph") {
    // the oracle replays the id-ordered join; per-node triangle counts are
    // enumeration-order-independent, so the engine's degree-ordered counts
    // must agree row-for-row on the real near-dup pair graph
    val pairs = Dedup.simhashNearDupPairs(
      Tables.documents(spark, sf), "doc_id", "text",
      maxHamming = 2, bands = 4, sigBits = 32)
      .localCheckpoint(false)
    val e = pairs
      .select(least($"id_a", $"id_b").as("a"), greatest($"id_a", $"id_b").as("b"))
      .filter($"a" =!= $"b").distinct().localCheckpoint(false)
    val oldTris = e.as("e1")
      .join(e.as("e2"), $"e1.b" === $"e2.a")
      .select($"e1.a".as("x"), $"e1.b".as("y"), $"e2.b".as("z"))
      .join(e.as("e3"), $"x" === $"e3.a" && $"z" === $"e3.b")
      .select(explode(array($"x", $"y", $"z")).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = Graph.triangleStats(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.filter(_._2 > 0L) === oldTris.filter(_._2 > 0L))
    // triangleStats keeps triangle-free nodes (count 0); the id-ordered
    // aggregate only emits triangle carriers — so its keys must be a subset
    assert(oldTris.keySet.subsetOf(got.keySet))
    assert(got.nonEmpty)
  }

  test("triangleStats matches a driver-side brute force on random graphs") {
    // seeded-random Erdős–Rényi graphs vs an independent adjacency-set
    // count — guards the orientation against structural edge cases (ties
    // on degree, isolated cliques, high-degree nodes) beyond the fixtures
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 5) {
      val n = 12 + rnd.nextInt(20)
      val edges = (for {
        i <- 0L until n.toLong; j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.25
      } yield (i, j)).toSeq
      if (edges.nonEmpty) {
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupMap(_._1)(_._2).map { case (k, v) => k -> v.toSet }
        val expected = adj.map { case (v, nb) =>
          val t = nb.toSeq.combinations(2)
            .count { case Seq(a, b) => adj(a).contains(b) }
          (v, nb.size.toLong, t.toLong)
        }.toSet
        val got = Graph.triangleStats(edges.toDF("id_a", "id_b"), "id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got === expected, s"n=$n edges=${edges.size}")
      }
    }
  }

  test("pageRank variants match a driver-side micro-unit replay on random graphs") {
    // independent replay of the documented exact-arithmetic contract
    // (init 1.000000; score' = 0.15 + 0.85 * sum(score_u div deg_u) in
    // micro-units) — guards the join/aggregate plumbing against semantic
    // drift the fixed path-graph fixture can't see
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 3) {
      val n = 10 + rnd.nextInt(15)
      val raw = (for {
        i <- 0L until n.toLong; j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.3
      } yield (i, j, 1L + rnd.nextInt(9))).toSeq
      if (raw.nonEmpty) {
        val adj = raw.flatMap { case (a, b, _) => Seq(a -> b, b -> a) }
        val deg = adj.groupMapReduce(_._1)(_ => 1L)(_ + _)
        var score = deg.keys.map(_ -> 1000000L).toMap
        for (_ <- 1 to 3) {
          val in = adj.groupMapReduce(_._2) { case (s, _) => score(s) / deg(s) }(_ + _)
          score = in.map { case (v, s) =>
            v -> (150000L + math.floor(0.85 * s.toDouble).toLong)
          }
        }
        val got = Dedup.pageRank(
            raw.map(t => (t._1, t._2)).toDF("id_a", "id_b"), "id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === score, s"pageRank n=$n edges=${raw.size}")

        val wadj = raw.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        val wdeg = wadj.groupMapReduce(_._1)(_._3)(_ + _)
        var wscore = wdeg.keys.map(_ -> 1000000L).toMap
        for (_ <- 1 to 3) {
          val in = wadj.groupMapReduce(_._2) {
            case (s, _, w) => (wscore(s) * w) / wdeg(s)
          }(_ + _)
          wscore = in.map { case (v, s) =>
            v -> (150000L + math.floor(0.85 * s.toDouble).toLong)
          }
        }
        val wgot = Graph.weightedPageRank(
            raw.toDF("id_a", "id_b", "w"), "id_a", "id_b", "w")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(wgot === wscore, s"weightedPageRank n=$n edges=${raw.size}")
      }
    }
  }

  test("labelPropagation matches a driver-side vote replay on random graphs") {
    // replay: each round every node with >=1 labeled neighbor takes the
    // most-voted label (ties -> min label), non-seed labels are rebuilt
    // from scratch each round, seeds immutable
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(12)
      val edges = (for {
        i <- 0L until n.toLong; j <- (i + 1) until n.toLong
        if rnd.nextDouble() < 0.25
      } yield (i, j)).toSeq
      val seedMap = (0L until n.toLong).filter(_ => rnd.nextDouble() < 0.3)
        .map(v => v -> (100L + rnd.nextInt(3))).toMap
      if (edges.nonEmpty && seedMap.nonEmpty) {
        val adjDir = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        var labels: Map[Long, Long] = seedMap
        for (_ <- 1 to 2) {
          val votes = adjDir
            .flatMap { case (s, d) => labels.get(s).map(l => (d, l)) }
            .groupMapReduce(identity)(_ => 1L)(_ + _)
          val winners = votes.groupBy(_._1._1).map { case (d, m) =>
            d -> m.toSeq.map { case ((_, l), v) => (l, v) }
              .minBy { case (l, v) => (-v, l) }._1
          }
          labels = seedMap ++ winners.filterNot { case (d, _) => seedMap.contains(d) }
        }
        val expected = labels.map { case (v, l) => (v, l, seedMap.contains(v)) }.toSet
        val out = Graph.labelPropagation(edges.toDF("id_a", "id_b"), "id_a", "id_b",
            seedMap.toSeq.toDF("node", "label"), "node", "label", iterations = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        assert(out === expected, s"n=$n edges=${edges.size} seeds=${seedMap.size}")
      }
    }
  }

  test("minhash LSH verified pairs: exact-Jaccard soundness and planted near-dup recall") {
    // soundness is exact (the verify stage recomputes true shingle Jaccard,
    // so every emitted pair must clear the threshold against a driver-side
    // recompute); recall is checked on planted one-token-appended copies
    // (Jaccard ~0.97 — band-collision probability ~0.9997 each, and the
    // fixture is seed-deterministic so the outcome is pinned, not flaky)
    val rnd = new scala.util.Random(20260814L)
    val vocab = (0 until 300).map(i => s"w$i")
    val bases = (0 until 25).map { i =>
      (i.toLong, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (0 until 10).map(i => (100L + i, bases(i)._2 + s" extra$i"))
    val all = bases ++ dups
    val got = Dedup.verifiedNearDupPairs(
        all.toDF("doc_id", "text"), "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def sh(t: String): Set[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet
    val text = all.toMap
    def jac(a: Long, b: Long): Double = {
      val (x, y) = (sh(text(a)), sh(text(b)))
      val i = x.intersect(y).size
      math.floor(i.toDouble / (x.size + y.size - i) * 10000) / 10000
    }
    assert(got.nonEmpty)
    got.foreach { case (a, b) =>
      assert(jac(a, b) >= 0.5, s"unsound pair ($a,$b) true jac=${jac(a, b)}") }
    (0 until 10).foreach { i =>
      assert(got.contains((i.toLong, 100L + i)), s"planted pair $i missed") }
  }

  test("dedupCorpus is idempotent: re-deduping the kept corpus drops nothing") {
    // deterministic, not just probable: band collisions depend only on the
    // two docs' md5 signatures, so any pair that would collide in pass 2
    // collided (and was verified, dropping id_b) in pass 1 — the kept set
    // can contain no candidate pair, and exact collapse is identity on
    // distinct texts. Planted exact + near dups exercise both layers.
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val planted = base.limit(5)
      .select((col("doc_id") + lit(900000L)).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val docs = base.unionByName(planted)
    val once = Dedup.dedupCorpus(docs, "doc_id", "text")
    val keptIds = once.collect().map(_.getLong(0)).toSet
    assert(keptIds.size < docs.count(), "fixture planted no drops")
    val kept = docs.join(once, Seq("doc_id"), "left_semi")
    val twice = Dedup.dedupCorpus(kept, "doc_id", "text")
    assert(twice.collect().map(_.getLong(0)).toSet === keptIds)
  }

  test("scd2Merge matches a driver-side fold over random update batches") {
    // five random batches (mutate / keep-identical / insert, with nullable
    // attributes exercising the null-safe compares) against an independent
    // per-key version-list fold — full-history equality, which subsumes the
    // interval invariants (one current row per key, contiguous validity)
    val rnd = new scala.util.Random(20260814L)
    def attr(): Option[String] =
      Seq(None, Some("x"), Some("y"), Some("z"))(rnd.nextInt(4))
    val keys = (1L to 30L).toSeq
    val init = keys.take(20).map(k => (k, attr(), attr()))
    var dim = Cdc.scd2Init(init.toDF("k", "a", "b"), "2026-01-01")
    // key -> versions (a, b, valid_from, valid_to, is_current), newest first
    var driver: Map[Long, List[(Option[String], Option[String], String, Option[String], Boolean)]] =
      init.map { case (k, a, b) => k -> List((a, b, "2026-01-01", None, true)) }.toMap
    for (step <- 1 to 5) {
      val d = f"2026-02-$step%02d"
      val ups = keys.filter(_ => rnd.nextDouble() < 0.5).map(k => (k, attr(), attr()))
      dim = Cdc.scd2Merge(dim, ups.toDF("k", "a", "b"), "k", Seq("a", "b"), d)
      ups.foreach { case (k, a, b) =>
        val vs = driver.getOrElse(k, Nil)
        vs.find(_._5) match {
          case Some(cur) if cur._1 == a && cur._2 == b => ()
          case Some(cur) =>
            driver += k -> ((a, b, d, None, true) ::
              (cur._1, cur._2, cur._3, Some(d), false) :: vs.filterNot(_._5))
          case None =>
            driver += k -> ((a, b, d, None, true) :: vs)
        }
      }
    }
    val got = dim.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), r.getString(3), Option(r.getString(4)),
      r.getBoolean(5))).toSet
    val want = driver.flatMap { case (k, vs) =>
      vs.map(v => (k, v._1, v._2, v._3, v._4, v._5)) }.toSet
    assert(got === want)
    // sanity that the fixture actually exercised history growth
    assert(got.count(!_._6) > 10, "fixture produced too few closed versions")
  }

  private def shuffleExchanges(name: String): Int =
    "Exchange hashpartitioning".r.findAllIn(
      SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString).size

  test("bucketed materialization: consumers equal per-call and shed exchanges") {
    // DupGraph.materializeBucketed persists the shared constructions as
    // bucketed parquet tables and installs the catalog read-backs in the
    // memo — consumers must return bit-identical results, and the shingle
    // consumers must LOSE shuffle exchanges because the bucket metadata
    // already hash-partitions by doc_id (the 100 TB signature-warehouse
    // layout, vs memory-resident checkpoint blocks)
    import graft.queries.DupGraph
    val names = Seq("h5_minhash_lsh_pairs", "h6_ngram_jaccard",
      "h16_dedup_corpus_keep", "h23_dedup_clusters", "h61_incremental_dedup")
    DupGraph.reset()
    val perCall = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
    // h5 left the shed list in round 22: the native per-row signature
    // removed the aggregate exchange from the PER-CALL plan itself, so
    // there is nothing left for the bucketed layout to shed — pinned at
    // ≤1 exchange below instead (the irreducible pair distinct).
    val exchPerCall = Seq("h6_ngram_jaccard", "h61_incremental_dedup")
      .map(n => n -> shuffleExchanges(n)).toMap
    assert(shuffleExchanges("h5_minhash_lsh_pairs") <= 1,
      "h5 per-call plan regrew a shuffle beyond the pair distinct")
    try {
      val timings = DupGraph.materializeBucketed(spark, sf, buckets = 4)
      assert(timings.map(_._1) ===
        Seq("shingle_rows", "pairs", "verified_pairs", "h61_fingerprints",
          "h61_band_rows", "h61_shingles", "h61_sizes", "token_rows"))
      val bucketed = names.map(n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
      assert(bucketed === perCall)
      for ((n, before) <- exchPerCall) {
        val after = shuffleExchanges(n)
        assert(after < before,
          s"$n: expected fewer shuffle exchanges over the bucketed " +
            s"shingle table, got $after (per-call $before)")
      }
    } finally DupGraph.reset()
  }

  test("h62/h28 shared-shingle routing: materialized == per-call") {
    // both queries now consume DupGraph.shingleRows (the h5/h6 pattern);
    // the checkpoint-materialized path must return exactly the per-call
    // rows — the Round8Spec materialized≡per-call guarantee extended to
    // the two new consumers
    import graft.queries.DupGraph
    val names = Seq("h62_ngram_novelty", "h28_benchmark_decontamination")
    DupGraph.reset()
    val perCall = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
    try {
      DupGraph.enableMaterialization()
      val mat = names.map(n =>
        n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
      assert(mat === perCall)
      assert(perCall.values.forall(_.nonEmpty))
    } finally DupGraph.reset()
  }
}
