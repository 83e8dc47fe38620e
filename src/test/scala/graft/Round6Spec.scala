package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Dedup, Graph, Mixing, Provenance, Similarity}

/** Round-6 tests: the bagDedup NULL-text totality contract, pageRank's
  * defensive input canonicalization (both ADVICE items), and the round-6
  * operators — graph analytics, domain KL, matryoshka funnel, dataset
  * fingerprints.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("bagDedup: disposition is total — NULL-text docs survive as their own cluster") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "beta alpha"), // order-insensitive dup pair
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.bagDedup(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.length === 4, "every doc, including NULL text, must appear")
    assert(out(0) === ((1L, out(0)._2, 2L, true)))
    assert(out(1)._2 === out(0)._2 && out(1)._3 === 2L && !out(1)._4)
    // both NULL-text docs share the sentinel cluster; lowest id wins
    assert(out(2) === ((3L, "__null_text__", 2L, true)))
    assert(out(3) === ((4L, "__null_text__", 2L, false)))
  }

  test("pageRank: duplicate, mirrored, and self pairs cannot inflate scores") {
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val dirty = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // mirrored + repeated edge
      (2L, 3L),
      (3L, 3L) // self pair
    ).toDF("a", "b")
    val want = Dedup.pageRank(clean, "a", "b").collect().toSet
    val got = Dedup.pageRank(dirty, "a", "b").collect().toSet
    assert(got === want)
    // and the path graph's center outranks the leaves
    val byNode = want.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode(2L) > byNode(1L) && byNode(1L) === byNode(3L))
  }

  test("triangleStats: hand-checked on a triangle with a pendant edge") {
    // 1-2-3 triangle, 4 pendant off 3; mirrored/dup rows must not matter
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 1L))
      .toDF("a", "b")
    val out = Graph.triangleStats(pairs, "a", "b")
      .orderBy("node").as[(Long, Long, Long, Double)].collect()
    assert(out(0) === ((1L, 2L, 1L, 1.0)))
    assert(out(1) === ((2L, 2L, 1L, 1.0)))
    // node 3: degree 3, one triangle of the three possible pairs → 2/6
    assert(out(2) === ((3L, 3L, 1L, 0.3333)))
    assert(out(3) === ((4L, 1L, 0L, 0.0)))
  }

  test("labelPropagation: votes, min-label tiebreak, immutable seeds, 2-hop reach") {
    //      1(seed A) - 2 - 3(seed B)      tie at 2 → min label A
    //      4(seed B) - 5 - 6              6 reachable only in round 2
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val seeds = Seq((1L, "A"), (3L, "B"), (4L, "B")).toDF("node", "label")
    val out = Graph.labelPropagation(pairs, "a", "b", seeds, "node", "label",
      iterations = 2)
      .orderBy("node").as[(Long, String, Boolean)].collect()
    assert(out.toSeq === Seq(
      (1L, "A", true), (2L, "A", false), (3L, "B", true),
      (4L, "B", true), (5L, "B", false), (6L, "B", false)))
    // one round only: 6 has no labeled neighbor yet
    val r1 = Graph.labelPropagation(pairs, "a", "b", seeds, "node", "label",
      iterations = 1)
    assert(r1.filter($"node" === 6L).count() === 0)
  }

  test("matryoshka funnel with full-width prefilter degenerates to exact top-k") {
    val embs = Tables.embeddings(spark, sf)
    val q = embs.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(embs, q, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id", "cos")
    val funnel = Similarity.matryoshkaTopK(embs, q, "vec_id", "embedding",
      dPrefix = 64, m = 1000000, k = 5)
      .select("query_id", "rank", "neighbor_id", "cos")
    assert(funnel.collect().toSet === exact.collect().toSet)
  }

  test("domainKl: zero for identical slices, positive for drifted ones") {
    val docs = Seq(
      (1L, "d1", "x y"), (2L, "d1", "x y"),
      (3L, "d2", "x y"), (4L, "d2", "z z z z")
    ).toDF("doc_id", "domain", "text")
    val out = Mixing.domainKl(docs, "domain", "text")
      .orderBy("domain").as[(String, Long, Long, Long, Double)].collect()
    // d1 = {x:2, y:2}; corpus = {x:3, y:3, z:4}; d1 ratios: (2/4)/(3/10) > 1
    assert(out(0)._1 === "d1" && out(0)._2 === 4L && out(0)._4 > 0L)
    assert(out(1)._1 === "d2" && out(1)._2 === 6L)
    // KL is non-negative up to micro-nat quantization
    val real = Mixing.domainKl(Tables.documents(spark, sf), "source", "text")
    assert(real.filter($"kl_nats" < -1e-3).count() === 0)
    assert(real.count() === 20)
  }

  test("dataset fingerprint: layout-independent, content-sensitive, XOR-rollup") {
    val docs = Tables.documents(spark, sf)
    val base = Provenance.datasetFingerprint(docs, Seq("source"), Seq("doc_id", "text"))
    val shuffled = Provenance.datasetFingerprint(
      docs.orderBy(rand(7)).repartition(13), Seq("source"), Seq("doc_id", "text"))
    assert(base.collect().toSet === shuffled.collect().toSet)
    // one edited row changes exactly that group's fingerprint
    val edited = docs.withColumn("text",
      when($"doc_id" === 0L, lit("tampered")).otherwise($"text"))
    val diff = Provenance.datasetFingerprint(edited, Seq("source"), Seq("doc_id", "text"))
      .join(base.withColumnRenamed("content_fp", "fp0"), Seq("source", "n_rows"))
      .filter($"content_fp" =!= $"fp0")
    assert(diff.count() === 1)
    // sub-slice fingerprints XOR together into the coarser slice
    val fine = Provenance.datasetFingerprint(docs, Seq("source", "lang"), Seq("doc_id", "text"))
    val rolled = fine.groupBy("source")
      .agg(sum($"n_rows").as("n_rows"), expr("bit_xor(content_fp)").as("content_fp"))
    assert(rolled.collect().toSet === base.collect().toSet)
    // NULL vs empty vs shifted-boundary rows stay distinct
    val tricky = Seq(
      (1L, "g", Some("ab"), Some("c")),
      (2L, "g", Some("a"), Some("bc")),
      (3L, "g", None: Option[String], Some("abc")),
      (4L, "g", Some(""), Some("abc"))
    ).toDF("id", "g", "c1", "c2")
    val each = Provenance.datasetFingerprint(tricky, Seq("id"), Seq("c1", "c2"))
      .select("content_fp").as[Long].collect()
    assert(each.distinct.length === 4)
  }

  test("heavyKeyProfile: hand-checked ranks, shares, cumulative shares") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c"))
      .toDF("k")
    val out = extensions.Skew.heavyKeyProfile(df, "k", 2)
      .as[(Long, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "a", 6L, 0.6, 0.6), (2L, "b", 3L, 0.3, 0.9)))
  }

  test("decileBuckets: uniform 1..100 at bin width 1 gives ten exact deciles") {
    val df = (1L to 100L).toDF("v")
    val out = extensions.Histograms.decileBuckets(df, "v", 1.0)
      .orderBy("decile").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 10)
    out.zipWithIndex.foreach { case ((d, n, lo, hi, s), i) =>
      assert(d === i + 1L && n === 10L && lo === i * 10 + 1L && hi === (i + 1) * 10L)
      assert(s === (lo to hi).sum)
    }
  }

  test("scd2Merge: change closes+reopens, identical is no-op, new key inserts") {
    import extensions.Cdc
    val dim = Cdc.scd2Init(
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "name", "v"),
      "2026-01-01")
    val updates = Seq(
      (1L, "a", 11),  // changed value
      (2L, "b", 20),  // identical → no-op
      (9L, "z", 90)   // brand-new key
    ).toDF("k", "name", "v")
    val out = Cdc.scd2Merge(dim, updates, "k", Seq("name", "v"), "2026-06-01")
      .orderBy("k", "valid_from")
      .as[(Long, String, Int, String, Option[String], Boolean)].collect()
    assert(out.toSeq === Seq(
      (1L, "a", 10, "2026-01-01", Some("2026-06-01"), false),
      (1L, "a", 11, "2026-06-01", None, true),
      (2L, "b", 20, "2026-01-01", None, true),
      (3L, "c", 30, "2026-01-01", None, true),
      (9L, "z", 90, "2026-06-01", None, true)))
    // idempotence: re-merging the same batch at a later date grows nothing
    val once = Cdc.scd2Merge(dim, updates, "k", Seq("name", "v"), "2026-06-01")
    val twice = Cdc.scd2Merge(once, updates, "k", Seq("name", "v"), "2026-07-01")
    assert(twice.collect().toSet === once.collect().toSet)
  }

  test("blockedFuzzyPairs: block key gates candidates before the edit-distance verify") {
    import extensions.Linkage
    val df = Seq(
      (1L, "red widget", "A"), (2L, "red widget!", "A"), // in-block near-dup
      (3L, "red widget", "B"),                           // same name, other block
      (4L, "completely different thing", "A")            // in-block, too far
    ).toDF("id", "name", "blk")
    val out = Linkage.blockedFuzzyPairs(df, "id", "name", Seq("blk"), 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1L)))
  }

  test("count-min: estimates never undercount; exact on a collision-free toy") {
    import extensions.Sketches
    // real corpus: one-sided error property over the top-20
    val hh = Sketches.countMinHeavyHitters(Tables.documents(spark, sf), "text")
    assert(hh.count() === 20)
    assert(hh.filter($"overestimate" < 0).count() === 0)
    // toy: 3 tokens into 4x256 cells — collisions impossible, est == exact
    val toy = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val t = Sketches.countMinHeavyHitters(toy, "text", 4, 256, 10)
      .orderBy("tok").as[(String, Long, Long, Long)].collect()
    assert(t.toSeq === Seq(("x", 2L, 2L, 0L), ("y", 2L, 2L, 0L), ("z", 1L, 1L, 0L)))
  }

  test("zValue interleaves bits; file stats cover all rows in disjoint z-ranges") {
    import extensions.Layout
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue($"x", $"y", 4).as("z")).as[Long].head()
    assert(z === 39L) // x=0011 on even bits, y=0101 on odd → 100111
    val buckets = Tables.orders(spark, sf).select(
      ($"o_custkey" % 16).as("x16"),
      least(floor($"o_totalprice" / 31250.0), lit(15.0)).cast("long").as("y16"))
    val out = Layout.zorderFileStats(buckets, "x16", "y16", 4, 16)
      .orderBy("file_id")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === buckets.count())
    out.foreach { case (f, _, zmin, zmax, _, _, _, _) =>
      assert(zmin >= f * 16 && zmax < (f + 1) * 16, s"file $f z-range [$zmin,$zmax]")
    }
    // z-order locality: every file's span in each dimension is at most half
    // the grid (a random 16-way split would span the full 0..15 in both)
    out.foreach { case (f, _, _, _, xmin, xmax, ymin, ymax) =>
      assert(xmax - xmin <= 8 && ymax - ymin <= 8, s"file $f spans x[$xmin,$xmax] y[$ymin,$ymax]")
    }
  }

  test("snapshotDiff: add/remove/change detected, unchanged and reordered rows silent") {
    val v1 = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("k", "c1", "c2")
    val v2 = Seq((3L, "c", "z"), (1L, "a", "CHANGED"), (9L, "n", "w"))
      .toDF("k", "c1", "c2").repartition(3)
    val out = Provenance.snapshotDiff(v1, v2, "k", Seq("c1", "c2"))
      .orderBy("k").select("k", "change_type")
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "changed"), (2L, "removed"), (9L, "added")))
    // self-diff is empty; diff size is the churn, not the corpus
    assert(Provenance.snapshotDiff(v1, v1, "k", Seq("c1", "c2")).count() === 0)
  }

  test("weightedPageRank: degenerates to pageRank on unit weights; weight pulls authority") {
    val pairs = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("a", "b", "w")
    val uni = Graph.weightedPageRank(pairs, "a", "b", "w")
      .select("node", "wpr_micro").collect().toSet
    val plain = Dedup.pageRank(pairs, "a", "b")
      .select("node", "pr_micro").collect().toSet
    assert(uni === plain)
    // star 1-2, 1-3 with 2's edge 3x heavier: 2 outranks 3
    val wpairs = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("a", "b", "w")
    val scores = Graph.weightedPageRank(wpairs, "a", "b", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(2L) > scores(3L))
    // duplicate/mirrored rows collapse (max weight wins), like pageRank
    val dirty = Seq((1L, 2L, 3L), (2L, 1L, 1L), (1L, 3L, 1L)).toDF("a", "b", "w")
    assert(Graph.weightedPageRank(dirty, "a", "b", "w").collect().toSet ===
      Graph.weightedPageRank(wpairs, "a", "b", "w").collect().toSet)
  }

  test("chiSquare: independent table gives ~0; dependent table large; hand-check") {
    import extensions.Stats
    // perfectly independent 2x2: every term exactly 0
    val ind = (Seq.fill(4)(("a", 0L)) ++ Seq.fill(4)(("a", 1L)) ++
      Seq.fill(2)(("b", 0L)) ++ Seq.fill(2)(("b", 1L))).toDF("g", "h")
    val i = Stats.chiSquareIndependence(ind, "g", "h")
    assert(i.count() === 4)
    assert(i.filter($"term_micro" =!= 0L).count() === 0)
    // perfectly dependent 2x2 (diagonal): chi2 = n = 8
    val dep = (Seq.fill(4)(("a", 0L)) ++ Seq.fill(4)(("b", 1L))).toDF("g", "h")
    val c = Stats.chiSquareIndependence(dep, "g", "h")
      .select("chi2_micro").as[Long].head()
    assert(c === 8000000L)
  }

  test("pairLift: hand-checked counts and lift on three baskets") {
    import extensions.Baskets
    // baskets: {p,q}, {p,q}, {p,r}; duplicate incidence rows must not count
    val li = Seq((1L, 10L), (1L, 20L), (1L, 10L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 30L)).toDF("ord", "item")
    val out = Baskets.pairLift(li, "ord", "item", 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // (10,20): pair 2, c10=3, c20=2, lift = 3*2/(3*2) = 1.0
    // (10,30): pair 1, c30=1, lift = 3*1/(3*1) = 1.0
    assert(out.toSeq === Seq((10L, 20L, 2L, 3L, 2L, 1.0),
      (10L, 30L, 1L, 3L, 1L, 1.0)))
  }

  test("pairLift: block-decomposed heavy-basket path == plain enumeration, bit-for-bit") {
    import extensions.Baskets
    // a pathological basket (40 items — "heavy" at the test threshold) among
    // order-shaped ones, with overlapping items so marginals and lift mix
    // across both paths; duplicates exercise the distinct
    val heavy = (0 until 40).map(i => (100L, i.toLong % 37)) // dups: 37 distinct
    val light = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 5L), (3L, 36L))
    val li = (heavy ++ light).toDF("ord", "item")
    // plain path: threshold above every basket
    val plain = Baskets.pairLift(li, "ord", "item", 1000,
      heavyBasket = 1000).collect().map(_.toSeq).toSeq
    // forced decomposition: the 37-item basket splits into ceil(37/8)=5
    // blocks (multi-block diagonal + off-diagonal cells all exercised)
    val blocked = Baskets.pairLift(li, "ord", "item", 1000,
      heavyBasket = 20, blockTarget = 8, maxBlocks = 64)
      .collect().map(_.toSeq).toSeq
    assert(blocked === plain)
    // sanity: the heavy basket's pair count is C(37,2) + the light pairs
    val totalPairs = plain.map(_(2).asInstanceOf[Long]).sum
    assert(totalPairs === 37L * 36 / 2 + 1 + 3 + 1)
    // maxBlocks clamp: nblk pinned to 2 still agrees
    val clamped = Baskets.pairLift(li, "ord", "item", 1000,
      heavyBasket = 20, blockTarget = 1, maxBlocks = 2)
      .collect().map(_.toSeq).toSeq
    assert(clamped === plain)
  }

  test("pairLift auto-trigger: decomposes exactly the baskets whose pair work exceeds a task share") {
    import extensions.Baskets
    import org.apache.spark.sql.functions.{count => fcount}
    def sizesOf(df: org.apache.spark.sql.DataFrame) =
      df.distinct().groupBy("basket").agg(fcount(lit(1)).as("bsz"))
    // ONE hub basket (3,000 items — over the 2·blockTarget floor and over
    // its fair share of Σbsz²) among 500 4-item baskets → only the hub
    val hub = spark.range(3000).select(lit(0L).as("basket"), $"id".as("item"))
    val light = spark.range(1L, 501L).select($"id".as("basket"),
      explode(sequence($"id" * 10, $"id" * 10 + 3)).as("item"))
    val skewed = hub.union(light).toDF("basket", "item")
    val picked = Baskets.heavySet(sizesOf(skewed), 0, 1024, 32)
      .select("basket").as[Long].collect().toSeq
    assert(picked === Seq(0L))
    // EQUAL-share corpus: 32 equally large baskets on a 32-task cluster —
    // no basket exceeds its fair share (strict >), nothing decomposes even
    // though every basket clears the size floor
    val uniform = spark.range(32L * 3000).select(
      ($"id" % 32).as("basket"), $"id".as("item")).toDF("basket", "item")
    assert(Baskets.heavySet(sizesOf(uniform), 0, 1024, 32).count() === 0L)
    // floor: a corpus-dominating but SMALL basket (100 items — nblk would
    // be 1, replication can't pay) stays on the plain path
    val small = spark.range(100).select(lit(0L).as("basket"), $"id".as("item"))
      .union(spark.range(1L, 4L).select($"id".as("basket"), ($"id" + 200L).as("item")))
      .toDF("basket", "item")
    assert(Baskets.heavySet(sizesOf(small), 0, 1024, 32).count() === 0L)
    // and the self-tuned path is bit-identical to the plain enumeration on
    // the skewed corpus (blockTarget lowered so the hub actually splits)
    val auto = Baskets.pairLift(skewed, "basket", "item", 50,
      heavyBasket = 0, blockTarget = 256).collect().map(_.toSeq).toSeq
    val plain = Baskets.pairLift(skewed, "basket", "item", 50,
      heavyBasket = Int.MaxValue).collect().map(_.toSeq).toSeq
    assert(auto === plain)
  }

  test("scd2Lookup: facts pick the version valid at their date; open version wins after") {
    import extensions.Cdc
    val dim = Seq(
      (1L, "v1", "1990-01-01", Some("1998-01-01"), false),
      (1L, "v2", "1998-01-01", None: Option[String], true),
      (2L, "w1", "1990-01-01", None: Option[String], true)
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (10L, 1L, "1995-06-15"), // inside v1
      (11L, 1L, "1998-01-01"), // boundary: valid_from inclusive → v2
      (12L, 1L, "2001-03-03"), // open v2
      (13L, 2L, "1997-01-01"), // single-version key
      (14L, 3L, "1995-01-01"), // unknown key → absent
      (15L, 1L, "1989-12-31")  // before every version → absent
    ).toDF("fid", "k", "fdate")
    val out = Cdc.scd2Lookup(facts, "k", "fdate", dim, "k")
      .select("fid", "attr").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((10L, "v1"), (11L, "v2"), (12L, "v2"), (13L, "w1")))
  }

  test("markovTransitions: hand-checked counts and row-normalized probabilities") {
    import extensions.Sequences
    // user 1: a->b->a ; user 2: a->b  ⇒ a->b:2, b->a:1
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b")).toDF("u", "eid", "t")
      .withColumn("ts", col("eid").cast("timestamp"))
    val out = Sequences.markovTransitions(ev, "u", "ts", "eid", "t")
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq === Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("topPaths: order is by (ts, tie), truncated to len, counted across users") {
    import extensions.Sequences
    val ev = Seq((1L, 2L, "b"), (1L, 1L, "a"), (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "z")).toDF("u", "eid", "t")
      .withColumn("ts", col("eid").cast("timestamp"))
    val out = Sequences.topPaths(ev, "u", "ts", "eid", "t", len = 2, k = 10)
      .as[(String, Long)].collect()
    assert(out.toSeq === Seq(("a>b", 2L), ("z", 1L)))
  }

  test("cohortRetention: offsets anchored to first week, rates over cohort size") {
    import extensions.Retention
    // u1 active weeks 0,1; u2 week 0 only; u3 weeks 1,2 (cohort 1)
    val ev = Seq((1L, "2024-01-02"), (1L, "2024-01-10"), (1L, "2024-01-11"),
      (2L, "2024-01-03"), (3L, "2024-01-09"), (3L, "2024-01-16")
    ).toDF("u", "day").withColumn("ts", col("day").cast("timestamp"))
    val out = Retention.cohortRetention(ev, "u", "ts", "2024-01-01")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0), (0L, 1L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0), (1L, 1L, 1L, 1L, 1.0)))
  }

  test("intervalOverlapJoin: equals the brute-force overlap join, once per pair") {
    import extensions.RangeJoin
    // deterministic pseudo-random intervals with spans from 0 to ~6 buckets
    // (bucket = 100 s), including boundary-touching and bucket-aligned ends
    val left = spark.range(0, 200).select(
      $"id".as("lid"),
      timestamp_seconds($"id" * 137 % 10000).as("ls"),
      timestamp_seconds($"id" * 137 % 10000 + ($"id" * 31 % 600)).as("le"))
    val right = spark.range(0, 150).select(
      $"id".as("rid"),
      timestamp_seconds($"id" * 211 % 10000).as("rs"),
      timestamp_seconds($"id" * 211 % 10000 + ($"id" * 17 % 500)).as("re"))
    val got = RangeJoin.intervalOverlapJoin(
        left, right, "ls", "le", "rs", "re", bucketSeconds = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted
    val want = left.crossJoin(right)
      .filter($"ls" <= $"re" && $"rs" <= $"le")
      .select("lid", "rid").as[(Long, Long)].collect().sorted
    assert(got.length === want.length, "multi-bucket pairs must appear once")
    assert(got.toSeq === want.toSeq)
  }

  test("ewmaFixedHorizon: matches the driver-side truncated-EWMA reference") {
    import extensions.Timeseries
    val weights = Seq(1.0, 0.7, 0.49, 0.343)
    val rows = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 0.0), (1L, 4L, 40.0),
      (1L, 5L, 5.0), (2L, 1L, 7.0))
    val df = rows.toDF("k", "seq", "v")
    val got = Timeseries.ewmaFixedHorizon(df, Seq("k"), Seq("seq"), "v", weights)
      .orderBy("k", "seq").select("ewma").as[Double].collect()
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, rs) =>
      val vs = rs.sortBy(_._2).map(_._3)
      vs.indices.map { i =>
        val window = (0 until math.min(i + 1, weights.length))
          .map(k => (vs(i - k), weights(k)))
        window.map { case (v, w) => v * w }.sum / window.map(_._2).sum
      }
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("activityStreaks: islands split on gaps, longest ties go to the earliest") {
    import extensions.Sequences
    val ev = Seq(
      // user 1: 2-day streak, gap, 2-day streak (tie → earliest start),
      // with duplicate events on one day
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 23:00:00"),
      (1L, "2024-01-02 00:30:00"),
      (1L, "2024-01-05 09:00:00"), (1L, "2024-01-06 09:00:00"),
      // user 2: one 3-day streak
      (2L, "2024-02-10 01:00:00"), (2L, "2024-02-11 01:00:00"),
      (2L, "2024-02-12 01:00:00")
    ).toDF("user_id", "s").select($"user_id", $"s".cast("timestamp").as("ts"))
    val out = Sequences.activityStreaks(ev, "user_id", "ts")
      .orderBy("user_id").as[(Long, Long, Long, String)].collect()
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, "2024-01-01"),
      (2L, 1L, 3L, "2024-02-10")))
  }

  test("Ranking.globalRowNumber == single-partition window row_number (asc, desc, ties)") {
    import extensions.Ranking
    import org.apache.spark.sql.expressions.Window
    // values with heavy ties so the key tiebreak is load-bearing; enough
    // rows that the 4 shuffle partitions all see data
    val df = spark.range(0, 997)
      .select($"id", ($"id" % 13).as("v"), ($"id" % 7).cast("double").as("w"))
    for (sort <- Seq(
        Seq($"v", $"id"),
        Seq($"v".desc, $"id"),
        Seq($"w".desc, $"v", $"id"))) {
      val want = df.withColumn("rn", row_number().over(Window.orderBy(sort: _*)).cast("long"))
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val got = Ranking.globalRowNumber(df, sort, "rn")
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      assert(got === want, s"sort=$sort")
    }
  }

  test("Ranking.globalRunningSum == window cumulative decimal sum, exactly") {
    import extensions.Ranking
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 500)
      .select($"id", (($"id" * 37 % 101).cast("decimal(18,2)") / 4).as("v"))
    val sort = Seq($"v".desc, $"id")
    val w = Window.orderBy(sort: _*).rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum($"v").over(w))
      .select($"id", $"cum".cast("string")).as[(Long, String)].collect().toMap
    val out = Ranking.globalRunningSum(df, sort, $"v", "rn", "cum")
    val got = out.select($"id", $"cum".cast("string")).as[(Long, String)].collect().toMap
    assert(got === want)
    // and the rank agrees with the running count
    val rks = out.select($"rn").as[Long].collect().sorted
    assert(rks.toSeq === (1L to 500L))
  }

  test("Ranking.ntileFromRank matches SQL ntile for uneven and degenerate splits") {
    import extensions.Ranking
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(3, 5, 7, 23, 100); k <- Seq(2, 5, 8)) {
      val df = spark.range(1, n + 1).select($"id".as("rk"))
        .withColumn("n", lit(n.toLong))
      val got = df.select($"rk",
          Ranking.ntileFromRank($"rk", $"n", k).as("b"))
        .as[(Long, Int)].collect().toMap
      val want = spark.range(1, n + 1)
        .select($"id", ntile(k).over(Window.orderBy($"id")).as("b"))
        .as[(Long, Int)].collect().toMap
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("concentration: monopoly → HHI 1 Gini 0; equal split → HHI 1/n Gini 0") {
    import extensions.Stats
    val df = Seq(
      ("mono", 1L, 100.0),
      ("equal", 1L, 25.0), ("equal", 2L, 25.0),
      ("equal", 3L, 25.0), ("equal", 4L, 25.0),
      // one entity holds 70 of 100 across 4: hand-computed
      ("skew", 1L, 10.0), ("skew", 2L, 10.0),
      ("skew", 3L, 10.0), ("skew", 4L, 70.0)
    ).toDF("g", "k", "v")
    val out = Stats.concentration(df, "g", "v", "k")
      .orderBy("g").as[(String, Long, Double, Double, Double)].collect()
    val byG = out.map(r => r._1 -> r).toMap
    assert(byG("mono") === (("mono", 1L, 100.0, 1.0, 0.0)))
    assert(byG("equal")._4 === 0.25 && byG("equal")._5 === 0.0)
    // skew: HHI = (3·100 + 4900)/10000 = 0.52
    assert(byG("skew")._4 === 0.52)
    // gini = (2·(10+20+30+280) − 5·100)/(4·100) = (680−500)/400 = 0.45
    assert(byG("skew")._5 === 0.45)
  }

  test("rfmSegments: scores span 1..5, composite encodes them, monotone vs metrics") {
    import extensions.Segmentation
    val out = Segmentation.rfmSegments(Tables.orders(spark, sf),
      "o_custkey", "o_orderdate", "o_totalprice", "1998-12-01")
    val rows = out.select($"entity_id", $"recency_days", $"frequency",
        $"monetary", $"r_score", $"f_score", $"m_score", $"rfm")
      .as[(Long, Int, Long, Double, Int, Int, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._5 >= 1 && r._5 <= 5 && r._6 >= 1 && r._6 <= 5 && r._7 >= 1 && r._7 <= 5)
      assert(r._8 === r._5 * 100 + r._6 * 10 + r._7)
    }
    // monotone: a strictly higher monetary value never gets a lower m_score
    val byM = rows.sortBy(_._4)
    byM.sliding(2).foreach {
      case Array(a, b) => if (a._4 < b._4) assert(a._7 <= b._7)
      case _ =>
    }
    // quintiles are balanced: bucket sizes differ by at most one
    val sizes = rows.groupBy(_._7).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("Quality.check: hand-built violations count exactly; one row per rule") {
    import extensions.Quality, Quality.Expectation
    val df = Seq(
      (1L, Some(5.0), "ok"), (2L, None, "ok"),
      (3L, Some(-1.0), "bad"), (4L, None, "bad")
    ).toDF("id", "v", "s")
    val out = Quality.check(df, Seq(
        Expectation("v_not_null", $"v".isNull),
        Expectation("v_positive", $"v".isNotNull && $"v" <= 0),
        Expectation("never_fires", lit(false))))
      .orderBy("rule_id")
      .as[(String, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      ("never_fires", 0L, 4L, 0.0),
      ("v_not_null", 2L, 4L, 0.5),
      ("v_positive", 1L, 4L, 0.25)))
  }

  test("Quality.check evaluates all rules in ONE scan (stack reshape, single aggregate)") {
    import extensions.Quality, Quality.Expectation
    val li = Tables.lineitem(spark, sf)
    val df = Quality.check(li, Seq(
      Expectation("a", $"l_quantity".isNull),
      Expectation("b", $"l_discount" > 0.5)))
    df.collect()
    // unwrap AQE: toString on the adaptive root prints initial AND final
    // plans, double-counting every node
    val p = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }).toString
    assert(p.contains("stack"), p)
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected a single lineitem scan, got $scans\n$p")
  }

  test("Attribution.linearByPosition: hand-checked 3-touch and 1-touch conversions") {
    import extensions.Attribution
    def t(s: String) = s
    val touches = Seq(
      (7L, "2024-01-01 10:00:00", 101L), // first for p1
      (7L, "2024-01-01 11:00:00", 102L), // middle
      (7L, "2024-01-01 12:00:00", 103L), // last
      (8L, "2024-01-02 09:00:00", 201L), // sole touch for p2
      (8L, "2023-12-25 09:00:00", 202L)  // outside window — ignored
    ).toDF("user_id", "s", "c_event_id")
      .select($"user_id", $"s".cast("timestamp").as("c_ts"), $"c_event_id")
    val convs = Seq(
      (7L, "2024-01-01 12:30:00", 901L, 10.0),
      (8L, "2024-01-02 10:00:00", 902L, 5.0)
    ).toDF("user_id", "s", "p_event_id", "value")
      .select($"user_id", $"s".cast("timestamp").as("p_ts"), $"p_event_id", $"value")
    val out = Attribution.linearByPosition(touches, convs,
        "user_id", "c_ts", "c_event_id", "p_ts", "p_event_id", "value",
        windowSeconds = 24L * 3600)
      .orderBy("position").as[(String, Long, Long, Double)].collect()
    // p1: 1000¢·10⁴ div 3 = 3333333 per touch; p2: 500¢·10⁴ div 1 = 5000000
    assert(out.toSeq === Seq(
      ("first", 2L, 3333333L + 5000000L, 8.333333),
      ("last", 1L, 3333333L, 3.333333),
      ("middle", 1L, 3333333L, 3.333333)))
  }

  test("decileBuckets: partitions all rows into ordered non-overlapping ranges") {
    val docs = Tables.documents(spark, sf)
      .select(size(extensions.TextOps.tokens($"text")).cast("long").as("n_tokens"))
    val out = extensions.Histograms.decileBuckets(docs, "n_tokens", 8.0)
      .orderBy("decile").as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === docs.count())
    assert(out.forall(r => r._1 >= 1 && r._1 <= 10))
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"overlap: $a / $b")
      case _ =>
    }
  }
}
