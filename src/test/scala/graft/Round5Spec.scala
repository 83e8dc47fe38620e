package graft

import org.apache.spark.sql.functions._

import graft.extensions.{LmScore, TextAnalysis, TextOps}

/** Round-5 operator tests beyond ChunkingSpec: bigram LM scoring and the
  * shingle-2 primitive it builds on.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  test("shingles2 matches the naive bigram construction") {
    val toks = TextOps.tokens($"text")
    val naive = expr(
      "transform(sequence(1, greatest(size(__t) - 1, 0)), " +
        "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))")
    val both = docs.select($"doc_id", toks.as("__t"))
      .filter(size($"__t") >= 2)
      .select($"doc_id", TextOps.shingles2($"__t").as("fast"), naive.as("slow"))
    assert(both.filter($"fast" =!= $"slow").count() === 0)
    // < 2 tokens → empty array, not null
    val tiny = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val r = tiny.select(TextOps.shingles2(TextOps.tokens($"text")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(r.forall(_.isEmpty))
  }

  test("bigram LM: hand-checked MLE conditionals on a tiny corpus") {
    val tiny = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LmScore.bigramScores(tiny, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // corpus: c(a b)=2, c(b a)=1, c(a c)=1 → c(a·)=3, c(b·)=1
    def q(p: Double): Long = math.floor(math.log(p) * 1e6 + 0.5).toLong
    val qAB = q(2.0 / 3.0); val qBA = q(1.0); val qAC = q(1.0 / 3.0)
    assert(out(0) === ((1L, 3L, 2 * qAB + qBA,
      (2 * qAB + qBA).toDouble / (3 * 1e6))))
    assert(out(1) === ((2L, 1L, qAC, qAC.toDouble / 1e6)))
  }

  test("bigram LM: every multi-token doc scored, scores non-positive, partition-stable") {
    val nDocs = docs
      .filter(size(TextOps.tokens($"text")) >= 2).count()
    val out = LmScore.bigramScores(docs, "doc_id", "text")
    assert(out.count() === nDocs)
    assert(out.filter($"avg_logprob" > 0).count() === 0)
    assert(out.filter($"n_bigrams" <= 0).count() === 0)
    val a = out.collect().toSet
    val b = LmScore.bigramScores(docs.repartition(7), "doc_id", "text")
      .collect().toSet
    assert(a === b)
  }

  test("token entropy: hand-checked nats on known distributions") {
    val tiny = Seq(
      (1L, "a a b b"), // uniform over 2 → ln 2
      (2L, "a b c d"), // uniform over 4 → ln 4
      (3L, "a a a")    // degenerate → 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(tiny, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - math.log(2)) < 1e-5)
    assert(math.abs(out(2L) - math.log(4)) < 1e-5)
    assert(out(3L) === 0.0)
    // corpus-wide: entropy bounded by ln(n_distinct) ≤ ln(n_tokens);
    // the per-term micro-unit rounding can overshoot by ≤ 0.5e-6 weighted,
    // hence the 1e-6 tolerance (1e-9 tripped on real docs)
    val bad = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .filter($"entropy" < 0 ||
        $"entropy" > log($"n_tokens".cast("double")) + 1e-6)
    assert(bad.count() === 0)
  }

  test("PMI collocations: perfectly-associated pair scores ln(4) on the 2-token corpus") {
    val tiny = (1L to 5L).map(i => (i, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(tiny, "doc_id", "text",
      minCount = 5L, k = 10).as[(String, Long, Double)].collect()
    // p(xy)=1, p(x)=p(y)=1/2 → PMI = ln 4, floor-rounded to 4 dp
    assert(out.toSeq === Seq(("x y", 5L, math.floor(math.log(4) * 1e4 + 0.5) / 1e4)))
  }

  test("BM25: hand-checked scores on a 3-doc corpus") {
    // corpus: d1 = "cat dog", d2 = "cat cat cat fish", d3 = "fish fish"
    // query {cat}: df=2, N=3, avglen = 8/3
    val tiny = Seq((1L, "cat dog"), (2L, "cat cat cat fish"), (3L, "fish fish"))
      .toDF("doc_id", "text")
    val out = graft.extensions.Retrieval
      .bm25TopK(tiny, "doc_id", "text", Seq("cat"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    def bm25(tf: Long, len: Long, df: Long, n: Long, avg: Double): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val q = math.floor(
        idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avg))) * 1e6 + 0.5)
      q / 1e6
    }
    val avg = 8.0 / 3.0
    assert(out.keySet === Set(1L, 2L))          // fish-only doc never scored
    assert(math.abs(out(1L) - bm25(1, 2, 2, 3, avg)) < 1e-9)
    assert(math.abs(out(2L) - bm25(3, 4, 2, 3, avg)) < 1e-9)
    assert(out(2L) > out(1L))                   // higher tf wins at similar len
  }

  test("hybrid RRF: fused score decomposes into the two rank contributions") {
    val out = graft.extensions.Retrieval.hybridRrfTopK(
      docs, Tables.embeddings(spark, sf),
      Seq("spark", "join", "window"), queryVecId = 7L, k = 20)
      .collect()
    assert(out.length === 20)
    def contrib(r: Any): Long = r match {
      case null => 0L
      case l: Long => math.floor(1e9 / (60.0 + l) + 0.5).toLong
    }
    out.foreach { row =>
      val expect = contrib(row.get(1)) + contrib(row.get(2))
      assert(row.getLong(3) === expect, row.toString)
    }
    // descending fused order with id tiebreak
    val scores = out.map(r => (-r.getLong(3), r.getLong(0)))
    assert(scores.toSeq === scores.sortBy(identity).toSeq)
    // both retrievers contribute somewhere in the pool
    assert(out.exists(r => r.get(1) != null) && out.exists(r => r.get(2) != null))
  }

  test("DSIR weights: in-target-only vocab scores positive, off-target negative; exact formula") {
    // d1 (target) uses token "xx" only; d2 (raw-only) uses "yy" only.
    // Buckets are md5-prefix bins; "xx" and "yy" land in different buckets
    // (asserted) so the hand-computed counts apply per bucket.
    val px = java.security.MessageDigest.getInstance("MD5")
      .digest("xx".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    val py = java.security.MessageDigest.getInstance("MD5")
      .digest("yy".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    assert(px !== py)
    val tiny = Seq((1L, "en", "xx xx"), (2L, "de", "yy")).toDF("doc_id", "lang", "text")
    val out = graft.extensions.Mixing
      .dsirWeights(tiny, "doc_id", "text", $"lang" === "en")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "weight_q").as[(Long, Long, Long)].collect()
    def q(ct: Long, cr: Long, nt: Long, nr: Long): Long =
      math.floor(math.log(((ct + 1.0) / (nt + 4096.0)) /
        ((cr + 1.0) / (nr + 4096.0))) * 1e6 + 0.5).toLong
    // corpus: cr(bx)=2 ct(bx)=2, cr(by)=1 ct(by)=0, Nr=3, Nt=2
    assert(out(0) === ((1L, 2L, 2 * q(2, 2, 2, 3))))
    assert(out(1) === ((2L, 1L, q(0, 1, 2, 3))))
    assert(out(0)._3 > 0 && out(1)._3 < 0)
  }

  test("DSIR weights: token conservation and partition stability on the real corpus") {
    val total = docs.select(explode(TextOps.tokens($"text"))).count()
    val out = graft.extensions.Mixing
      .dsirWeights(docs, "doc_id", "text", $"lang" === "en")
    assert(out.agg(sum("n_tokens")).as[Long].head() === total)
    val a = out.collect().toSet
    val b = graft.extensions.Mixing
      .dsirWeights(docs.repartition(7), "doc_id", "text", $"lang" === "en")
      .collect().toSet
    assert(a === b)
  }

  test("DSIR resample: Gumbel keys recompute exactly; k rows; partition-stable") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def gumbel(id: Long): Double = {
      val h = md5hex(id.toString)
      def d(c: Char) = c - 48 - (if (c >= 'a') 39 else 0)
      val b = d(h(0)) * 16 + d(h(1))
      -math.log(-math.log((b + 0.5) / 256.0))
    }
    val out = graft.extensions.Mixing
      .dsirResample(docs, "doc_id", "text", $"lang" === "en", k = 100)
      .select("doc_id", "weight_q", "score_q").as[(Long, Long, Long)].collect()
    assert(out.length === 100)
    out.foreach { case (id, wq, sq) =>
      val expect = math.floor((wq.toDouble / 1e6 + gumbel(id)) * 1e6 + 0.5).toLong
      assert(sq === expect, s"doc $id")
    }
    val b = graft.extensions.Mixing
      .dsirResample(docs.repartition(7), "doc_id", "text", $"lang" === "en", k = 100)
      .select("doc_id", "weight_q", "score_q").as[(Long, Long, Long)].collect()
    assert(out.toSet === b.toSet)
  }

  test("semanticDedup: two obvious clusters of duplicates keep exactly their lowest ids") {
    // ids 1-4 point along e0 (tiny distinct perturbations), 5-8 along e1:
    // 2 clusters; within each, all pairwise cosines ≈ 1 ≥ 0.9 → head id wins
    def vec(axis: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(axis) = 1.0f; v((axis + 2) % 8) = eps; v
    }
    val rows = (1L to 4L).map(i => (i, vec(0, 0.01f * i))) ++
      (5L to 8L).map(i => (i, vec(1, 0.01f * i)))
    val embs = rows.toDF("vec_id", "embedding")
    val out = graft.extensions.Similarity
      .semanticDedup(embs, "vec_id", "embedding", minCosine = 0.9,
        nCentroids = 2, kmeansIters = 1)
      .orderBy("vec_id")
      .select("vec_id", "is_kept").as[(Long, Boolean)].collect()
    assert(out.map(_._1).toSeq === (1L to 8L))
    assert(out.filter(_._2).map(_._1).toSet === Set(1L, 5L))
  }

  test("semanticDedup: full disposition, kept-set head per cluster, partition-stable") {
    val embs = Tables.embeddings(spark, sf)
    val out = graft.extensions.Similarity
      .semanticDedup(embs, "vec_id", "embedding", minCosine = 0.3)
    val rows = out.select("vec_id", "cid", "is_kept")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length === embs.count())
    // the lowest id in every cluster has no lower-id neighbor → always kept
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.minBy(_._1)._3, s"cluster head dropped: ${members.minBy(_._1)}")
    }
    val b = graft.extensions.Similarity
      .semanticDedup(embs.repartition(7), "vec_id", "embedding", minCosine = 0.3)
      .select("vec_id", "cid", "is_kept").as[(Long, Long, Boolean)].collect()
    assert(rows.toSet === b.toSet)
  }

  test("incrementalDedup: exact, near-dup, within-batch precedence, and fresh admits") {
    // "a b c a b c a" has the SAME 3-shingle set as "a b c a b c" (different
    // text, so the exact layer passes it) → identical minhash signature →
    // guaranteed LSH candidate with Jaccard 1.0
    val existing = Seq(
      (2L, "a b c a b c"),
      (4L, "completely unrelated corpus document text")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "a b c a b c"),               // exact dup of existing 2 → dropped
      (3L, "a b c a b c a"),             // near-dup of existing 2 → dropped
      (5L, "totally different content here now"), // fresh → admitted
      (7L, "a b c a b c a"),             // within-batch exact dup of 3 → dropped
      (9L, "x y z x y z"),               // fresh → admitted
      (11L, "x y z x y z x")             // near-dup of lower-id batch doc 9 → dropped
    ).toDF("doc_id", "text")
    val admitted = graft.extensions.Dedup
      .incrementalDedup(existing, incoming, "doc_id", "text", minJaccard = 0.5)
      .as[Long].collect().sorted
    assert(admitted.toSeq === Seq(5L, 9L))
    // the existing corpus is never re-deduped: swapping roles admits nothing
    val none = graft.extensions.Dedup
      .incrementalDedup(incoming, incoming, "doc_id", "text", minJaccard = 0.5)
      .count()
    assert(none === 0) // every batch doc exact-matches itself in the corpus
  }

  test("incrementalDedup: parity-split on the real corpus is partition-stable and consistent") {
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val a = graft.extensions.Dedup
      .incrementalDedup(even, odd, "doc_id", "text").as[Long].collect().toSet
    assert(a.nonEmpty && a.forall(_ % 2 == 1))
    val b = graft.extensions.Dedup
      .incrementalDedup(even.repartition(5), odd.repartition(7), "doc_id", "text")
      .as[Long].collect().toSet
    assert(a === b)
  }

  test("domainMixture: hand-checked uniform-target weights") {
    val tiny = Seq(("a", "t1 t2 t3"), ("b", "t4")).toDF("source", "text")
    val out = graft.extensions.Mixing.domainMixture(tiny, "source", "text")
      .orderBy("domain")
      .select("domain", "n_docs", "n_tokens", "share_q", "weight_q")
      .as[(String, Long, Long, Long, Long)].collect()
    // T=4, S=2: a → share 750000, weight floor(4e6/6+.5)=666667; b → 250000, 2e6
    assert(out(0) === (("a", 1L, 3L, 750000L, 666667L)))
    assert(out(1) === (("b", 1L, 1L, 250000L, 2000000L)))
  }

  test("bpePairStats: hand-checked pair counts; single-char tokens contribute nothing") {
    val tiny = Seq((1L, "abab ab"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(tiny, "text", k = 10)
      .as[(String, Long)].collect()
    // "abab" → ab, ba, ab; "ab" → ab; single-char tokens skipped
    assert(out.toSeq === Seq(("ab", 3L), ("ba", 1L)))
  }

  test("noveltyScores: hand-checked df=1 fractions; short docs absent") {
    val tiny = Seq(
      (1L, "a b c d"),      // shingles {abc, bcd}: abc shared → novelty 0.5
      (2L, "a b c e"),      // shingles {abc, bce}: 0.5
      (3L, "q w e r t"),    // all 3 shingles unique → 1.0
      (4L, "x y")           // < 3 tokens → absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(tiny, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 3L, 3L, 1.0)))
    // corpus-wide invariants: novelty ∈ [0,1]; Σ n_novel = # df-1 shingles
    val real = TextAnalysis.noveltyScores(docs, "doc_id", "text")
    assert(real.filter($"novelty" < 0 || $"novelty" > 1).count() === 0)
  }

  test("noveltyCurve: hand-checked two-bucket curve; first bucket all-novel") {
    val tiny = Seq(
      (0L, "a b c"), (1L, "a b c"),           // bucket 0: abc twice
      (2L, "a b c"), (3L, "d e f")            // bucket 1: abc (seen), def (new)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyCurve(tiny, "doc_id", "text", nBuckets = 2)
      .orderBy("bucket")
      .select("bucket", "n_occurrences", "n_distinct", "n_first_seen", "novelty")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq((0L, 2L, 1L, 1L, 1.0), (1L, 2L, 2L, 1L, 0.5)))
    // real-corpus invariants: the earliest bucket is all-novel by
    // construction, shares stay in [0,1], and the first-seen counts
    // partition the corpus's distinct shingle set exactly
    val rows = TextAnalysis.noveltyCurve(docs, "doc_id", "text")
      .orderBy("bucket")
      .select("bucket", "n_distinct", "n_first_seen", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.head._4 === 1.0)
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    val totalDistinct = graft.extensions.Dedup
      .shingleRows(docs, "doc_id", "text")
      .select("shingle").distinct().count()
    assert(rows.map(_._3).sum === totalDistinct)
  }

  test("noveltyCurve: overflowing id spans are rejected in-plan; small negative spans work") {
    // a small mixed-sign span is perfectly representable — the divide-first
    // math buckets it correctly (doc -5 in bucket 0, doc 3 in bucket 1:
    // span 8, width 5)
    val ok = Seq((-5L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
    val curve = TextAnalysis.noveltyCurve(ok, "doc_id", "text", nBuckets = 2)
      .orderBy("bucket")
      .select("bucket", "n_distinct", "n_first_seen")
      .as[(Long, Long, Long)].collect()
    assert(curve.toSeq === Seq((0L, 2L, 2L), (1L, 2L, 2L)))
    // a mixed-sign span wider than Long.MaxValue wraps hi - lo and NO
    // signed-64 form can bucket it — asserted at execution time
    val bad = Seq((Long.MinValue, "a b c d"), (10L, "a b c d"))
      .toDF("doc_id", "text")
    val e = intercept[Throwable] {
      TextAnalysis.noveltyCurve(bad, "doc_id", "text", nBuckets = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("span overflows")),
      messages(e).mkString(" | "))
    // an EMPTY shingle relation (every doc under 3 tokens) stays an empty
    // curve, not an assert crash on the NULL bounds row
    val empty = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(TextAnalysis.noveltyCurve(empty, "doc_id", "text", 2).count() === 0)
  }

  test("percentileGate: keeps exactly the top half of each domain, ranks dense from 1") {
    val out = TextAnalysis.percentileGate(docs, "doc_id", "text", "source")
    val bySrc = out.select("domain", "rank_in_domain", "n_in_domain")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val srcSizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    bySrc.foreach { case (src, rows) =>
      val n = srcSizes(src)
      assert(rows.forall(_._3 === n))
      assert(rows.map(_._2).sorted.toSeq === (1L to n / 2))
    }
    // every source with ≥ 2 docs appears
    assert(bySrc.keySet === srcSizes.filter(_._2 >= 2).keySet)
  }

  test("BM25: rare term outranks common term; k truncates; result partition-stable") {
    // 20 docs contain 'common'; 2 also contain 'rare'
    val docsDf = (1L to 20L)
      .map(i => (i, if (i <= 2) "rare common pad" else "common pad pad"))
      .toDF("doc_id", "text")
    val top = graft.extensions.Retrieval
      .bm25TopK(docsDf, "doc_id", "text", Seq("rare", "common"), k = 5)
      .select("doc_id").as[Long].collect()
    assert(top.length === 5)
    assert(top.take(2).toSet === Set(1L, 2L))   // rare-term docs lead
    val repart = graft.extensions.Retrieval
      .bm25TopK(docsDf.repartition(7), "doc_id", "text", Seq("rare", "common"), k = 5)
      .select("doc_id").as[Long].collect()
    assert(repart.toSeq === top.toSeq)
  }

  test("bagDedup: shuffled copy collides, multiset changes separate, lowest id kept") {
    val tiny = Seq(
      (1L, "a b c"),
      (2L, "c  B a"),   // same bag after lowercase/ws-normalize → collides with 1
      (3L, "a b c c"),  // extra multiplicity → separate cluster
      (4L, "a b")       // subset → separate cluster
    ).toDF("doc_id", "text")
    val out = graft.extensions.Dedup.bagDedup(tiny, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "bag_fp", "cluster_size", "kept")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(out(0)._2 === out(1)._2)
    assert(Seq(out(0)._2, out(2)._2, out(3)._2).distinct.size === 3)
    assert(out(0)._3 === 2L && out(0)._4 && !out(1)._4)
    assert(out(2)._4 && out(3)._4)
    // corpus invariants: full disposition (one row per doc), exactly one
    // keeper per cluster, cluster_size consistent with the actual group
    val real = graft.extensions.Dedup.bagDedup(docs, "doc_id", "text")
    assert(real.count() === docs.count())
    val perCluster = real.groupBy("bag_fp")
      .agg(sum(when($"kept", 1L).otherwise(0L)).as("keepers"),
        count(lit(1)).as("n"), max($"cluster_size").as("sz"))
    assert(perCluster.filter($"keepers" =!= 1L || $"n" =!= $"sz").count() === 0)
    // order-insensitivity on the real corpus: reversing every doc's token
    // order leaves the fingerprint (and hence the whole disposition) fixed
    val rev = docs.select($"doc_id",
      array_join(reverse(split($"text", " ")), " ").as("text"))
    val a = graft.extensions.Dedup.bagDedup(docs, "doc_id", "text")
      .select("doc_id", "bag_fp")
    val b = graft.extensions.Dedup.bagDedup(rev, "doc_id", "text")
      .select("doc_id", "bag_fp")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("hardNegatives: never same label, never self, and = label-filtered brute force") {
    val embs = Tables.embeddings(spark, sf)
    val queries = embs.filter($"vec_id" < 16)
    val out = graft.extensions.Similarity
      .hardNegatives(embs, queries, "vec_id", "embedding", "label", 5)
    val rows = out.select("query_id", "query_label", "rank", "neighbor_id",
      "neighbor_label").as[(Long, Int, Int, Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, ql, _, n, nl) => ql != nl && q != n })
    // every query with ≥5 different-label candidates gets exactly 5, ranked 1..5
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(g => g.map(_._3).sorted.toSeq === (1 to g.size)))
    // equivalence: top-k over the label-mismatch-prefiltered corpus (a
    // different plan — filter under bruteForceTopK per query, via join)
    // must select the same neighbor sets
    val brute = graft.extensions.Similarity
      .bruteForceTopK(embs, queries, "vec_id", "embedding", k = 2000)
      .join(embs.select($"vec_id".as("query_id"), $"label".as("ql")), "query_id")
      .join(embs.select($"vec_id".as("neighbor_id"), $"label".as("nl")), "neighbor_id")
      .filter($"ql" =!= $"nl")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"cos".desc, $"neighbor_id")
    val expect = brute.withColumn("rr", row_number().over(w))
      .filter($"rr" <= 5)
      .select($"query_id", $"rr".as("rank"), $"neighbor_id", $"cos")
    val got = out.select("query_id", "rank", "neighbor_id", "cos")
    assert(expect.except(got).count() === 0 && got.except(expect).count() === 0)
  }

  test("pageRank: hand-computed path graph; hub outranks leaves; partition-stable") {
    // path 1-2-3: hand-rolled fixed-point iterations
    // s1: leaf = 150000+floor(.85*500000) = 575000; hub = 150000+floor(.85*2e6) = 1850000
    // s2: leaf = 150000+floor(.85*925000) = 936250; hub = 150000+floor(.85*1150000) = 1127500
    // s3: leaf = 150000+floor(.85*563750) = 629187; hub = 150000+floor(.85*1872500) = 1741625
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = graft.extensions.Dedup.pageRank(pairs, "id_a", "id_b", iterations = 3)
      .orderBy("node").select("node", "pr_micro").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 629187L), (2L, 1741625L), (3L, 629187L)))
    // real graph: every node in an edge scores, all scores positive, and
    // the result is invariant under a different input partitioning
    val real = graft.extensions.Dedup.simhashNearDupPairs(
      docs, "doc_id", "text", maxHamming = 2, bands = 4, sigBits = 32)
    val pr = graft.extensions.Dedup.pageRank(real, "id_a", "id_b")
    val nodes = real.select($"id_a".as("n")).union(real.select($"id_b".as("n"))).distinct()
    assert(pr.count() === nodes.count())
    assert(pr.filter($"pr_micro" <= 0).count() === 0)
    val pr2 = graft.extensions.Dedup.pageRank(real.repartition(7), "id_a", "id_b")
      .select("node", "pr_micro")
    val pr1 = pr.select("node", "pr_micro")
    assert(pr1.except(pr2).count() === 0 && pr2.except(pr1).count() === 0)
  }

  test("bpeLearn: hand-checked rounds — greedy-leftmost overlap rule, composite merges, early stop") {
    import graft.extensions.TextAnalysis
    // corpus: "aaaa" x3, "aab" x2, "bb" x1 →
    // round 1 pair counts: (a,a): 3*3 + 2*1 = 11, (a,b): 2, (b,b): 1
    //   merge (a,a); greedy on "aaaa" takes positions 1 and 3 → [aa, aa]
    //   (the every-other island rule), "aab" → [aa, b]
    // round 2: (aa,aa): 3, (aa,b): 2, (b,b): 1 → merge (aa,aa)=aaaa
    // round 3: (aa,b): 2, (b,b): 1 → merge (aa,b)=aab
    // round 4: (b,b): 1 → merge (b,b)=bb
    // round 5: no pairs left → early stop (4 rows, not 6)
    val docs = Seq("aaaa aaaa aaaa aab aab bb").toDF("text")
    val out = TextAnalysis.bpeLearn(docs, "text", nMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(out === Seq(
      (1, "a", "a", "aa", 11L),
      (2, "aa", "aa", "aaaa", 3L),
      (3, "aa", "b", "aab", 2L),
      (4, "b", "b", "bb", 1L)))
    // stable under repartitioning (integer counts, lexicographic ties)
    val out2 = TextAnalysis.bpeLearn(docs.repartition(5), "text", nMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(out2 === out)
  }
}
