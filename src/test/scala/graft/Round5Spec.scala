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
}
