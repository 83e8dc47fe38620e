package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.extensions.{Chunking, TextOps}

/** Round-5 operators: context chunking, sequence packing, span dedup
  * (queries h42–h44; oracle parity is the driver gate, these are the
  * property/edge-case tests).
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  // --- chunks -----------------------------------------------------------

  test("chunks: non-overlapping chunks reconstruct the normalized text") {
    val rebuilt = Chunking.chunks(docs, "doc_id", "text", window = 7, stride = 7)
      .groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct($"chunk_idx", $"chunk_text"))),
          s => s.getField("chunk_text")),
        " ").as("rebuilt"))
    val orig = docs
      .select($"doc_id", TextOps.normalized($"text").as("norm"))
      .filter(length($"norm") > 0)
    val joined = orig.join(rebuilt, "doc_id")
    assert(joined.count() === orig.count()) // every non-empty doc chunked
    assert(joined.filter($"norm" =!= $"rebuilt").count() === 0)
  }

  test("chunks: overlapping windows cover every token exactly as specified") {
    val window = 5; val stride = 3
    val nToks = docs
      .select($"doc_id", size(TextOps.tokens($"text")).as("n"))
      .filter($"n" > 0)
      .as[(Long, Int)].collect().toMap
    val chunks = Chunking.chunks(docs, "doc_id", "text", window, stride)
      .select($"doc_id", $"chunk_idx", $"n_toks")
      .as[(Long, Int, Int)].collect()
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet === nToks.keySet)
    for ((id, cs) <- byDoc) {
      val n = nToks(id)
      val idxs = cs.map(_._2).sorted
      assert(idxs.toSeq === (0 to (n - 1) / stride), s"doc $id indices")
      for ((_, i, len) <- cs) // exact per-chunk length, incl. short tail
        assert(len === math.min(window, n - i * stride), s"doc $id chunk $i")
      // 1-based token positions covered by some chunk = 1..n exactly
      val covered = cs.flatMap { case (_, i, len) =>
        (i * stride + 1) to (i * stride + len) }.toSet
      assert(covered === (1 to n).toSet, s"doc $id coverage")
    }
  }

  test("chunks: rejects invalid window/stride") {
    intercept[IllegalArgumentException](
      Chunking.chunks(docs, "doc_id", "text", window = 4, stride = 5))
    intercept[IllegalArgumentException](
      Chunking.chunks(docs, "doc_id", "text", window = 4, stride = 0))
  }

  // --- packBins ---------------------------------------------------------

  test("packBins: independent recomputation of shard/pos/bin from first principles") {
    val budget = 256
    val out = Chunking.packBins(docs, "doc_id", "text", budget)
      .select($"doc_id", $"shard", $"pos", $"n_toks", $"bin")
      .as[(Long, String, Int, Int, Int)].collect()
    // expected n_toks from the tokenizer, independently of packBins
    val nToks = docs
      .select($"doc_id", size(TextOps.tokens($"text")).as("n"))
      .filter($"n" > 0).as[(Long, Int)].collect().toMap
    assert(out.map(_._1).toSet === nToks.keySet)
    // plain-Scala replay of the contract: shard = first md5 hex digit,
    // order by (md5, id) within shard, bin = (cumsum - 1) / budget
    val expected = nToks.toSeq
      .map { case (id, n) => (id, md5hex(id.toString), n) }
      .groupBy(_._2.take(1))
      .flatMap { case (shard, rows) =>
        val sorted = rows.sortBy { case (id, h, _) => (h, id) }
        var cum = 0
        sorted.zipWithIndex.map { case ((id, _, n), i) =>
          cum += n
          id -> ((shard, i + 1, n, (cum - 1) / budget))
        }
      }
    for ((id, shard, pos, n, bin) <- out)
      assert(expected(id) === ((shard, pos, n, bin)), s"doc $id")
  }

  test("packBins: pure function of content — stable under repartitioning") {
    val a = Chunking.packBins(docs, "doc_id", "text", 256).collect().toSet
    val b = Chunking.packBins(docs.repartition(7), "doc_id", "text", 256)
      .collect().toSet
    assert(a === b)
  }

  // --- spanDedup --------------------------------------------------------

  test("spanDedup: exact-duplicate doc is dropped whole, first occurrence wins") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"), // exact dup of doc 1
      (3L, "x y z a b c") // last span duplicates doc 1's first span
    ).toDF("doc_id", "text")
    val out = Chunking.spanDedup(df, "doc_id", "text", spanTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 2L, 2L, "a b c d e f")))
    assert(out(1)._3 === 0L) // doc 2: every span lost to doc 1
    assert(out(1)._4 === null)
    assert(out(2) === ((3L, 2L, 1L, "x y z")))
  }

  test("spanDedup: conservation — kept spans corpus-wide = distinct span texts") {
    val spans = Chunking.chunks(docs, "doc_id", "text", 16, 16)
    val distinctSpans = spans.select("chunk_text").distinct().count()
    val out = Chunking.spanDedup(docs, "doc_id", "text", spanTokens = 16)
    assert(out.agg(sum($"n_kept")).as[Long].head() === distinctSpans)
    assert(out.agg(sum($"n_spans")).as[Long].head() === spans.count())
    assert(out.filter($"n_kept" > $"n_spans").count() === 0)
  }

  test("spanDedup: idempotent — a second pass over the cleaned corpus keeps everything") {
    val once = Chunking.spanDedup(docs, "doc_id", "text", spanTokens = 16)
    // pass 1 made all surviving spans globally unique; docs whose spans all
    // survived re-chunk to the same spans, so pass 2 must keep all of them
    val fixed = once.filter($"n_kept" === $"n_spans")
      .select($"doc_id", $"text_clean".as("text"))
    assert(fixed.count() > 0)
    val twice = Chunking.spanDedup(fixed, "doc_id", "text", spanTokens = 16)
    assert(twice.filter($"n_kept" =!= $"n_spans").count() === 0)
    assert(twice.select($"doc_id", $"text_clean").join(fixed, "doc_id")
      .filter($"text_clean" =!= $"text").count() === 0)
  }

  test("spanDedup: stable under repartitioning") {
    val a = Chunking.spanDedup(docs, "doc_id", "text", 16).collect().toSet
    val b = Chunking.spanDedup(docs.repartition(5), "doc_id", "text", 16)
      .collect().toSet
    assert(a === b)
  }

  // --- substringDedup ---------------------------------------------------

  test("substringDedup: maximal variable-length spans, first occurrence wins") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // all anchors win (smallest id)
      (2L, "p q c d e f g h r s"), // copies doc 1's c..h — a 6-token run
      (3L, "t u a b c d e f v w g h i j x y"), // TWO separated copied runs
      (4L, "z1 z2 z3"), // < minTokens tokens: no anchors, passes through
      (5L, "a b c d e f g h i j") // exact copy: removed whole
    ).toDF("doc_id", "text")
    val out = Chunking.substringDedup(df, "doc_id", "text", minTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 10L, 0L, 0L, 0L, "a b c d e f g h i j")))
    // the three consecutive loser anchors merge to ONE maximal 6-token
    // span (> minTokens — the variable-length point of the operator)
    assert(out(1) === ((2L, 10L, 6L, 1L, 6L, "p q r s")))
    // two non-adjacent runs stay two islands: 6 + 4 tokens removed
    assert(out(2) === ((3L, 16L, 10L, 2L, 6L, "t u v w x y")))
    assert(out(3) === ((4L, 3L, 0L, 0L, 0L, "z1 z2 z3")))
    assert(out(4) === ((5L, 10L, 10L, 1L, 10L, null)))
  }

  test("substringDedup: conservation and span-length floor on the real corpus") {
    val out = Chunking.substringDedup(docs, "doc_id", "text", minTokens = 16)
    // removed + kept partitions the tokens exactly (size(tokens(null)) is
    // null → coalesce 0 for the all-removed docs)
    assert(out.filter(
      coalesce(size(TextOps.tokens($"text_clean")), lit(0)).cast("long") +
        $"n_removed" =!= $"n_tokens").count() === 0)
    // every maximal span is >= minTokens by construction
    val spanned = out.filter($"n_spans" > 0)
    assert(spanned.count() > 0, "fixture has no duplicated substrings?")
    assert(spanned.filter($"max_span" < 16).count() === 0)
    assert(spanned.filter($"n_removed" < $"n_spans" * 16).count() === 0)
    assert(spanned.filter($"max_span" > $"n_removed").count() === 0)
  }

  test("substringDedup: idempotent — a second pass removes nothing") {
    val once = Chunking.substringDedup(docs, "doc_id", "text", minTokens = 16)
    val cleaned = once.filter($"text_clean".isNotNull)
      .select($"doc_id", $"text_clean".as("text"))
    val twice = Chunking.substringDedup(cleaned, "doc_id", "text", minTokens = 16)
    assert(twice.agg(sum($"n_removed")).as[Long].head() === 0L)
  }

  test("substringDedup: stable under repartitioning") {
    val a = Chunking.substringDedup(docs, "doc_id", "text", 16).collect().toSet
    val b = Chunking.substringDedup(docs.repartition(5), "doc_id", "text", 16)
      .collect().toSet
    assert(a === b)
  }

  test("substringDedupFromTokens: per-call, checkpointed AND bucketed token relations all equal the text form") {
    // the shared-construction routing (DupGraph.tokenRows): the anchor scan
    // must produce identical output whether it tokenizes per call, reads
    // the checkpoint-materialized relation, or reads the bucketed table —
    // the Round8/Round9 materialized≡per-call guarantee for token_rows
    import graft.queries.DupGraph
    val fromText = Chunking.substringDedup(docs, "doc_id", "text", 16)
      .collect().map(_.toString).sorted.toSeq
    DupGraph.reset()
    val perCall = Chunking.substringDedupFromTokens(
        DupGraph.tokenRows(spark, sf), "doc_id", 16)
      .collect().map(_.toString).sorted.toSeq
    assert(perCall === fromText)
    try {
      DupGraph.enableMaterialization()
      val checkpointed = Chunking.substringDedupFromTokens(
          DupGraph.tokenRows(spark, sf), "doc_id", 16)
        .collect().map(_.toString).sorted.toSeq
      assert(checkpointed === fromText)
    } finally DupGraph.reset()
    try {
      DupGraph.materializeBucketed(spark, sf, buckets = 4)
      val bucketed = Chunking.substringDedupFromTokens(
          DupGraph.tokenRows(spark, sf), "doc_id", 16)
        .collect().map(_.toString).sorted.toSeq
      assert(bucketed === fromText)
    } finally DupGraph.reset()
  }
  // --- epochShuffle -------------------------------------------------------

  test("epochShuffle: global_pos is a bijection onto 0..N-1") {
    val out = Chunking.epochShuffle(docs, "doc_id", epochSeed = 17L)
    val n = docs.count()
    assert(out.count() === n)
    val pos = out.select($"global_pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq === (0L until n).toSeq)
    // every shard participates and pos ranks are dense within each shard
    val shards = out.groupBy($"shard").agg(count(lit(1)).as("c"),
      max($"pos").as("mx")).collect()
    assert(shards.length === 16)
    assert(shards.forall(r => r.getLong(2) === r.getLong(1)))
  }

  test("epochShuffle: different seeds give different orders over the same ids") {
    val a = Chunking.epochShuffle(docs, "doc_id", epochSeed = 17L)
      .select($"doc_id", $"global_pos")
    val b = Chunking.epochShuffle(docs, "doc_id", epochSeed = 18L)
      .select($"doc_id", $"global_pos")
    // same id set either epoch...
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() === 0)
    // ...but the permutation itself moves (almost every doc, in fact)
    val moved = a.join(b.withColumnRenamed("global_pos", "gp2"), "doc_id")
      .filter($"global_pos" =!= $"gp2").count()
    assert(moved > docs.count() / 2, s"only $moved docs moved between seeds")
  }

  test("epochShuffle: a pure function of (ids, seed) - repartition-stable") {
    val a = Chunking.epochShuffle(docs, "doc_id", epochSeed = 17L)
      .orderBy("global_pos").collect().map(_.toString).toSeq
    val b = Chunking.epochShuffle(docs.repartition(7), "doc_id", epochSeed = 17L)
      .orderBy("global_pos").collect().map(_.toString).toSeq
    assert(a === b)
  }
}
