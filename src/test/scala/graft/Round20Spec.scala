package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Chunking, Dedup, Pipeline, TextAnalysis}

/** Round-20 composition layer: the end-to-end curation pipeline's audit
  * ledger (h122), the LSH parameter planner's trade curve (h124), and
  * incremental shard re-export's blast-radius properties (h125). Oracle
  * parity is the driver gate; these pin the ledger algebra, the
  * stage-equivalence against standalone operators, and the Merkle-diff
  * change-isolation guarantees.
  */
class Round20Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  // --- h122 curateCorpus ----------------------------------------------------

  test("curateCorpus: ledger chains exactly, stage rows match standalone operators") {
    val audit = Pipeline.curateCorpus(docs, "doc_id", "text", "source",
        toks => size(filter(toks, t => t === "spark")) >= 2, steps = 8)
      .orderBy("stage_idx").collect()
    assert(audit.length === 10)
    assert(audit.map(_.getString(1)).toSeq === Seq("input", "clean",
      "exact_dedup", "near_dedup", "split", "leak_repair", "quality_gate",
      "mix_weights", "train_select", "export"))
    // the ledger is a chain: stage k's input IS stage k-1's output
    for (k <- 1 until audit.length) {
      assert(audit(k).getLong(2) === audit(k - 1).getLong(3), s"docs chain @$k")
      assert(audit(k).getLong(4) === audit(k - 1).getLong(5), s"tokens chain @$k")
    }
    // membership only ever shrinks, and the label-only stages (split,
    // leak_repair, mix_weights) pass every doc through
    for (k <- 1 until audit.length) {
      assert(audit(k).getLong(3) <= audit(k).getLong(2), s"docs grew @$k")
      assert(audit(k).getLong(5) <= audit(k).getLong(4), s"tokens grew @$k")
    }
    for (k <- Seq(4, 5, 7))
      assert(audit(k).getLong(2) === audit(k).getLong(3), s"label stage $k dropped docs")
    // export conserves: every effective-train doc has >= 10 tokens (the
    // clean gate), so every one packs — the manifest's own sums must equal
    // the train stat exactly
    assert(audit(9).getLong(3) === audit(9).getLong(2), "export lost docs")
    assert(audit(9).getLong(5) === audit(9).getLong(4), "export lost tokens")
    // stage 1 equals the standalone h22 gate
    val cleanN = TextAnalysis.cleanCorpus(docs, "doc_id", "text")
      .filter($"keep").count()
    assert(audit(1).getLong(3) === cleanN)
    // stage 2 equals the standalone exact collapse over the clean subset
    val cleanDocs = docs.join(TextAnalysis.cleanCorpus(docs, "doc_id", "text")
      .filter($"keep").select($"doc_id"), "doc_id")
    assert(audit(2).getLong(3) ===
      Dedup.exactReps(cleanDocs, "doc_id", "text").count())
    // split detail = raw train-bucket count over survivors; moves detail
    // bounded by the non-train population
    assert(audit(4).getLong(6) <= audit(4).getLong(3))
    assert(audit(5).getLong(6) <= audit(5).getLong(3) - audit(4).getLong(6))
    // input anchors: the whole corpus enters
    assert(audit(0).getLong(2) === docs.count())
  }

  test("curate: returned artifacts agree with the ledger and with standalone exports") {
    val res = Pipeline.curate(docs, "doc_id", "text", "source",
      toks => size(filter(toks, t => t === "spark")) >= 2, steps = 8)
    val audit = res.audit.orderBy("stage_idx").collect()
    assert(res.trainDocs.count() === audit(8).getLong(3))
    assert(res.splits.count() === audit(3).getLong(3),
      "every surviving doc carries an effective split label")
    assert(res.mix.count() === audit(7).getLong(6))
    val m1 = res.manifest.orderBy("out_shard").collect()
      .map(_.toString).toSeq
    val m2 = Chunking.exportManifest(res.trainDocs, "doc_id", "text",
        epochSeed = 29L, budget = 256, shardSize = 4L, shards = 16)
      .orderBy("out_shard").collect().map(_.toString).toSeq
    assert(m1 === m2, "result manifest drifted from the standalone export")
  }

  test("curateCorpus: the ledger is a pure function of the corpus — repartition-stable") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Pipeline.curateCorpus(df, "doc_id", "text", "source",
          toks => size(filter(toks, t => t === "spark")) >= 2, steps = 8)
        .orderBy("stage_idx").collect().map(_.toString).toSeq
    // every stage (hash split, md5 packing, integer training, XOR
    // fingerprints) is placement-independent by construction; the composed
    // ledger must be too — the property that makes a production rerun over
    // a re-laid-out corpus emit the identical audit
    assert(run(docs) === run(docs.repartition(7)))
  }

  // --- h124 lshPlan ----------------------------------------------------------

  test("lshPlan: exact recall endpoints, monotone trade, volume bounds the h5 join") {
    val out = Dedup.lshPlan(docs, "doc_id", "text")
      .orderBy("rows_per_band").collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2, 4, 8, 16))
    assert(out.map(_.getInt(0)).toSeq === Seq(16, 8, 4, 2, 1))
    // exact rational recall at theta=1/2: r=1 -> 1-(1/2)^16, r=16 -> 2^-16
    val recalls = out.map(_.getLong(5)).toSeq
    assert(recalls.head === 999985L)
    assert(recalls.last === 15L)
    assert(recalls === recalls.sorted.reverse, "recall must fall as r grows")
    // candidate volume can only shrink as bands coarsen into longer rows
    val vols = out.map(_.getLong(4)).toSeq
    assert(vols === vols.sorted.reverse, "candidate volume must not grow with r")
    // the (4,4) plan's per-cell pair volume bounds h5's DISTINCT pair count
    val h5n = Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
    val planned = out.find(_.getInt(1) === 4).get.getLong(4)
    assert(planned >= h5n,
      s"planner volume $planned below the measured distinct candidates $h5n")
    // hot buckets are the only candidate producers
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      if (r.getLong(4) > 0) assert(r.getLong(3) > 0)
    }
  }

  // --- h126 epochCappedBudget -------------------------------------------------

  test("epochCappedBudget: hand-solved fixture, exact conservation, cap-respect") {
    import graft.extensions.Mixing
    val doms = Seq(("a", 100L), ("b", 500L), ("c", 500L), ("d", 1000L))
      .toDF("domain", "n_tokens")
    // caps at 2.0 epochs: a=200 b=1000 c=1000 d=2000; budget 1500.
    // Sorted (cap, name): a,b,c,d. i=1: 200*4 < 1500 -> capped;
    // i=2: 1000*3 < 1300 fails -> uncapped prefix ends. k=1, rem=1300,
    // base=433, extra=1 -> b 434 (first uncapped), c 433, d 433.
    val out = Mixing.epochCappedBudget(doms, "domain", "n_tokens",
      budget = 1500L, maxEpochsQ = 2000000L).orderBy("domain").collect()
    assert(out.map(r => r.getString(0) -> r.getLong(3)).toMap ===
      Map("a" -> 200L, "b" -> 434L, "c" -> 433L, "d" -> 433L))
    assert(out.map(_.getLong(3)).sum === 1500L, "budget must conserve exactly")
    out.foreach(r => assert(r.getLong(3) <= r.getLong(2),
      s"${r.getString(0)} allocated over its cap"))
    assert(out.map(r => r.getString(0) -> r.getInt(5)).toMap ===
      Map("a" -> 1, "b" -> 0, "c" -> 0, "d" -> 0))
    // budget above the total ceiling: every domain caps, the rest of the
    // budget is honestly unallocatable under the epoch rule
    val out2 = Mixing.epochCappedBudget(doms, "domain", "n_tokens",
      budget = 10000L, maxEpochsQ = 2000000L).collect()
    assert(out2.map(_.getLong(3)).sum === 4200L)
    assert(out2.forall(_.getInt(5) === 1))
  }

  // --- h125 incrementalExport --------------------------------------------------

  private val mParams = (29L, 256, 4L, 16)

  test("incrementalExport: identical corpus emits zero shards") {
    val v1 = docs.select($"doc_id", $"text")
    val (seed, budget, ss, sh) = mParams
    assert(Chunking.incrementalExport(v1, v1, "doc_id", "text",
      seed, budget, ss, sh).count() === 0)
  }

  test("incrementalExport: a token-count-preserving edit emits exactly its one shard") {
    val v1 = docs.select($"doc_id", $"text")
    val (seed, budget, ss, sh) = mParams
    // uppercasing preserves the (lowercasing) tokenizer's output exactly —
    // packing and epoch order cannot move — while md5(text) flips
    val target = v1.filter($"text".isNotNull && $"text" =!= upper($"text")
        && size(graft.extensions.TextOps.tokens($"text")) > 0)
      .select(min($"doc_id")).head().getLong(0)
    val v2 = v1.withColumn("text",
      when($"doc_id" === target, upper($"text")).otherwise($"text"))
    val diff = Chunking.incrementalExport(v1, v2, "doc_id", "text",
      seed, budget, ss, sh).collect()
    // the doc lives in exactly one packed sequence, hence one output shard
    assert(diff.length === 1, s"expected 1 changed shard, got ${diff.toSeq}")
    assert(diff.head.getString(1) === "changed")
    assert(!diff.head.isNullAt(2) && !diff.head.isNullAt(3))
    assert(diff.head.getLong(2) !== diff.head.getLong(3))
  }

  test("exportManifestVersioned: identical shards/counts to the plain manifest") {
    val (seed, budget, ss, sh) = mParams
    val plain = Chunking.exportManifest(docs, "doc_id", "text",
      seed, budget, ss, sh)
    val versioned = Chunking.exportManifestVersioned(docs, "doc_id", "text",
      seed, budget, ss, sh)
    val joined = plain.select($"out_shard", $"n_seqs", $"n_docs", $"n_tokens")
      .join(versioned.select($"out_shard", $"n_seqs".as("vs"),
        $"n_docs".as("vd"), $"n_tokens".as("vt")), "out_shard")
    assert(joined.count() === plain.count())
    assert(joined.count() === versioned.count())
    assert(joined.filter($"n_seqs" =!= $"vs" || $"n_docs" =!= $"vd" ||
      $"n_tokens" =!= $"vt").count() === 0)
  }
}
