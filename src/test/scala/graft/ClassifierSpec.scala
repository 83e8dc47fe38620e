package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.extensions.{Classifier, TextAnalysis}

/** Round-18 trained-model operators: the hashed-bigram logistic quality
  * classifier (h116) and the char-trigram Naive Bayes language ID (h117).
  * Oracle parity is the driver gate; these are the driver-replay,
  * convergence, and edge-case pins.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf)

  private val D = 256
  private val T = 12
  private val Micro = 1000000L

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Pure-Scala replica of the featurization + trainer — the independent
    * implementation the engine must agree with bit-for-bit.
    */
  private def replay(): (Array[Long], Map[Long, (Int, Long)]) = {
    val rows = docs.select($"doc_id", $"text").collect().flatMap { r =>
      val text = if (r.isNullAt(1)) null else r.getString(1)
      val toks =
        if (text == null) Array.empty[String]
        else text.toLowerCase.replaceAll("\\s+", " ").trim
          .split(" ").filter(_.nonEmpty)
      if (toks.length < 2) None
      else {
        val y = if (toks.count(_ == "spark") >= 2) 1 else 0
        val js = toks.sliding(2)
          .map(p => (java.lang.Long.parseLong(
            md5hex(p(0) + " " + p(1)).take(4), 16) % D).toInt)
          .toSet + D
        Some((r.getLong(0), y, js))
      }
    }
    val n = rows.length.toLong
    val w = Array.fill(D + 1)(0L)
    def pQ(z: Long): Long =
      math.min(Micro, math.max(0L,
        math.floor((z + 2 * Micro).toDouble / 4.0).toLong))
    for (_ <- 1 to T) {
      val g = Array.fill(D + 1)(0L)
      rows.foreach { case (_, y, js) =>
        val err = pQ(js.iterator.map(w).sum) - y * Micro
        js.foreach(j => g(j) += err)
      }
      val d = 2L * n
      for (j <- 0 to D)
        w(j) -= (if (g(j) >= 0) g(j) / d else -((-g(j)) / d))
    }
    val scores = rows.map { case (id, y, js) =>
      id -> (y, pQ(js.iterator.map(w).sum))
    }.toMap
    (w, scores)
  }

  test("qualityLrScores: engine training matches the driver replay bit-for-bit") {
    val (wReplay, scoresReplay) = replay()
    val (wEngine, _, n) = Classifier.trainState(docs, "doc_id", "text",
      toks => size(filter(toks, t => t === "spark")) >= 2, D, T)
    assert(n === scoresReplay.size.toLong)
    assert(wEngine.toSeq === wReplay.toSeq)
    val out = Classifier.qualityLrScores(docs, "doc_id", "text",
        toks => size(filter(toks, t => t === "spark")) >= 2, D, T)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out === scoresReplay)
  }

  test("qualityLrScores: training converges (loss falls, accuracy beats majority)") {
    val out = Classifier.qualityLrScores(docs, "doc_id", "text",
      toks => size(filter(toks, t => t === "spark")) >= 2, D, T)
      .select($"y", $"score_q", $"pred").collect()
    val n = out.length.toDouble
    val posRate = out.count(_.getInt(0) == 1) / n
    val majority = math.max(posRate, 1 - posRate)
    val acc = out.count(r => r.getInt(2) == r.getInt(0)) / n
    // step 0 is all-zero weights: score_q = 500000 everywhere, mean L1
    // error exactly 0.5 — the trained model must be meaningfully better
    val meanL1 = out.map(r =>
      math.abs(r.getLong(1) - r.getInt(0) * Micro)).sum / n / Micro
    assert(acc >= majority + 0.15,
      s"trained accuracy $acc vs majority $majority — model learned nothing")
    assert(meanL1 < 0.45, s"mean L1 error $meanL1 did not fall from 0.5")
  }

  test("qualityLrScores: sub-2-token and null docs are excluded, output is 1 row/doc") {
    val aug = docs.select($"doc_id", $"text")
      .unionByName(Seq((900001L, "single"), (900002L, null),
        (900003L, "  ")).toDF("doc_id", "text"))
    val out = Classifier.qualityLrScores(aug, "doc_id", "text",
      toks => size(filter(toks, t => t === "spark")) >= 2, D, T)
    assert(out.filter($"doc_id" >= 900001L).count() === 0)
    assert(out.groupBy($"doc_id").count().filter($"count" > 1).count() === 0)
  }

  test("nbLangId: accuracy beats the majority-class prior at sf0.001") {
    // the fixture's lang↔text correlation exists at the small SFs (it
    // washes out at sf0.1) — the pin shows the model learns a real signal
    // where one exists, not just the prior (a prior-only scorer predicts
    // ONE class and lands exactly at the majority rate)
    val out = TextAnalysis.nbLangId(docs, "doc_id", "text", "lang").collect()
    val n = out.length.toDouble
    val majority = out.groupBy(_.getString(1)).values.map(_.size).max / n
    val acc = out.count(_.getInt(4) == 1) / n
    assert(acc >= majority + 0.1,
      s"NB accuracy $acc vs majority prior $majority")
    assert(out.map(_.getString(2)).distinct.size > 1,
      "degenerate model: every prediction is the same language")
  }

  test("nbLangId: deterministic under repartitioning, one row per eligible doc") {
    val a = TextAnalysis.nbLangId(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.nbLangId(docs.repartition(7), "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    val eligible = docs.filter(
      length(trim(regexp_replace(lower($"text"), "\\s+", " "))) >= 3).count()
    assert(a.size.toLong === eligible)
  }

  test("multiPolicyScores: each head's training equals an independent single-rule run bit-for-bit") {
    import org.apache.spark.sql.Column
    val heads: Seq[(String, Column => Column)] = Seq(
      "datarich" -> ((toks: Column) => size(filter(toks,
        (t: Column) => t === "data")) >= 2),
      "longform" -> ((toks: Column) => size(toks) >= 56),
      "quality" -> ((toks: Column) => size(filter(toks,
        (t: Column) => t === "spark")) >= 2))
    val steps = 8
    val (wm, _, nm) = Classifier.trainStateMulti(docs, "doc_id", "text",
      heads.map(_._2), D, steps)
    for (((name, rule), k) <- heads.zipWithIndex) {
      val (w1, _, n1) = Classifier.trainState(docs, "doc_id", "text",
        rule, D, steps)
      assert(n1 === nm)
      assert(wm(k).toSeq === w1.toSeq,
        s"head '$name' diverged from its independent training")
    }
    // the argmax routes to the alphabetically-first head on ties: with
    // zero steps... (ties are data-dependent, so pin the rule structurally:
    // scores equal => pred_head is the first name alphabetically)
    val out = Classifier.multiPolicyScores(docs, "doc_id", "text", heads,
      D, steps).collect()
    out.foreach { r =>
      val scores = Seq(("datarich", r.getLong(4)), ("longform", r.getLong(5)),
        ("quality", r.getLong(6)))
      val best = scores.maxBy(_._2)._2
      val expect = scores.filter(_._2 == best).map(_._1).min
      assert(r.getString(7) === expect,
        s"pred_head ${r.getString(7)} != argmax-with-alpha-tie $expect")
    }
  }

  test("calibrate: confusion cells replay from the scored corpus; best is the F1 argmax") {
    import org.apache.spark.sql.Column
    val rule = (toks: Column) => size(filter(toks,
      (t: Column) => t === "spark")) >= 2
    val scored = Classifier.qualityLrScores(docs, "doc_id", "text", rule, D, T)
      .select($"y", $"score_q").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val out = Classifier.calibrate(docs, "doc_id", "text", rule, D, T,
      thresholds = 20).orderBy($"thr_q").collect()
    assert(out.length === 21)
    val p = scored.count(_._1 == 1).toLong
    val nn = scored.length - p
    for (r <- out) {
      val thr = r.getLong(0)
      val tp = scored.count { case (y, s) => y == 1 && s >= thr }.toLong
      val fp = scored.count { case (y, s) => y == 0 && s >= thr }.toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((tp, fp, p - tp, nn - fp)), s"confusion cells at thr $thr")
      val precQ = if (tp + fp == 0) Micro else tp * Micro / (tp + fp)
      val recQ = if (p == 0) Micro else tp * Micro / p
      val f1Q = if (2 * tp + fp + (p - tp) == 0) 0L
                else 2 * tp * Micro / (2 * tp + fp + (p - tp))
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) ===
        ((precQ, recQ, f1Q)), s"ratios at thr $thr")
    }
    // exactly one best row: the max-F1 threshold, ties to the smallest
    val best = out.filter(_.getInt(8) == 1)
    assert(best.length === 1)
    val maxF1 = out.map(_.getLong(7)).max
    assert(best.head.getLong(7) === maxF1)
    assert(best.head.getLong(0) ===
      out.filter(_.getLong(7) == maxF1).map(_.getLong(0)).min)
    // thr 0 predicts everything positive: recall is exactly 1
    assert(out.head.getLong(6) === Micro)
  }
}
