package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.extensions.{TextAnalysis, TextOps}
import graft.functions.{DotWeights, HashedBigramBuckets, MarkerHits, TrigramBuckets}

/** Round-21 optimization pins: each native codegen expression introduced
  * this round is held bit-for-bit against the EXACT interpreted
  * formulation it replaced (the retired HOF/explode forms, rebuilt here
  * verbatim), on adversarial inputs the oracles don't reach — null
  * arrays, null elements, empty/short inputs, multi-byte code points,
  * duplicate buckets. The declared-query oracles (h10/h11/h16/h22,
  * h116/h117/h121/h122/h123) pin the same rewrites end-to-end on fixture
  * data; these pins localize a future break to the expression.
  */
class Round21Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, Seq("the", "of", "quick", "la", "brown", "the")), // en+es/fr overlap, dup "the"
    (2L, Seq("el", "la", "que", "de", "los")),             // es markers, "de" also fr/pt
    (3L, Seq("zzz", "qqq")),                               // zero hits everywhere
    (4L, Seq.empty[String]),                               // empty array
    (5L, null)                                             // null array
  ).toDF("id", "toks")

  private val langs = TextOps.langMarkers.keys.toSeq.sorted

  test("MarkerHits ≡ retired size(filter(isin)) per set, incl. null array") {
    val native = docs.select(col("id"),
      GraftColumnBridge.column(MarkerHits(
        GraftColumnBridge.expression(col("toks")),
        langs.map(TextOps.langMarkers))).as("hits"))
    val retired = docs.select(col("id") +: langs.zipWithIndex.map {
      case (l, i) =>
        size(filter(col("toks"),
          t => t.isin(TextOps.langMarkers(l): _*))).as(s"h$i")
    }: _*)
    val n = native.collect().map(r => r.getLong(0) ->
      Option(r.getSeq[Int](1))).toMap
    val r = retired.filter(col("id") =!= 5).collect().map(r => r.getLong(0) ->
      langs.indices.map(i => r.getInt(i + 1))).toMap
    for (id <- 1L to 4L)
      assert(n(id).map(_.toSeq) === Some(r(id)), s"doc $id")
    assert(n(5L).isEmpty, "null array → null (mirrors the retired form)")
    // multiplicity: doc 1 has "the" twice → en count includes both
    val enIdx = langs.indexOf("en")
    assert(n(1L).get(enIdx) >= 2)
  }

  test("MarkerHits: null ELEMENT counts as no-hit, rest of array still counted") {
    val df = Seq(Tuple1(Seq("the", null, "of"))).toDF("toks")
    val out = df.select(GraftColumnBridge.column(MarkerHits(
      GraftColumnBridge.expression(col("toks")),
      Seq(TextOps.langMarkers("en")))).getItem(0)).head().getInt(0)
    assert(out === 2)
  }

  test("HashedBigramBuckets ≡ retired md5-HOF chain (sorted distinct + bias)") {
    val nBuckets = 64
    val data = Seq(
      (1L, Seq("alpha", "beta", "gamma", "beta", "alpha", "beta")),
      (2L, Seq("x", "y")),
      (3L, Seq("solo")),           // < 2 tokens → bias only
      (4L, Seq.empty[String]),     // empty → bias only
      (5L, Seq("héllo", "wörld", "héllo")) // multi-byte bigrams
    ).toDF("id", "toks")
    val native = data.select(col("id"),
      GraftColumnBridge.column(HashedBigramBuckets(
        GraftColumnBridge.expression(col("toks")), nBuckets)).as("js"))
    val retired = data.select(col("id"),
      concat(
        array_sort(array_distinct(transform(
          TextOps.shingles2(col("toks")),
          bg => (conv(substring(md5(bg), 1, 4), 16, 10).cast("long")
            % nBuckets).cast("int")))),
        array(lit(nBuckets))).as("js"))
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val r = retired.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for (id <- 1L to 5L) assert(n(id) === r(id), s"doc $id")
    assert(n(3L) === Seq(nBuckets) && n(4L) === Seq(nBuckets))
  }

  test("HashedBigramBuckets: null array → null, null element → null") {
    val df = Seq((1L, null: Seq[String]), (2L, Seq("a", null, "b")))
      .toDF("id", "toks")
    val out = df.select(col("id"),
      GraftColumnBridge.column(HashedBigramBuckets(
        GraftColumnBridge.expression(col("toks")), 8)).as("js"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L))
  }

  test("TrigramBuckets ≡ retired explode(transform(sequence)) + groupBy, incl. multi-byte") {
    val nBuckets = 512
    val data = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "aaaaaa"),        // heavy duplicate buckets → RLE counts > 1
      (3L, "ab"),            // < 3 chars → empty histogram
      (4L, "héllo wörld — naïve café") // multi-byte: é ö — ï é
    ).toDF("id", "t")
    val native = data.select(col("id"),
      explode(GraftColumnBridge.column(TrigramBuckets(
        GraftColumnBridge.expression(col("t")), nBuckets))).as("e"))
      .select(col("id"), col("e.b"), col("e.cnt"))
    // Equivalence domain is length >= 3 — the declared query path (h117's
    // nbLangId) filters `length(__t) >= 3` BEFORE this expression. Below 3
    // chars the retired SQL form is junk, not a reference: sequence(1, 0)
    // DESCENDS ([1,0]) and emits two bogus whole-string trigram rows, while
    // the native form correctly returns an empty histogram (asserted
    // separately below).
    val retired = data.filter(length(col("t")) >= 3).select(col("id"),
      explode(transform(sequence(lit(1), length(col("t")) - 2),
        i => (conv(substring(md5(col("t").substr(i, lit(3))), 1, 4),
          16, 10).cast("long") % nBuckets).cast("int"))).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("cnt"))
    val n = native.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val r = retired.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(n === r)
    assert(!n.keys.exists(_._1 == 3L), "doc 3 (< 3 chars) yields no rows")
    assert(n.exists { case ((id, _), cnt) => id == 2L && cnt > 1L },
      "duplicate trigrams RLE into cnt > 1")
  }

  test("DotWeights ≡ retired aggregate(element_at) fold; null array → null") {
    val w = Array(5L, -3L, 100L, 0L, 7L)
    val data = Seq(
      (1L, Seq(0, 2, 2, 4)),      // duplicates count with multiplicity
      (2L, Seq(1)),
      (3L, Seq.empty[Int]),
      (4L, null: Seq[Int])
    ).toDF("id", "js")
    val warr = typedlit(w.toIndexedSeq)
    val native = data.select(col("id"),
      GraftColumnBridge.column(DotWeights(
        GraftColumnBridge.expression(col("js")), w)).as("z"))
    val retired = data.select(col("id"),
      aggregate(col("js"), lit(0L),
        (acc, j) => acc + element_at(warr, j + 1)).as("z"))
    val n = native.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val r = retired.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(n === r)
    assert(n(1L) === Some(212L) && n(3L) === Some(0L) && n(4L).isEmpty)
  }

  test("withCleanKeep ≡ cleanCorpus.keep row-for-row (the h122 stage-1 gate)") {
    val data = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away with it all day long every single time again"),
      (2L, "el rápido zorro marrón salta sobre el perro perezoso"),
      (3L, "zz"),
      (4L, ""),
      (5L, ("the and of to in is it for on with " * 8).trim)
    ).toDF("doc_id", "text")
    val viaKeep = TextAnalysis.withCleanKeep(data, "text", "__k")
      .select(col("doc_id"), col("__k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaAudit = TextAnalysis.cleanCorpus(data, "doc_id", "text")
      .select(col("doc_id"), col("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaKeep === viaAudit)
    assert(viaAudit.values.exists(identity) && viaAudit.values.exists(!_),
      "fixture exercises both keep outcomes")
  }
}
