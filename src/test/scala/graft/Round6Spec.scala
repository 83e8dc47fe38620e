package graft

import org.apache.spark.sql.functions._

import graft.extensions.Dedup

/** Round-6 hardening tests: the bagDedup NULL-text totality contract and
  * pageRank's defensive input canonicalization (both ADVICE items).
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
}
