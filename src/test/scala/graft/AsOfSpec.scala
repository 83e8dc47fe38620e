package graft

import java.sql.Timestamp

import graft.extensions.AsOf

/** As-of join edge semantics: equal-ts inclusion, tie-breaking, no-match
  * nulls, key isolation.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: at-or-before, ties to larger id, null when none, per key") {
    val left = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00"), "l1"),
      (1L, 101L, ts("2026-01-01 10:05:00"), "l2"),
      (2L, 200L, ts("2026-01-01 09:00:00"), "l3") // user 2: no clicks at all
    ).toDF("user_id", "event_id", "ts", "tag")
    val right = Seq(
      (1L, 50L, ts("2026-01-01 10:00:00"), 1.0), // equal ts: visible to 100
      (1L, 51L, ts("2026-01-01 10:00:00"), 2.0), // tie → larger id 51 wins
      (1L, 52L, ts("2026-01-01 10:04:00"), 3.0),
      (3L, 60L, ts("2026-01-01 08:00:00"), 4.0)  // other key: never matches
    ).toDF("user_id", "event_id", "ts", "v")
    val out = AsOf.asOfJoin(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id", "v"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble))).toMap
    assert(out(100L) === ((Some(51L), Some(2.0)))) // equal-ts tie → id 51
    assert(out(101L) === ((Some(52L), Some(3.0)))) // strictly-before latest
    assert(out(200L) === ((None, None)))           // no right rows for key
  }

  test("asOfJoinForward: at-or-after nearest, ties to larger id, null when none") {
    val left = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00"), "l1"), // equal-ts right visible
      (1L, 101L, ts("2026-01-01 10:06:00"), "l2"), // picks NEXT, not earlier
      (2L, 200L, ts("2026-01-01 09:00:00"), "l3")  // no purchases for key
    ).toDF("user_id", "event_id", "ts", "tag")
    val right = Seq(
      (1L, 50L, ts("2026-01-01 10:00:00"), 1.0), // equal ts: visible to 100
      (1L, 51L, ts("2026-01-01 10:00:00"), 2.0), // tie → larger id 51 wins
      (1L, 52L, ts("2026-01-01 10:10:00"), 3.0), // nearest AFTER 101
      (1L, 53L, ts("2026-01-01 11:00:00"), 4.0), // farther — must lose to 52
      (3L, 60L, ts("2026-01-01 12:00:00"), 5.0)  // other key: never matches
    ).toDF("user_id", "event_id", "ts", "v")
    val out = AsOf.asOfJoinForward(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "v"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("next_event_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("next_v")).map(_.toDouble))).toMap
    assert(out(100L) === ((Some(51L), Some(2.0)))) // equal-ts tie → id 51
    assert(out(101L) === ((Some(52L), Some(3.0)))) // nearest following
    assert(out(200L) === ((None, None)))           // no right rows for key
  }

  test("pseudonymize: deterministic, salt-sensitive, join-preserving") {
    import graft.extensions.Scrub
    import org.apache.spark.sql.functions._
    val ids = spark.range(0, 500).select($"id")
    val t1 = ids.select(Scrub.pseudonymize($"id", "s1").as("t")).collect().map(_.getString(0))
    val t2 = ids.select(Scrub.pseudonymize($"id", "s1").as("t")).collect().map(_.getString(0))
    assert(t1.toSeq === t2.toSeq, "same salt must be deterministic")
    assert(t1.distinct.length === 500, "distinct inputs stay distinct")
    val other = ids.select(Scrub.pseudonymize($"id", "s2").as("t")).collect().map(_.getString(0))
    assert(t1.intersect(other).isEmpty, "different salt must remap every token")
    // join preservation: tokenized FK join counts == raw join counts
    val a = ids.select(Scrub.pseudonymize($"id", "s1").as("t"))
    val b = spark.range(0, 1000).select(Scrub.pseudonymize($"id" % 500, "s1").as("t"))
    assert(a.join(b, "t").count() === 1000)
  }
}
