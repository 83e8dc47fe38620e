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
}
