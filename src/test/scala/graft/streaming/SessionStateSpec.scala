package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the open-session aggregate algebra behind
  * StreamSessionize (addEvent is the subtle piece: inserts must join,
  * bridge, or open sessions exactly like batch sessionization over the
  * full sorted event set would).
  */
class SessionStateSpec extends AnyFunSuite {

  private val gap = 1800L
  private def us(s: Long): Long = s * 1000000L

  private def build(tss: Seq[Long]): List[OpenSession] =
    tss.foldLeft(List.empty[OpenSession])((acc, t) =>
      StreamSessionize.addEvent(acc, us(t), 100L, gap))

  test("in-order events within gap form one aggregate") {
    val open = build(Seq(0L, 100L, 1900L))
    assert(open === List(OpenSession(us(0), us(1900), 3L, 300L)))
  }

  test("gap exceeded opens a second session") {
    val open = build(Seq(0L, 1801L))
    assert(open.map(_.n) === List(1L, 1L))
  }

  test("gap exactly at limit stays one session (batch > semantics)") {
    val open = build(Seq(0L, 1800L))
    assert(open.map(_.n) === List(2L))
  }

  test("late interior event joins the covering session") {
    val open = build(Seq(0L, 2000L, 1000L)) // 0..1000..2000 chained by ≤gap
    assert(open === List(OpenSession(us(0), us(2000), 3L, 300L)))
  }

  test("late event bridges two open sessions into one") {
    val split = build(Seq(0L, 3000L)) // 3000-0 > gap → two sessions
    assert(split.size === 2)
    // 1500 is within the gap of both neighbours → all three merge
    val merged = StreamSessionize.addEvent(split, us(1500), 100L, gap)
    assert(merged === List(OpenSession(us(0), us(3000), 3L, 300L)))
  }

  test("late event between sessions but outside both gaps stays its own session") {
    val split = build(Seq(0L, 4000L))
    val merged = StreamSessionize.addEvent(split, us(2000), 100L, gap)
    assert(merged.map(_.n) === List(1L, 1L, 1L)) // 2000 is >gap from both
  }

  test("late event before all sessions can open a leading session") {
    val open = build(Seq(10000L, 5000L)) // 5000 then 10000: gap > 1800 apart
    assert(open.map(s => (s.minUs, s.n)) === List((us(5000), 1L), (us(10000), 1L)))
  }

  test("sub-second truncation matches batch unix_timestamp semantics") {
    // 1800.1 s apart raw, but floor-second diff is exactly 1800 → same session
    val a = us(1000) + 800000L
    val b = us(2800) + 900000L
    val open = StreamSessionize.addEvent(
      StreamSessionize.addEvent(Nil, a, 100L, gap), b, 100L, gap)
    assert(open.size === 1)
  }
}
