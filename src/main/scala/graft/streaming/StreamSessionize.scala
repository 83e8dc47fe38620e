package graft.streaming

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for stateful sessionization. */
case class SessEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

/** One finalized session — the SAME output contract as the batch
  * graft.extensions.Sessionize (h4_sessionize_batch), so a consumer can swap
  * batch and streaming paths without schema changes.
  */
case class SessionOut(user_id: Long, session_n: Long, n_events: Long,
    start_s: String, end_s: String, total_value: Double)

/** Per-user state: sessions already emitted (for continued numbering) and
  * the buffered not-yet-finalized events as (tsMicros, eventId, value).
  */
case class SessBuffer(nEmitted: Long, events: List[(Long, Long, Double)])

/** Gap-based sessionization over an unbounded stream via
  * `flatMapGroupsWithState` + event-time timeout.
  *
  * Correctness under out-of-order arrival: events are BUFFERED per user until
  * the watermark passes (max buffered ts + gap). At that point no future
  * event can extend or split the buffered span — any event still admissible
  * under the watermark has ts ≥ watermark ≥ maxTs + gap, i.e. it starts a new
  * session — so the buffer is sessionized exactly like the batch formulation
  * (sorted by (ts, event_id)) and emitted. Per-user state is the event buffer
  * of at most one watermark horizon — bounded, independent of stream length.
  */
object StreamSessionize {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  private def fmtMicros(us: Long): String =
    fmt.format(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  /** Split buffered events (sorted by ts, event_id) into gap-delimited
    * sessions, numbering from `from + 1`.
    */
  private[streaming] def sessionsOf(user: Long, buf: List[(Long, Long, Double)],
      gapSeconds: Long, from: Long): List[SessionOut] = {
    val sorted = buf.sortBy(e => (e._1, e._2))
    if (sorted.isEmpty) Nil
    else {
      val groups = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._1 - acc.head.head._1 > gapSeconds * 1000000L) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      groups.zipWithIndex.map { case (g, i) =>
        val total = BigDecimal(g.map(_._3).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        SessionOut(user, from + i + 1, g.size.toLong,
          fmtMicros(g.head._1), fmtMicros(g.last._1), total)
      }
    }
  }

  private def update(gapSeconds: Long)(user: Long, rows: Iterator[SessEvent],
      state: GroupState[SessBuffer]): Iterator[SessionOut] = {
    val prev = state.getOption.getOrElse(SessBuffer(0L, Nil))
    if (state.hasTimedOut) {
      // Watermark passed maxTs + gap: every buffered event is finalizable.
      val out = sessionsOf(user, prev.events, gapSeconds, prev.nEmitted)
      state.update(SessBuffer(prev.nEmitted + out.size, Nil))
      out.iterator
    } else {
      val incoming = rows.map(e => (e.ts.getTime * 1000L +
        (e.ts.getNanos / 1000L) % 1000L, e.event_id, e.value)).toList
      val buf = prev.events ++ incoming
      state.update(SessBuffer(prev.nEmitted, buf))
      if (buf.nonEmpty) {
        val maxTsMs = buf.map(_._1).max / 1000L
        state.setTimeoutTimestamp(maxTsMs + gapSeconds * 1000L)
      }
      Iterator.empty
    }
  }

  /** Sessionize a (possibly streaming) Dataset of events. The caller sets the
    * watermark (`withWatermark("ts", ...)`) before grouping; output mode is
    * Append (sessions are emitted exactly once, when finalized).
    */
  def sessions(events: Dataset[SessEvent], gapSeconds: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessBuffer]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapSeconds))
  }
}
