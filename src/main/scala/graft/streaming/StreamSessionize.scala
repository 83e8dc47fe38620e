package graft.streaming

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneId

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

/** One open (not yet watermark-closed) session as a mergeable aggregate:
  * exact [minUs, maxUs] span, event count, and value sum — everything the
  * SessionOut contract needs; raw events are never retained.
  *
  * `sumCents` is the value total as EXACT scaled-long cents: each event value
  * is rounded to 2dp on ingest (the same double→DECIMAL(18,2) HALF_UP cast
  * `Det.exactSum` applies per row in the batch operator), then summed in
  * integer arithmetic — order-independent across merges and bit-identical to
  * the batch path (a raw double fold would be merge-order dependent and would
  * diverge from exactSum on >2dp inputs, e.g. 0.004+0.004).
  */
case class OpenSession(minUs: Long, maxUs: Long, n: Long, sumCents: Long)

/** Per-user state: number of sessions already emitted (numbering continues
  * across emissions) and the open-session aggregates, ascending by span.
  */
case class SessBuffer(nEmitted: Long, open: List[OpenSession])

/** Gap-based sessionization over an unbounded stream via
  * `flatMapGroupsWithState` + event-time timeout.
  *
  * State is NOT a buffer of raw events: session membership is a closure over
  * the pairwise gap relation, and adding an event can only extend or merge
  * sessions — never split one — so each open session compacts exactly to
  * (min, max, count, sum). Late events (admissible under the watermark)
  * either join/merge existing aggregates or open a new one. A session is
  * emitted once the watermark passes `max + gap` (no admissible future event
  * can join it, because sessions are gap-separated and the closure property
  * is prefix-monotone in time). Per-user state is therefore O(open
  * sessions) ≤ watermark-horizon / gap + 1 — bounded regardless of how long
  * a user stays active.
  *
  * Gap semantics match the batch operator exactly: the batch formulation
  * compares `unix_timestamp` values (second-TRUNCATED), so two events
  * 1800.1 s apart can still share a session; the merge test here truncates
  * epoch-micros to seconds the same way. Output timestamps are formatted in
  * the session time zone captured from the SparkSession at plan time (the
  * batch `date_format` uses the same conf).
  */
object StreamSessionize {

  private def fmtMicros(us: Long, zone: String): String =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(ZoneId.of(zone))
      .format(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  /** Batch-equivalent gap test: floor-to-second difference exceeds the gap. */
  private def gapExceeded(aUs: Long, bUs: Long, gapSeconds: Long): Boolean =
    (bUs / 1000000L) - (aUs / 1000000L) > gapSeconds

  /** Event value → exact cents, mirroring the per-row double→DECIMAL(18,2)
    * HALF_UP rounding inside Det.exactSum (scala.math.BigDecimal(double) is
    * the same DECIMAL128 construction Spark's Cast uses).
    */
  private[streaming] def toCents(value: Double): Long =
    BigDecimal(value).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .underlying.unscaledValue.longValueExact

  /** Fold one event timestamp into the ordered open-session list: join an
    * overlapping-or-within-gap neighbor (merging neighbors that the new
    * event bridges) or insert a fresh singleton.
    */
  private[streaming] def addEvent(open: List[OpenSession], tsUs: Long,
      valueCents: Long, gapSeconds: Long): List[OpenSession] = {
    val single = OpenSession(tsUs, tsUs, 1L, valueCents)
    val (before, after) = open.partition(_.minUs <= tsUs)
    // candidates to merge: the last session starting at/before ts, and the
    // first session starting after ts
    var merged = single
    var keepBefore = before
    var keepAfter = after
    before.lastOption.foreach { p =>
      if (tsUs <= p.maxUs || !gapExceeded(p.maxUs, tsUs, gapSeconds)) {
        merged = OpenSession(p.minUs, math.max(p.maxUs, tsUs), p.n + 1,
          p.sumCents + valueCents)
        keepBefore = before.init
      }
    }
    after.headOption.foreach { nx =>
      if (!gapExceeded(merged.maxUs, nx.minUs, gapSeconds)) {
        merged = OpenSession(merged.minUs, math.max(merged.maxUs, nx.maxUs),
          merged.n + nx.n, merged.sumCents + nx.sumCents)
        keepAfter = after.tail
      }
    }
    keepBefore ::: merged :: keepAfter
  }

  private def toOut(user: Long, s: OpenSession, num: Long, zone: String): SessionOut =
    SessionOut(user, num, s.n,
      fmtMicros(s.minUs, zone), fmtMicros(s.maxUs, zone),
      BigDecimal(s.sumCents, 2).toDouble) // exact cents → double, like exactSum's final cast

  private def update(gapSeconds: Long, zone: String, streaming: Boolean,
      counterTtlSeconds: Option[Long])(
      user: Long, rows: Iterator[SessEvent],
      state: GroupState[SessBuffer]): Iterator[SessionOut] = {
    val prev = state.getOption.getOrElse(SessBuffer(0L, Nil))
    var sawEvent = false
    val withNew = rows.foldLeft(prev.open) { (acc, e) =>
      sawEvent = true
      val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
      addEvent(acc, us, toCents(e.value), gapSeconds)
    }
    // a session is final once the watermark passes max + gap; closure is
    // prefix-monotone (sessions are gap-separated in time). On a batch
    // Dataset there is no watermark (and getCurrentWatermarkMs throws) —
    // every session is final because all data is present.
    val (closed, stillOpen) =
      if (!streaming) (withNew, Nil)
      else {
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        withNew.span(s => wmUs > 0 && gapExceeded(s.maxUs, wmUs, gapSeconds))
      }
    val out = closed.zipWithIndex.map { case (s, i) =>
      toOut(user, s, prev.nEmitted + i + 1, zone)
    }
    if (stillOpen.isEmpty && !streaming) {
      state.remove()
    } else if (streaming && stillOpen.isEmpty && counterTtlSeconds.isDefined &&
        state.hasTimedOut && !sawEvent && prev.open.isEmpty) {
      // TTL mode, and the eviction timeout fired on a counter-only row (no
      // events this call, nothing open before or after): evict the counter.
      // A user who returns AFTER the TTL restarts session_n at 1 — the
      // bounded-state trade this mode opts into.
      state.remove()
    } else {
      // Default mode: state persists (holding only the emission counter)
      // even when every session has closed, so a user who returns continues
      // session_n where they left off — state size is bounded by USER
      // CARDINALITY (one small row per user ever seen), not by stream
      // length or activity. With `counterTtlSeconds` set, that counter row
      // instead carries an eviction timeout (below).
      state.update(SessBuffer(prev.nEmitted + closed.size, stillOpen))
      // the earliest open session closes when floor(wm_s) > floor(max_s) +
      // gap, i.e. at wall-clock second (floor(max_s) + gap + 1) exactly —
      // computing that boundary (not max_ms + gap) keeps the timeout
      // strictly ahead of any watermark that has not yet closed the session
      if (streaming) stillOpen.headOption match {
        case Some(s) =>
          state.setTimeoutTimestamp((s.maxUs / 1000000L + gapSeconds + 1L) * 1000L)
        case None => counterTtlSeconds.foreach { ttl =>
          // schedule counter eviction at (last activity + gap + ttl); the
          // max(…, watermark) guard keeps the timestamp strictly ahead of
          // the current watermark (an EventTimeTimeout requirement — e.g.
          // a tiny TTL with a watermark already far past last activity)
          val lastSec = closed.lastOption.map(_.maxUs / 1000000L).getOrElse(0L)
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          state.setTimeoutTimestamp(
            (math.max(lastSec + gapSeconds + ttl, wmSec) + 1L) * 1000L)
        }
      }
    }
    out.iterator
  }

  /** Sessionize a streaming OR batch Dataset of events. Streaming callers
    * set the watermark (`withWatermark("ts", ...)`) before grouping; output
    * mode is Append (sessions are emitted exactly once, when finalized). On
    * a batch Dataset the watermark machinery is absent, so every session
    * finalizes immediately — the same code path the streaming side runs at
    * timeout, giving identical outputs to the batch Sessionize operator.
    *
    * `counterTtlSeconds` (streaming only; default off) bounds the per-user
    * counter state: once every session of a user has closed, the counter
    * row is evicted after `gap + ttl` seconds of event-time inactivity
    * instead of persisting forever. Outputs are IDENTICAL for any user
    * whose inactivity gaps stay within the TTL horizon (eviction only ever
    * fires `gap + ttl` past last activity, strictly after session close);
    * a user returning after eviction restarts session_n at 1 — choose the
    * default when session_n continuity matters more than bounded state
    * (the measured cost is ONE small row per user ever seen).
    */
  def sessions(events: Dataset[SessEvent], gapSeconds: Long,
      counterTtlSeconds: Option[Long] = None): Dataset[SessionOut] = {
    val zone = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessBuffer]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapSeconds, zone, events.isStreaming, counterTtlSeconds))
  }
}
