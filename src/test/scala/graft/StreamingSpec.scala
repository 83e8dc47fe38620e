package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.extensions.Sessionize
import graft.streaming.{SessEvent, StreamDedup, StreamSessionize, StreamWindows}

/** Structured Streaming suites: MemoryStream-driven micro-batches, asserting
  * (a) watermark/window semantics and (b) batch↔stream output-contract
  * equivalence (the same transform body runs on spark.read and
  * spark.readStream; the stateful sessionizer must reproduce the batch
  * formulation exactly once sessions finalize).
  */
class StreamingSpec extends SparkSpec {

  private def ts(h: Int, m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:$s%02d")

  test("tumbling windows: event-time aggregation, append on window close") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF.toDF("ts", "event_type", "value")
    val q = StreamWindows.tumblingTypeStats(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumble").outputMode("append").start()
    try {
      mem.addData((ts(10, 0), "click", 1.5), (ts(10, 1), "click", 2.0),
        (ts(10, 6), "view", 3.25))
      q.processAllAvailable()
      // nothing emitted yet: windows still open under the watermark
      assert(spark.table("tumble").count() === 0)
      mem.addData((ts(11, 0), "late_pusher", 0.0)) // watermark → 10:50
      q.processAllAvailable()
      val rows = spark.table("tumble")
        .select("w_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows === Set(
        (ts(10, 0), "click", 2L, 3.5),
        (ts(10, 5), "view", 1L, 3.25)))
    } finally q.stop()
  }

  test("sliding windows: each event lands in width/slide overlapping windows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF.toDF("ts", "user_id", "value")
    val q = StreamWindows.slidingUserActivity(df, "5 minutes", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("slide").outputMode("append").start()
    try {
      mem.addData((ts(10, 7), 1L, 1.0))
      q.processAllAvailable()
      mem.addData((ts(11, 0), 99L, 0.0)) // push watermark past both windows
      q.processAllAvailable()
      val rows = spark.table("slide").filter(col("user_id") === 1)
        .select("w_start").collect().map(_.getTimestamp(0)).toSet
      assert(rows === Set(ts(10, 0), ts(10, 5)))
    } finally q.stop()
  }

  test("session windows: gap-merged per user, matches batch run of same transform") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val data = Seq(
      (ts(10, 0), 1L, 1.0), (ts(10, 10), 1L, 2.0), // one session (gap 30m)
      (ts(11, 30), 1L, 4.0),                       // second session
      (ts(10, 5), 2L, 8.0))
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF.toDF("ts", "user_id", "value")
    val q = StreamWindows.sessionWindowStats(df, "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      mem.addData((ts(14, 0), 99L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess").filter(col("user_id") =!= 99)
        .select("user_id", "s_start", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // identical transform, batch path (watermark is a no-op on batch)
      val batch = StreamWindows.sessionWindowStats(
        data.toDF("ts", "user_id", "value"), "30 minutes", "30 minutes")
        .select("user_id", "s_start", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed === batch)
      assert(streamed.map(_._1) === Set(1L, 2L))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops re-delivered events") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF.toDF("ts", "event_id", "value")
    val q = StreamWindows.dedupWithinWatermark(df, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      mem.addData((ts(10, 0), 1L, 1.0), (ts(10, 1), 2L, 2.0))
      q.processAllAvailable()
      mem.addData((ts(10, 0), 1L, 1.0), (ts(10, 2), 3L, 3.0)) // 1 re-delivered
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 3)
    } finally q.stop()
  }

  test("stateful sessionization: late event bridges two open sessions (out-of-order merge)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessEvent]
    // watermark delay 2h admits the late bridging event
    val ds = mem.toDS.withWatermark("ts", "2 hours")
    val q = StreamSessionize.sessions(ds, 1800L)
      .writeStream.format("memory").queryName("bridge").outputMode("append").start()
    try {
      // batch 1: 10:00 and 11:00 — gap 60m > 30m → provisionally two sessions
      mem.addData(SessEvent(1L, 1L, ts(10, 0), 1.0), SessEvent(1L, 2L, ts(11, 0), 2.0))
      q.processAllAvailable()
      // batch 2: LATE event at 10:30 sharp — exactly the 30-min gap from both
      // neighbours (gap is exceeded only when strictly greater) → bridges them
      mem.addData(SessEvent(1L, 3L, ts(10, 30), 4.0))
      q.processAllAvailable()
      // advance watermark far past and trigger the timeout batch
      mem.addData(SessEvent(99L, 90L, ts(20, 0), 0.0))
      q.processAllAvailable()
      mem.addData(SessEvent(99L, 91L, ts(20, 1), 0.0))
      q.processAllAvailable()
      val got = spark.table("bridge").filter(col("user_id") === 1)
        .select("session_n", "n_events", "start_s", "end_s", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getDouble(4))).toSeq
      assert(got === Seq((1L, 3L, "2026-01-01 10:00:00", "2026-01-01 11:00:00", 7.0)))
    } finally q.stop()
  }

  test("sessionizer counter TTL: in-horizon output unchanged, counter evicted after TTL") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // gap 30 min, counter TTL 2 h: a user returning within gap+TTL of last
    // activity keeps session_n continuity (identical to the default mode);
    // after gap+TTL of event-time inactivity the counter row is evicted and
    // a later return restarts session_n at 1. Run the SAME feed through a
    // TTL query and a default-mode control to pin both halves.
    def run(name: String, ttl: Option[Long]): Seq[(Long, Long, String)] = {
      val mem = MemoryStream[SessEvent]
      val ds = mem.toDS.withWatermark("ts", "10 minutes")
      val q = StreamSessionize.sessions(ds, 1800L, ttl)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        def feed(es: SessEvent*): Unit = { mem.addData(es: _*); q.processAllAvailable() }
        feed(SessEvent(1L, 1L, ts(10, 0), 1.0))
        feed(SessEvent(99L, 90L, ts(11, 0), 0.0))   // wm → 10:50 after this batch
        feed(SessEvent(99L, 91L, ts(11, 1), 0.0))   // closes u1 session 1
        feed(SessEvent(1L, 2L, ts(11, 30), 2.0))    // IN horizon (90 min < gap+TTL)
        feed(SessEvent(99L, 92L, ts(12, 30), 0.0))  // wm → 12:20
        feed(SessEvent(99L, 93L, ts(12, 31), 0.0))  // closes u1 session 2
        feed(SessEvent(99L, 94L, ts(15, 0), 0.0))   // wm → 14:50 > 11:30+30m+2h
        feed(SessEvent(99L, 95L, ts(15, 1), 0.0))   // TTL timeout fires → evict
        feed(SessEvent(1L, 3L, ts(16, 0), 3.0))     // returns AFTER eviction
        feed(SessEvent(99L, 96L, ts(17, 0), 0.0))   // wm → 16:50
        feed(SessEvent(99L, 97L, ts(17, 1), 0.0))   // closes u1 session 3
        spark.table(name).filter(col("user_id") === 1)
          .select("session_n", "n_events", "start_s")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
          .sortBy(_._3)
      } finally q.stop()
    }
    val ttlOut = run("sessttl", Some(7200L))
    val defOut = run("sessdef", None)
    // in-horizon sessions identical between modes (continuity preserved)
    assert(ttlOut.take(2) === defOut.take(2))
    assert(ttlOut.take(2).map(_._1) === Seq(1L, 2L))
    // post-eviction: TTL mode restarts numbering (the counter row is GONE);
    // default mode continues — the one divergence the mode buys bounded state
    assert(ttlOut(2) === ((1L, 1L, "2026-01-01 16:00:00")))
    assert(defOut(2) === ((3L, 1L, "2026-01-01 16:00:00")))
  }

  test("stateful sessionization: sub-second gap semantics match batch (second-truncated)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // 1800.1 s apart in raw time, but unix_timestamp (second-truncated) diff
    // is exactly 1800 → the batch operator keeps ONE session; the streaming
    // path must agree
    val e1 = SessEvent(1L, 1L, Timestamp.valueOf("2026-01-01 10:00:00.8"), 1.0)
    val e2 = SessEvent(1L, 2L, Timestamp.valueOf("2026-01-01 10:30:00.9"), 2.0)
    val mem = MemoryStream[SessEvent]
    val ds = mem.toDS.withWatermark("ts", "10 seconds")
    val q = StreamSessionize.sessions(ds, 1800L)
      .writeStream.format("memory").queryName("subsec").outputMode("append").start()
    try {
      mem.addData(e1, e2)
      q.processAllAvailable()
      mem.addData(SessEvent(99L, 90L, ts(14, 0), 0.0))
      q.processAllAvailable()
      mem.addData(SessEvent(99L, 91L, ts(14, 1), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("subsec").filter(col("user_id") === 1)
        .select("session_n", "n_events", "start_s", "end_s", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getDouble(4))).toSet
      val batch = Sessionize.sessions(Seq(e1, e2).toDF(), "user_id", "ts", 1800L)
        .select("session_n", "n_events", "start_s", "end_s", "total_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getString(3), r.getDouble(4))).toSet
      assert(streamed === batch)
      assert(streamed.map(_._2) === Set(2L)) // one session holding both events
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to in-window clicks") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamJoins.clickPurchaseAttribution(
      clicks.toDF.toDF("user_id", "event_id", "ts"),
      purchases.toDF.toDF("user_id", "event_id", "ts"),
      watermarkDelay = "10 minutes", attributionWindow = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 100L, ts(10, 0)), (1L, 101L, ts(10, 20)), (2L, 200L, ts(10, 0)))
      purchases.addData((1L, 500L, ts(10, 25)), (2L, 600L, ts(11, 30)))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("user_id", "c_event_id", "p_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // purchase 500 at 10:25 attributes to clicks 100 (25m before) and
      // 101 (5m before); purchase 600 at 11:30 is 90m after click 200 → none
      assert(rows === Set((1L, 100L, 500L), (1L, 101L, 500L)))
      // batch path of the identical transform agrees
      val batch = graft.streaming.StreamJoins.clickPurchaseAttribution(
        Seq((1L, 100L, ts(10, 0)), (1L, 101L, ts(10, 20)), (2L, 200L, ts(10, 0)))
          .toDF("user_id", "event_id", "ts"),
        Seq((1L, 500L, ts(10, 25)), (2L, 600L, ts(11, 30)))
          .toDF("user_id", "event_id", "ts"))
        .select("user_id", "c_event_id", "p_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch === rows)
    } finally q.stop()
  }

  test("stream-static enrichment: stateless dim join, matches batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val dim = Seq((1L, "BUILDING", 0.0), (2L, "MACHINERY", 0.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val enriched = graft.streaming.StreamJoins.enrichWithCustomer(
      mem.toDF.toDF("event_id", "user_id", "ts", "event_type", "value"), dim)
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      val batch1 = Seq((100L, 1L, ts(10, 0), "click", 1.5),
        (101L, 2L, ts(10, 5), "view", 2.5),
        (102L, 9L, ts(10, 9), "click", 9.0)) // user 9: no dim row → dropped
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // second micro-batch joins against the SAME static snapshot
      mem.addData((103L, 1L, ts(11, 0), "purchase", 4.0))
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .select("event_id", "c_mktsegment")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((100L, "BUILDING"), (101L, "MACHINERY"),
        (103L, "BUILDING")))
      // the identical function on a batch frame agrees
      val batch = graft.streaming.StreamJoins.enrichWithCustomer(
        (batch1 :+ ((103L, 1L, ts(11, 0), "purchase", 4.0)))
          .toDF("event_id", "user_id", "ts", "event_type", "value"), dim)
        .select("event_id", "c_mktsegment")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(batch === rows)
    } finally q.stop()
  }

  test("stateful sessionizer runs on a BATCH Dataset and matches batch Sessionize") {
    import spark.implicits._
    val events = Seq(
      SessEvent(1L, 10L, ts(10, 0), 1.25),
      SessEvent(1L, 11L, ts(10, 20), 2.0),
      SessEvent(1L, 12L, ts(11, 30), 4.0),
      SessEvent(2L, 20L, ts(10, 5), 8.5))
    val viaState = StreamSessionize.sessions(events.toDS(), 1800L)
      .collect().map(s => (s.user_id, s.session_n, s.n_events, s.start_s,
        s.end_s, s.total_value)).toSet
    val viaBatch = Sessionize.sessions(events.toDF(), "user_id", "ts", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getDouble(5))).toSet
    assert(viaState === viaBatch)
    assert(viaState.size === 3)
  }

  test("stateful gap sessionization matches the batch Sessionize contract") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      SessEvent(1L, 10L, ts(10, 0), 1.25),
      SessEvent(1L, 11L, ts(10, 20), 2.0),  // gap 20m ≤ 30m: same session
      SessEvent(1L, 12L, ts(11, 30), 4.0),  // gap 70m: new session
      SessEvent(2L, 20L, ts(10, 5), 8.5))
    val mem = MemoryStream[SessEvent]
    val ds = mem.toDS.withWatermark("ts", "10 seconds")
    val q = StreamSessionize.sessions(ds, 1800L)
      .writeStream.format("memory").queryName("fmgws").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark well past (max ts + gap), then one more batch
      // so the timeout-triggered emission runs
      mem.addData(SessEvent(99L, 90L, ts(15, 0), 0.0))
      q.processAllAvailable()
      mem.addData(SessEvent(99L, 91L, ts(15, 1), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("fmgws").filter(col("user_id") =!= 99)
        .select("user_id", "session_n", "n_events", "start_s", "end_s", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getString(4), r.getDouble(5))).toSet
      val batch = Sessionize.sessions(
        events.toDF(), "user_id", "ts", 1800L)
        .select("user_id", "session_n", "n_events", "start_s", "end_s", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getString(4), r.getDouble(5))).toSet
      assert(streamed === batch)
      assert(streamed.size === 3)
    } finally q.stop()
  }

  test("keyed stream throttle: seen-key state EVICTS once the watermark passes the minute") {
    // regression for the unbounded-state form: with the watermark on raw ts
    // (not the keyed minute column) streaming dedup never expired state —
    // measured 6k→60k rows over 10 batches (ScaleBench stream10). The fixed
    // form must drop a batch of old keys once event time sweeps past
    // minute + horizon.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val df = mem.toDF.toDF("ts", "event_id", "user_id", "event_type", "value")
    val q = StreamDedup.firstPerKeyStream(df) // 10-minute horizon
      .writeStream.format("memory").queryName("evict").outputMode("append").start()
    try {
      mem.addData((1 to 50).map(i =>
        (ts(10, 0, i % 60), i.toLong, i.toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum === 50L)
      // jump event time an hour ahead: watermark reaches 10:50 and the
      // 10:00 keys must leave the store on the following micro-batch
      mem.addData((ts(11, 0), 999L, 999L, "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts(11, 1), 1000L, 1000L, "click", 1.0))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after === 2L, s"stale dedup keys not evicted: $after state rows")
    } finally q.stop()
  }

  test("keyed stream throttle: first per (user,type,minute) matches batch twin under ordered arrival") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val df = mem.toDF.toDF("ts", "event_id", "user_id", "event_type", "value")
    val q = StreamDedup.firstPerKeyStream(df)
      .writeStream.format("memory").queryName("throttle").outputMode("append").start()
    // (ts, event_id)-ordered arrival — the regime where the stream's
    // first-arrival keep coincides with the batch min-(ts, event_id) keep
    val data = Seq(
      (ts(10, 0, 5), 1L, 1L, "click", 1.0),
      (ts(10, 0, 30), 2L, 1L, "click", 2.0), // same key+minute: throttled
      (ts(10, 0, 40), 3L, 2L, "click", 3.0),
      (ts(10, 1, 0), 4L, 1L, "click", 4.0), // next minute: kept
      (ts(10, 1, 10), 5L, 1L, "view", 5.0))
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("user_id", "event_type", "minute", "event_id", "value")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val streamed = key(spark.table("throttle"))
      val batch = key(StreamDedup.firstPerKeyBatch(
        data.toDF("ts", "event_id", "user_id", "event_type", "value")))
      assert(streamed === batch)
      assert(streamed.size === 4) // event 2 throttled, all other keys unique
    } finally q.stop()
  }

  test("idempotent epoch sink: batch re-delivery replaces its partition, never duplicates") {
    import spark.implicits._
    val path = s"target/scratch/idem_sink_${ProcessHandle.current().pid()}"
    def rows(xs: (Long, String)*) = xs.toSeq.toDF("id", "v")
    graft.streaming.IdempotentSink.writeEpoch(rows(1L -> "a", 2L -> "b", 3L -> "c"), 0L, path)
    assert(spark.read.parquet(path).count() === 3)
    // at-least-once re-delivery of epoch 0 (e.g. recovery replay): REPLACES
    graft.streaming.IdempotentSink.writeEpoch(rows(1L -> "a", 2L -> "b", 3L -> "c"), 0L, path)
    assert(spark.read.parquet(path).count() === 3)
    // a genuinely new epoch appends its own partition
    graft.streaming.IdempotentSink.writeEpoch(rows(4L -> "d", 5L -> "e"), 1L, path)
    val all = spark.read.parquet(path)
    assert(all.count() === 5)
    // cast explicitly: partition-type inference may be off on the shared
    // session (Lakehouse.configure pins partition columns to string)
    assert(all.select($"epoch".cast("int")).distinct().as[Int].collect().toSet === Set(0, 1))
    // re-delivered epoch with corrected content converges to the re-delivery
    graft.streaming.IdempotentSink.writeEpoch(rows(4L -> "d2"), 1L, path)
    val after = spark.read.parquet(path)
    assert(after.count() === 4)
    assert(after.filter($"epoch".cast("int") === 1)
      .select("v").as[String].collect().toSeq === Seq("d2"))
  }

  test("incremental dedup composes with foreachBatch: streamed batches admit only non-dups of the accumulated corpus") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val path = s"target/scratch/incr_corpus_${ProcessHandle.current().pid()}"
    // seed corpus in epoch 0; each micro-batch then dedups against the
    // corpus-so-far and appends ONLY its admitted docs (epoch-partitioned,
    // so at-least-once re-delivery of a batch replaces instead of
    // double-admitting — the exactly-once story and the dedup story compose)
    val seed = Seq((2L, "a b c a b c"),
      (4L, "completely unrelated corpus document text")).toDF("doc_id", "text")
    graft.streaming.IdempotentSink.writeEpoch(seed, 0L, path)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val existing = spark.read.parquet(path).select("doc_id", "text")
        val admitted = graft.extensions.Dedup
          .incrementalDedup(existing, df, "doc_id", "text", minJaccard = 0.5)
        graft.streaming.IdempotentSink.writeEpoch(
          df.join(admitted, "doc_id"), id + 1L, path)
      }
      .start()
    try {
      mem.addData(
        1L -> "a b c a b c",       // exact dup of seed doc 2 → rejected
        3L -> "a b c a b c a",     // same shingle set as seed doc 2 → near-dup, rejected
        5L -> "totally different content here now") // fresh → admitted
      q.processAllAvailable()
      mem.addData(
        7L -> "totally different content here now", // dup of doc 5, admitted LAST epoch → rejected
        9L -> "x y z x y z")                        // fresh → admitted
      q.processAllAvailable()
      val corpus = spark.read.parquet(path)
        .select("doc_id").as[Long].collect().toSet
      assert(corpus === Set(2L, 4L, 5L, 9L))
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks equals the batch join") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // purchase attributed to a click by the same user within the next hour
    // — the streaming form of h36's attribution join. Both sides carry
    // watermarks and the join condition bounds event-time distance, so
    // state for rows older than watermark+1h is dropped (bounded state at
    // scale); append mode emits each match exactly once.
    def joinOf(c: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      c.join(b, $"u" === $"u2" && $"buy_ts" >= $"click_ts" &&
        $"buy_ts" <= $"click_ts" + expr("interval 1 hour"))
        .select($"u", $"click_ts", $"buy_ts")
    val clicks = MemoryStream[(Long, Long)]
    val buys = MemoryStream[(Long, Long)]
    def cdf(df: org.apache.spark.sql.DataFrame) = df.toDF("u", "cs")
      .select($"u", timestamp_seconds($"cs").as("click_ts"))
    def bdf(df: org.apache.spark.sql.DataFrame) = df.toDF("u2", "bs")
      .select($"u2", timestamp_seconds($"bs").as("buy_ts"))
    val q = joinOf(
        cdf(clicks.toDF).withWatermark("click_ts", "10 minutes"),
        bdf(buys.toDF).withWatermark("buy_ts", "10 minutes"))
      .writeStream.format("memory").queryName("ssj").outputMode("append")
      .start()
    // batch-2 buy (2,1300) matches the batch-1 click (2,200) — the buy
    // watermark after batch 1 is 1600-600=1000s, so the click's join
    // window [200, 3800] is still live and the buy itself is not late
    val cData = Seq((1L, 100L), (1L, 5000L), (2L, 200L), (3L, 10000L))
    val bData = Seq((1L, 1600L), (2L, 150L), (2L, 1300L), (3L, 10000L),
      (1L, 99999L))
    try {
      clicks.addData(cData.take(3)); buys.addData(bData.take(2))
      q.processAllAvailable()
      clicks.addData(cData.drop(3)); buys.addData(bData.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssj").as[(Long, Timestamp, Timestamp)]
      .collect().toSet
    val want = joinOf(cdf(cData.toDF), bdf(bData.toDF))
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    assert(got === want && want.size === 3)
  }

  test("streaming CDC: per-batch scd2Merge through foreachBatch equals the two-step batch merge") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.extensions.Cdc
    val path = s"target/scratch/scd2_stream_${ProcessHandle.current().pid()}"
    val attrs = Seq("name", "v")
    val init = Cdc.scd2Init(
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "name", "v"), "2026-01-01")
    graft.streaming.IdempotentSink.writeEpoch(init, 0L, path)
    // micro-batch effective dates keyed by epoch — deterministic per batch
    val eff = Map(1L -> "2026-06-01", 2L -> "2026-09-01")
    val mem = MemoryStream[(Long, String, Int)]
    val q = mem.toDF.toDF("k", "name", "v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val dimNow = spark.read.parquet(path)
          .where($"epoch".cast("long") === id) // each epoch holds FULL state
          .drop("epoch")
        // each epoch rewrites the FULL merged state under its epoch id —
        // at-least-once re-delivery replaces, never double-merges
        graft.streaming.IdempotentSink.writeEpoch(
          Cdc.scd2Merge(dimNow, df, "k", attrs, eff(id + 1L)), id + 1L, path)
      }
      .start()
    try {
      mem.addData((1L, "a", 11), (3L, "c", 30))  // change k=1, insert k=3
      q.processAllAvailable()
      mem.addData((1L, "a", 12), (2L, "b", 20))  // re-change k=1, no-op k=2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(path)
      .where($"epoch".cast("long") === 2L).drop("epoch")
    val upd1 = Seq((1L, "a", 11), (3L, "c", 30)).toDF("k", "name", "v")
    val upd2 = Seq((1L, "a", 12), (2L, "b", 20)).toDF("k", "name", "v")
    val batch = Cdc.scd2Merge(
      Cdc.scd2Merge(init, upd1, "k", attrs, "2026-06-01"),
      upd2, "k", attrs, "2026-09-01")
    assert(streamed.collect().toSet === batch.collect().toSet)
    // and k=1 carries the full three-version history, only the last open
    val h = streamed.filter($"k" === 1L).orderBy("valid_from")
      .select("v", "is_current").as[(Int, Boolean)].collect()
    assert(h.toSeq === Seq((10, false), (11, false), (12, true)))
  }

  test("idempotent epoch sink drives from a real foreachBatch stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val path = s"target/scratch/idem_stream_${ProcessHandle.current().pid()}"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("id", "v").writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.streaming.IdempotentSink.writeEpoch(df, id, path))
      .start()
    try {
      mem.addData(1L -> "a", 2L -> "b")
      q.processAllAvailable()
      mem.addData(3L -> "c")
      q.processAllAvailable()
      val out = spark.read.parquet(path)
      assert(out.count() === 3)
      assert(out.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
      assert(out.select("epoch").distinct().count() >= 2)
    } finally q.stop()
  }

  test("multimodal passes run unchanged over a stream of binary payloads") {
    // the media operators are stateless iterator-mapPartitions passes, so
    // they must compose with readStream exactly as with batch — the shape a
    // production pipeline uses to decode payloads on arrival. WAV fixture
    // bytes stream through extractMeta(WavCodec) + audioStats across two
    // micro-batches; batch replay over the same rows must agree row-for-row.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.extensions.{MediaRow, Multimodal => M}
    def clip(id: Long): MediaRow = {
      val n = (20 + id % 5).toInt
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(1).putInt(8000)
      bb.putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
      (0 until n).foreach(i => bb.putShort(((id * 91 + i * 7) % 65536 - 32768).toShort))
      MediaRow(id, "audio", bb.array())
    }
    val mem = MemoryStream[MediaRow]
    val q = M.audioStats(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("mediastats").outputMode("append").start()
    try {
      mem.addData(clip(1), clip(2))
      q.processAllAvailable()
      assert(spark.table("mediastats").count() === 2)
      mem.addData(clip(3))
      q.processAllAvailable()
      val streamed = spark.table("mediastats")
        .orderBy("media_id").collect().map(_.toString).toSeq
      val batch = M.audioStats(
          spark.createDataset(Seq(clip(1), clip(2), clip(3)))(
            org.apache.spark.sql.Encoders.product[MediaRow])).toDF()
        .orderBy("media_id").collect().map(_.toString).toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming ANN ingest: epochs land exactly-once, probes == batch twin, compaction folds in") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.extensions.Similarity
    import graft.streaming.StreamAnnIngest
    val embs = Tables.embeddings(spark, sf)
    val base = embs.filter(col("vec_id") < 300)
    val streamed = embs.filter(col("vec_id") >= 300 && col("vec_id") < 500)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_annstream_pid$pid")
    val (ctB, atB) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_annbatch_pid$pid")
    val deltaPath = s"target/scratch/ann_delta_$pid"
    def batchDf(xs: Seq[(Long, Array[Float])]) =
      xs.toDF("vec_id", "embedding")
    try {
      // serving before the FIRST epoch lands: the missing delta dir reads
      // as empty — probes equal the base-only index path
      val qs0 = embs.filter(col("vec_id") < 8)
      def baseOnly() = Similarity.ivfTopKFromIndex(spark, ct, at, qs0,
        "vec_id", "embedding", 5).collect().map(_.toString).sorted.toSeq
      def withDelta() = Similarity.ivfTopKFromIndexWithDelta(spark, ct, at,
        deltaPath, qs0, "vec_id", "embedding", 5)
        .collect().map(_.toString).sorted.toSeq
      assert(withDelta() === baseOnly())
      // an EMPTY first micro-batch (normal on recovery / no-data triggers)
      // writes a footerless dir — the explicit-schema read must still
      // serve, where schema inference would throw
      StreamAnnIngest.ingestEpoch(batchDf(Nil), 0L, "vec_id", "embedding",
        ct, deltaPath)
      assert(withDelta() === baseOnly())
      val mem = MemoryStream[(Long, Array[Float])]
      val q = mem.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamAnnIngest.ingestEpoch(df, id, "vec_id", "embedding", ct, deltaPath))
        .start()
      try {
        mem.addData(streamed.take(100): _*); q.processAllAvailable()
        mem.addData(streamed.drop(100): _*); q.processAllAvailable()
      } finally q.stop()
      // batch twin: the SAME two batches appended directly to a second
      // copy of the base index — frozen-centroid assignment is per-row
      // deterministic, so probe results must be identical
      Similarity.appendToIvfIndex(batchDf(streamed.take(100)),
        "vec_id", "embedding", ctB, atB)
      Similarity.appendToIvfIndex(batchDf(streamed.drop(100)),
        "vec_id", "embedding", ctB, atB)
      val qs = embs.filter(col("vec_id") < 8)
      def res(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val batchRes = res(Similarity.ivfTopKFromIndex(spark, ctB, atB, qs,
        "vec_id", "embedding", 5))
      val streamRes = res(Similarity.ivfTopKFromIndexWithDelta(spark, ct, at,
        deltaPath, qs, "vec_id", "embedding", 5))
      assert(streamRes === batchRes)
      // at-least-once re-delivery of epoch 0: the epoch partition is
      // REPLACED, not appended — content and probes unchanged
      StreamAnnIngest.ingestEpoch(batchDf(streamed.take(100)), 0L,
        "vec_id", "embedding", ct, deltaPath)
      assert(spark.read.parquet(deltaPath).count() === 200)
      assert(res(Similarity.ivfTopKFromIndexWithDelta(spark, ct, at,
        deltaPath, qs, "vec_id", "embedding", 5)) === batchRes)
      // compaction: fold the delta into the bucketed base AND retire the
      // dir (part of the operation — an unretired delta would double-count
      // every folded vector in the union serving path) — probes over the
      // base alone now match, the delta-aware path serves through the
      // missing dir, and the table content equals the batch twin's
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(!new java.io.File(deltaPath).exists(),
        "compactDelta must retire the delta directory it folded")
      assert(res(Similarity.ivfTopKFromIndex(spark, ct, at, qs,
        "vec_id", "embedding", 5)) === batchRes)
      assert(res(Similarity.ivfTopKFromIndexWithDelta(spark, ct, at,
        deltaPath, qs, "vec_id", "embedding", 5)) === batchRes)
      val cont = spark.table(at).select("neighbor_id", "cid")
        .as[(Long, Long)].collect().toSet
      val contB = spark.table(atB).select("neighbor_id", "cid")
        .as[(Long, Long)].collect().toSet
      assert(cont === contB)
      assert(spark.table(at).count() === spark.table(atB).count())
    } finally {
      for (t <- Seq(ct, at, ctB, atB)) spark.sql(s"DROP TABLE IF EXISTS $t")
      // compactDelta retires the dir on the happy path; clean up anyway so
      // an assertion failure above cannot poison a same-JVM re-run
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("compaction crash-replay: append committed + delete crashed, re-running compactDelta is the recovery") {
    import graft.extensions.Similarity
    import graft.streaming.StreamAnnIngest
    val embs = Tables.embeddings(spark, sf)
    val base = embs.filter(col("vec_id") < 300)
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_anncrash_pid$pid")
    val deltaPath = s"target/scratch/ann_crash_delta_$pid"
    try {
      val b0 = embs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
        .select("vec_id", "embedding")
      val b1 = embs.filter(col("vec_id") >= 400 && col("vec_id") < 500)
        .select("vec_id", "embedding")
      StreamAnnIngest.ingestEpoch(b0, 0L, "vec_id", "embedding", ct, deltaPath)
      StreamAnnIngest.ingestEpoch(b1, 1L, "vec_id", "embedding", ct, deltaPath)
      // simulate the crash window the watermark exists for: the fold's
      // append COMMITS (rows land in the base table with their epoch ids)
      // but the process dies before any epoch dir is deleted — exactly what
      // compactDelta does internally, minus the retire
      val dirs = Seq(s"$deltaPath/epoch=0", s"$deltaPath/epoch=1")
      Similarity.appendAssigned(
        Similarity.readDeltaEpochs(spark, deltaPath, at, dirs), at, 8)
      assert(Similarity.foldedEpochWatermark(spark, at) === 1L)
      assert(spark.table(at).count() === 500)
      // the naive retry of the old design would fold the delta AGAIN
      // (double-counting all 200 vectors); the watermark makes the re-run
      // retire the dirs without re-folding
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(spark.table(at).count() === 500,
        "re-running compaction after an append-committed crash double-counted the delta")
      assert(!new java.io.File(deltaPath).exists(),
        "recovery run must finish retiring the folded epoch dirs")
      // every vector serves exactly once: distinct ids == row count
      assert(spark.table(at).select("neighbor_id").distinct().count() === 500)
      // a post-compaction re-delivery of an already-folded epoch (stream
      // restart from an older checkpoint offset) is retired WITHOUT
      // re-folding on the next cycle — the watermark covers it
      StreamAnnIngest.ingestEpoch(b1, 1L, "vec_id", "embedding", ct, deltaPath)
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(spark.table(at).count() === 500,
        "re-delivered already-folded epoch was folded twice")
      assert(!new java.io.File(deltaPath).exists())
      // epoch-id REUSE (fresh checkpoint restarting at 0 with NEW vectors,
      // landing under the watermark): retiring it would be silent data
      // loss, so compaction must refuse loudly and leave the dir intact
      val fresh = embs.filter(col("vec_id") < 20)
        .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
      StreamAnnIngest.ingestEpoch(fresh, 0L, "vec_id", "embedding", ct, deltaPath)
      val e = intercept[IllegalStateException] {
        StreamAnnIngest.compactDelta(spark, deltaPath, at)
      }
      assert(e.getMessage.contains("epoch ids were reused"), e.getMessage)
      assert(new java.io.File(s"$deltaPath/epoch=0").exists(),
        "the refused epoch dir must survive for manual recovery")
      assert(spark.table(at).count() === 500)
    } finally {
      for (t <- Seq(ct, at)) spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("maintenance cycle: compact -> refresh -> ingest -> compact keeps the watermark and exactly-once content") {
    import graft.extensions.Similarity
    import graft.streaming.StreamAnnIngest
    val embs = Tables.embeddings(spark, sf)
    val base = embs.filter(col("vec_id") < 300)
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_anncycle_pid$pid")
    val deltaPath = s"target/scratch/ann_cycle_delta_$pid"
    try {
      val b0 = embs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
        .select("vec_id", "embedding")
      val b1 = embs.filter(col("vec_id") >= 400 && col("vec_id") < 500)
        .select("vec_id", "embedding")
      StreamAnnIngest.ingestEpoch(b0, 0L, "vec_id", "embedding", ct, deltaPath)
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(Similarity.foldedEpochWatermark(spark, at) === 0L)
      // the maintenance-window refresh (compact first, then refresh): the
      // epoch column — the compaction watermark — must ride through the
      // rewrite, or the next compaction would re-fold epoch 0
      Similarity.refreshIvfIndex(spark, ct, at)
      assert(Similarity.foldedEpochWatermark(spark, at) === 0L,
        "refresh lost the epoch watermark")
      assert(spark.table(at).count() === 400)
      // the stream keeps going against the refreshed centroids
      StreamAnnIngest.ingestEpoch(b1, 1L, "vec_id", "embedding", ct, deltaPath)
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(Similarity.foldedEpochWatermark(spark, at) === 1L)
      assert(spark.table(at).count() === 500)
      assert(spark.table(at).select("neighbor_id").distinct().count() === 500)
      // probes serve through the refreshed + compacted layout
      val qs = embs.filter(col("vec_id") < 8)
      assert(Similarity.ivfTopKFromIndex(spark, ct, at, qs,
        "vec_id", "embedding", 5).count() === 40)
    } finally {
      for (t <- Seq(ct, at)) spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("profile-driven maintenance: one maintain call compacts, profiles, and picks noop/refresh/rebuild") {
    import graft.extensions.Similarity
    import graft.streaming.StreamAnnIngest
    val embs = Tables.embeddings(spark, sf)
    val base = embs.filter(col("vec_id") < 300)
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_annmaint_pid$pid")
    // a twin maintained BY HAND pins the refresh branch's content equality
    val (ctT, atT) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_annmtwin_pid$pid")
    val deltaPath = s"target/scratch/ann_maint_delta_$pid"
    // thresholds that cannot fire — the "probe the profile, touch nothing"
    // setting (cosines are > Long.MinValue; churn permille caps at 1000)
    val never = (1001L, Long.MinValue)
    try {
      val b0 = embs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
        .select("vec_id", "embedding")
      StreamAnnIngest.ingestEpoch(b0, 0L, "vec_id", "embedding", ct, deltaPath)
      // 1. quiet window: maintain still COMPACTS (watermark advances, delta
      // retired) and its report equals a direct ivfStaleness aggregate —
      // the decision is auditable against the profile it read
      val r0 = StreamAnnIngest.maintain(spark, deltaPath, ct, at,
        tripWouldMovePermille = never._1, rebuildCentroidCosQ = never._2)
      assert(r0.action === "noop")
      assert(Similarity.foldedEpochWatermark(spark, at) === 0L)
      assert(spark.table(at).count() === 400)
      assert(!new java.io.File(deltaPath).exists(),
        "maintain must run the compaction even on the noop branch")
      val direct = Similarity.ivfStaleness(spark, ct, at)
        .agg(sum("n"), sum("n_would_move"), min("centroid_cos_q")).head()
      assert((r0.n, r0.wouldMove, r0.minCentroidCosQ) ===
        ((direct.getLong(0), direct.getLong(1), direct.getLong(2))))
      assert(r0.wouldMovePermille === r0.wouldMove * 1000L / r0.n)
      // 2. refresh branch: a trip at/below the reported churn fires exactly
      // one warm refresh — content equal to the hand-driven
      // append-then-refresh twin (cid geometry, not just counts)
      Similarity.appendToIvfIndex(b0, "vec_id", "embedding", ctT, atT)
      Similarity.refreshIvfIndex(spark, ctT, atT)
      val r1 = StreamAnnIngest.maintain(spark, deltaPath, ct, at,
        tripWouldMovePermille = 0L, rebuildCentroidCosQ = never._2)
      assert(r1.action === "refresh")
      // nothing landed between the calls: the decision inputs are stable
      assert((r1.n, r1.wouldMove, r1.minCentroidCosQ) ===
        ((r0.n, r0.wouldMove, r0.minCentroidCosQ)))
      def asg(t: String) = spark.table(t).select("neighbor_id", "cid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      def cents(t: String) = spark.table(t).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
      assert(asg(at) === asg(atT))
      assert(cents(ct) === cents(ctT))
      // post-refresh quiet profile (frozen == just-refreshed, so the drift
      // signal is at its floor) — the reference point the rotation must move
      val r1b = StreamAnnIngest.maintain(spark, deltaPath, ct, at,
        tripWouldMovePermille = never._1, rebuildCentroidCosQ = never._2)
      assert(r1b.action === "noop")
      // 3. adversarial drift: a ROTATED epoch folds in; the profile moves
      // the honest direction and a floor between the quiet and dragged
      // minima flips the decision to the cold rebuild
      val rotated = embs.filter(col("vec_id") >= 400)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          concat(slice(col("embedding"), 33, 32),
            slice(col("embedding"), 1, 32)).as("embedding"))
      StreamAnnIngest.ingestEpoch(rotated, 1L, "vec_id", "embedding", ct, deltaPath)
      val r2 = StreamAnnIngest.maintain(spark, deltaPath, ct, at,
        tripWouldMovePermille = never._1, rebuildCentroidCosQ = never._2)
      assert(r2.action === "noop")
      assert(Similarity.foldedEpochWatermark(spark, at) === 1L)
      assert(spark.table(at).count() === 500)
      assert(r2.minCentroidCosQ < r1b.minCentroidCosQ,
        "rotated appends must drag a frozen centroid off its refreshed position")
      assert(r2.wouldMovePermille > r1b.wouldMovePermille,
        "rotated appends must raise the would-move churn")
      val r3 = StreamAnnIngest.maintain(spark, deltaPath, ct, at,
        tripWouldMovePermille = never._1,
        rebuildCentroidCosQ = r2.minCentroidCosQ + 1L)
      assert(r3.action === "rebuild")
      // the rebuild preserved the epoch watermark and exactly-once content
      assert(Similarity.foldedEpochWatermark(spark, at) === 1L,
        "rebuild lost the epoch watermark")
      assert(spark.table(at).count() === 500)
      assert(spark.table(at).select("neighbor_id").distinct().count() === 500)
      // 4. recall floor after the full cycle: served probes vs driver-side
      // exact cosine top-k over the same corpus
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val corpus = spark.table(at).select("neighbor_id", "cv").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val qs = embs.filter(col("vec_id") < 8)
      val exact = qs.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .flatMap { case (qid, qv) =>
          corpus.filter(_._1 != qid)
            .map { case (nid, nv) => (nid, cos(qv, nv)) }
            .sortBy { case (nid, c) => (-c, nid) }.take(5)
            .map { case (nid, _) => (qid, nid) }
        }.toSet
      val served = Similarity.ivfTopKFromIndex(spark, ct, at, qs,
        "vec_id", "embedding", 5).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(served.size === 40)
      val recall = served.intersect(exact).size.toDouble / exact.size
      info(s"post-cycle recall@5 = $recall")
      // deterministic measured value at sf0.001: 0.8 — an nProbe=2/16 IVF
      // over a 500-vector corpus whose last fold was 100 ADVERSARIAL
      // rotated vectors (the re-seed absorbed them into the geometry); the
      // floor is the pin, the exact value recorded for drift visibility
      assert(recall >= 0.75,
        s"recall after the full maintain cycle fell to $recall")
      assert(recall === 0.8)
    } finally {
      for (t <- Seq(ct, at, ctT, atT)) spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("compaction folds ONLY the epochs present at its snapshot; later epochs keep serving and fold next cycle") {
    import graft.extensions.Similarity
    import graft.streaming.StreamAnnIngest
    val embs = Tables.embeddings(spark, sf)
    val base = embs.filter(col("vec_id") < 300)
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(base, "vec_id", "embedding",
      s"graft_annsnap_pid$pid")
    val deltaPath = s"target/scratch/ann_snap_delta_$pid"
    try {
      val b0 = embs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
        .select("vec_id", "embedding")
      val b1 = embs.filter(col("vec_id") >= 400 && col("vec_id") < 500)
        .select("vec_id", "embedding")
      StreamAnnIngest.ingestEpoch(b0, 0L, "vec_id", "embedding", ct, deltaPath)
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(Similarity.foldedEpochWatermark(spark, at) === 0L)
      assert(spark.table(at).count() === 400)
      // an epoch landing AFTER a compaction cycle (stand-in for the live
      // ingest racing the fold: the fold operates on its enumerated
      // snapshot, so a later epoch is neither read nor deleted)
      StreamAnnIngest.ingestEpoch(b1, 1L, "vec_id", "embedding", ct, deltaPath)
      val qs = embs.filter(col("vec_id") < 8)
      val served = Similarity.ivfTopKFromIndexWithDelta(spark, ct, at,
        deltaPath, qs, "vec_id", "embedding", 5)
      assert(served.count() === 40) // 8 queries x k=5 over base+delta
      StreamAnnIngest.compactDelta(spark, deltaPath, at)
      assert(Similarity.foldedEpochWatermark(spark, at) === 1L)
      assert(spark.table(at).count() === 500)
      assert(spark.table(at).select("neighbor_id").distinct().count() === 500)
    } finally {
      for (t <- Seq(ct, at)) spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("maintain derives the compaction bucket count from the table's own spec") {
    import graft.extensions.Similarity
    import graft.streaming.StreamAnnIngest
    // regression for the hardcoded buckets=8 forward: an index built with a
    // DIFFERENT bucket count must compact through maintain without tripping
    // appendAssigned's spec check
    val embs = Tables.embeddings(spark, sf)
    val pid = ProcessHandle.current().pid()
    val (ct, at) = Similarity.buildIvfIndex(
      embs.filter(col("vec_id") < 300), "vec_id", "embedding",
      s"graft_annb4_pid$pid", buckets = 4)
    val deltaPath = s"target/scratch/ann_b4_delta_$pid"
    try {
      StreamAnnIngest.ingestEpoch(
        embs.filter(col("vec_id") >= 300 && col("vec_id") < 400)
          .select("vec_id", "embedding"),
        0L, "vec_id", "embedding", ct, deltaPath)
      val r = StreamAnnIngest.maintain(spark, deltaPath, ct, at,
        tripWouldMovePermille = 1001L, rebuildCentroidCosQ = Long.MinValue)
      assert(r.action === "noop")
      assert(Similarity.foldedEpochWatermark(spark, at) === 0L)
      assert(spark.table(at).count() === 400)
      assert(Similarity.tableBuckets(spark, at) === 4)
    } finally {
      for (t <- Seq(ct, at)) spark.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(deltaPath))
    }
  }

  test("streaming classifier scoring: frozen h116 weights through the epoch sink equal the batch scoring") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.extensions.Classifier
    import org.apache.spark.sql.Column
    val docs = Tables.documents(spark, sf)
    val rule = (toks: Column) => size(filter(toks,
      (t: Column) => t === "spark")) >= 2
    // train ONCE over the corpus (h116), freeze the weights
    val (w, _, _) = Classifier.trainState(docs, "doc_id", "text", rule, 256, 12)
    val path = s"target/scratch/clf_scores_${ProcessHandle.current().pid()}"
    val rows = docs.select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.streaming.StreamClassify.scoreEpoch(
          df, id, "doc_id", "text", w, 256, path)
      }
      .start()
    try {
      mem.addData(half1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(half2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def streamed() = spark.read.parquet(path)
      .select("doc_id", "score_q", "pred")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    val got = streamed()
    // stream == batch: scoring each micro-batch with the frozen weights and
    // unioning epochs equals one batch scoring pass over the same docs
    val want = Classifier.scoreWith(docs, "doc_id", "text", w, 256)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === want)
    // and equals the trainer's own in-pass scoring (same weights, same link)
    val trained = Classifier.qualityLrScores(docs, "doc_id", "text", rule,
        256, 12)
      .select("doc_id", "score_q", "pred")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got === trained)
    // at-least-once re-delivery: re-running epoch 1 with the same payload
    // REPLACES the epoch partition — content converges, nothing doubles
    graft.streaming.StreamClassify.scoreEpoch(
      half2.toIndexedSeq.toDF("doc_id", "text"), 1L, "doc_id", "text",
      w, 256, path)
    assert(streamed() === got)
  }
}
