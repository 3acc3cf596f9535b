package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamingSessionize closes sessions on event-time gaps via flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    // user 1: two events 10 min apart (one session), then 2 hours later one more
    // user 2: a single event
    in.addData(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 5.0),
      SessionEvent(1L, ts("2024-01-01 10:10:00"), 7.0),
      SessionEvent(1L, ts("2024-01-01 12:00:00"), 1.0),
      SessionEvent(2L, ts("2024-01-01 10:00:00"), 3.0))
    // advance the watermark far past everything so all sessions time out
    in.addData(SessionEvent(99L, ts("2024-01-02 00:00:00"), 0.0))

    val sessions = StatefulOps.streamingSessionize(
      in.toDS().withWatermark("ts", "10 seconds").as[SessionEvent], gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("t_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("t_sessions").as[SessionOut].collect()
      .map(s => (s.user_id, s.n_events, s.total_value)).toSet
    // user 1's first session (2 events, 12.0) must be closed by the gap;
    // the later singleton and user 2's session close via the final watermark
    assert(out.contains((1L, 2L, 12.0)))
    assert(out.contains((1L, 1L, 1.0)))
    assert(out.contains((2L, 1L, 3.0)))
  }

  test("streamingSessionize timeout boundary: watermark == last+gap does NOT flush; " +
      "strictly past it does — the q_stream_sessionize_parity oracle's predicate") {
    // The driver oracle emits a user's final session only when
    // final_watermark > last + gap STRICTLY. That strictness is Spark's
    // EventTimeTimeout contract ("fires when watermark EXCEEDS the
    // timeout timestamp") — pin it with exact-boundary batches so a Spark
    // upgrade flipping it breaks THIS spec, not the round's hash gate.
    implicit val sqlCtx = spark.sqlContext
    def run(probe: String, lastEventTs: String): Set[(Long, Long)] = {
      val in = MemoryStream[SessionEvent]
      val sessions = StatefulOps.streamingSessionize(
        in.toDS().withWatermark("ts", "0 seconds").as[SessionEvent],
        gapMs = 60 * 1000)
      val q = sessions.writeStream.format("memory").queryName(probe)
        .outputMode("append").start()
      // batch 1: user 1's session, last event at 10:00:00 → timeout 10:01:00
      in.addData(SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // batch 2: another key advances the watermark to exactly/past 10:01:00
      in.addData(SessionEvent(9L, ts(lastEventTs), 0.0))
      q.processAllAvailable()
      // batch 3: no-op key so a post-watermark-update batch runs
      in.addData(SessionEvent(9L, ts(lastEventTs), 0.0))
      q.processAllAvailable()
      q.stop()
      spark.table(probe).as[SessionOut].collect()
        .map(s => (s.user_id, s.n_events)).toSet
    }
    // watermark lands EXACTLY on last+gap (delay 0: wm = max ts seen):
    // no flush — the timeout has not been strictly exceeded
    val atBoundary = run("t_sess_at", "2024-01-01 10:01:00")
    assert(!atBoundary.contains((1L, 1L)),
      s"session flushed at wm == last+gap — oracle strictness is wrong: $atBoundary")
    // one millisecond past: the timeout fires and the session flushes
    val pastBoundary = run("t_sess_past", "2024-01-01 10:01:00.001")
    assert(pastBoundary.contains((1L, 1L)),
      s"session NOT flushed at wm > last+gap: $pastBoundary")
  }

  test("streamingSessionize survives a late-but-admitted batch whose timeout " +
      "lands below the eviction watermark (the clamp — unclamped this THROWS)") {
    // The one-batch watermark skew (SPARK-40925 two-watermark design):
    // batch N's late-row filter uses the watermark from batch N-1's
    // PLANNING while GroupState validates timeouts against the one
    // updated at batch N's planning. No-data micro-batches normally
    // collapse the two (an empty trigger advances both), so disable them
    // to hold the window open: b1 pushes the watermark to 12:00 (delay
    // 0); b2's 10:00 event passes the still-0 late filter, and its
    // natural timeout 10:30 sits below the 12:00 eviction watermark —
    // setTimeoutTimestamp(10:30) terminates the query with
    // IllegalArgumentException unless clamped above the watermark.
    implicit val sqlCtx = spark.sqlContext
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noData)
    spark.conf.set(noData, "false")
    try {
    val in = MemoryStream[SessionEvent]
    val sessions = StatefulOps.streamingSessionize(
      in.toDS().withWatermark("ts", "0 seconds").as[SessionEvent],
      gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("t_sess_clamp")
      .outputMode("append").start()
    in.addData(SessionEvent(2L, ts("2024-01-01 12:00:00"), 1.0))
    q.processAllAvailable()
    in.addData(SessionEvent(1L, ts("2024-01-01 10:00:00"), 5.0)) // late, admitted
    q.processAllAvailable() // unclamped: StreamingQueryException here
    in.addData(SessionEvent(99L, ts("2024-01-02 00:00:00"), 0.0)) // raise wm
    q.processAllAvailable()
    // with no-data batches off, timeouts only fire inside a data batch —
    // one more batch runs under the raised watermark and flushes everything
    in.addData(SessionEvent(99L, ts("2024-01-02 00:10:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_sess_clamp").as[SessionOut].collect()
      .map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(out.contains((1L, 1L, 5.0)),
      s"the late singleton must still close via the clamped timeout: $out")
    assert(out.contains((2L, 1L, 1.0)))
    } finally spark.conf.set(noData, prevNoData)
  }

  test("streamingSessionize emits an admitted-late stray OLDER than the open " +
      "session by more than the gap as its own closed singleton (no merge)") {
    implicit val sqlCtx = spark.sqlContext
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noData)
    spark.conf.set(noData, "false")
    try {
    val in = MemoryStream[SessionEvent]
    val sessions = StatefulOps.streamingSessionize(
      in.toDS().withWatermark("ts", "0 seconds").as[SessionEvent],
      gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("t_sess_stray")
      .outputMode("append").start()
    in.addData(SessionEvent(1L, ts("2024-01-01 12:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 12:05:00"), 2.0))
    q.processAllAvailable()
    // 08:00 is 4 h before the open session's start with a 30 min gap: the
    // old `t - s.last <= gapMs` guard merged it (the difference is
    // negative, so the predicate was vacuously true for ANY late event)
    // and dragged session_start back 4 h — a session with an internal gap
    // batch replay would always split. It must emit as its own singleton.
    in.addData(SessionEvent(1L, ts("2024-01-01 08:00:00"), 8.0))
    q.processAllAvailable()
    in.addData(SessionEvent(99L, ts("2024-01-02 00:00:00"), 0.0)) // raise wm
    q.processAllAvailable()
    in.addData(SessionEvent(99L, ts("2024-01-02 00:10:00"), 0.0)) // flush
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_sess_stray").as[SessionOut].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(out.length === 2, out.mkString(","))
    assert(out(0).n_events === 1L && out(0).total_value === 8.0 &&
      out(0).session_start === ts("2024-01-01 08:00:00") &&
      out(0).session_end === ts("2024-01-01 08:00:00"),
      s"the 4h-late stray must close as a singleton: ${out(0)}")
    assert(out(1).n_events === 2L && out(1).total_value === 3.0 &&
      out(1).session_start === ts("2024-01-01 12:00:00"),
      s"the open session must be untouched by the stray: ${out(1)}")
    } finally spark.conf.set(noData, prevNoData)
  }

  test("streamingSessionize merges a late-but-admitted event BACKWARDS: " +
      "session_start never postdates a counted event") {
    implicit val sqlCtx = spark.sqlContext
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noData)
    spark.conf.set(noData, "false")
    try {
    val in = MemoryStream[SessionEvent]
    val sessions = StatefulOps.streamingSessionize(
      in.toDS().withWatermark("ts", "0 seconds").as[SessionEvent],
      gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("t_sess_back")
      .outputMode("append").start()
    in.addData(SessionEvent(1L, ts("2024-01-01 12:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 12:05:00"), 2.0))
    q.processAllAvailable()
    // 11:50 is within the gap of the open session's span — it must merge
    // and EXTEND THE START, not be counted under a 12:00 start
    in.addData(SessionEvent(1L, ts("2024-01-01 11:50:00"), 4.0))
    q.processAllAvailable()
    in.addData(SessionEvent(99L, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(SessionEvent(99L, ts("2024-01-02 00:10:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_sess_back").as[SessionOut].collect()
      .filter(_.user_id == 1L)
    assert(out.length === 1, out.mkString(","))
    assert(out.head.n_events === 3L && out.head.total_value === 7.0)
    assert(out.head.session_start === ts("2024-01-01 11:50:00"),
      s"start must extend back to the late event: ${out.head}")
    assert(out.head.session_end === ts("2024-01-01 12:05:00"))
    } finally spark.conf.set(noData, prevNoData)
  }

  test("streamingSessionize refuses a non-positive gap up front") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val e = intercept[IllegalArgumentException] {
      StatefulOps.streamingSessionize(
        in.toDS().withWatermark("ts", "0 seconds").as[SessionEvent], gapMs = 0L)
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }

  test("batch sessionize and streaming sessionize agree on session boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      SessionEvent(1L, ts("2024-01-01 09:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 09:05:00"), 2.0),
      SessionEvent(1L, ts("2024-01-01 11:00:00"), 4.0),
      SessionEvent(3L, ts("2024-01-01 09:00:00"), 8.0))

    // batch path
    val batch = graft.operators.Analytics.sessionize(
        events.toDF(), "ts", "user_id", gapSeconds = 1800)
      .groupBy("user_id", "session_seq")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("value").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet

    // streaming path (flush with a far-future watermark event)
    val in = MemoryStream[SessionEvent]
    in.addData(events: _*)
    in.addData(SessionEvent(99L, ts("2024-01-03 00:00:00"), 0.0))
    val sessions = StatefulOps.streamingSessionize(
      in.toDS().withWatermark("ts", "10 seconds").as[SessionEvent], gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("t_sessions_eq")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_sessions_eq").as[SessionOut].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.n_events, s.total_value)).toSet

    assert(streamed === batch)
  }

  test("streamingFunnel live == batch funnel under in-order delivery, disorder absorbed within a batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val events = Seq(
      // user 1: clean 3-stage funnel, split ACROSS micro-batches
      FunnelEvent(1L, ts("2024-01-01 10:00:00"), "signup"),
      FunnelEvent(1L, ts("2024-01-01 10:05:00"), "view"),
      FunnelEvent(1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: pre-signup view must not count; post-signup one does
      FunnelEvent(2L, ts("2024-01-01 09:00:00"), "view"),
      FunnelEvent(2L, ts("2024-01-01 10:00:00"), "signup"),
      FunnelEvent(2L, ts("2024-01-01 11:00:00"), "view"),
      // user 3: breaks at view (purchase arrives before any view)
      FunnelEvent(3L, ts("2024-01-01 10:00:00"), "signup"),
      FunnelEvent(3L, ts("2024-01-01 10:30:00"), "purchase"),
      // user 4: never signs up
      FunnelEvent(4L, ts("2024-01-01 10:00:00"), "view"))
    val stages = Seq("signup", "view", "purchase")

    val batch = graft.operators.Analytics.funnel(
        events.toDF(), "user_id", "ts",
        stages.map(t => s"t_$t" -> (col("event_type") === t)))
      .collect().map { r =>
        val prefix = (1 to 3).map(i => Option(r.getTimestamp(i)))
          .takeWhile(_.isDefined).flatten
        r.getLong(0) -> prefix
      }.toMap

    val in = MemoryStream[FunnelEvent]
    // batch 1 delivered OUT of event-time order within the batch; the
    // cross-batch split point keeps per-key event-time order
    in.addData(events.take(5).reverse: _*)
    in.addData(events.drop(5): _*)
    val q = StatefulOps.streamingFunnel(in.toDS(), stages)
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // Update mode: the LAST progress row per user is the final state
    val streamed = spark.table("t_funnel")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max_by(
        col("stage_times"), org.apache.spark.sql.functions.size(col("stage_times")))
        .as("stage_times"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Timestamp](1).toIndexedSeq).toMap

    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (u, prefix) =>
      assert(prefix === batch(u), s"user $u")
    }
  }

  test("streamingFunnel stateTtlMs evicts idle keys past the watermark and restarts them fresh") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("signup", "view", "purchase")
    // u1 signs up, then goes idle past the 1 h TTL while other keys push
    // the watermark forward; its post-eviction "view" must NOT advance the
    // old funnel — the key restarts from stage 0 (where "view" doesn't fit)
    def run(ttlMs: Long, sink: String): Map[Long, Seq[Int]] = {
      val in = MemoryStream[FunnelEvent]
      val q = StatefulOps.streamingFunnel(
          in.toDS().withWatermark("ts", "0 seconds"), stages, stateTtlMs = ttlMs)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      // one processAllAvailable per block: DISTINCT micro-batches, so the
      // watermark actually advances between them (AvailableNow would fold
      // everything into one batch and no timeout could ever fire)
      Seq(
        FunnelEvent(1L, ts("2024-01-01 10:00:00"), "signup"),
        FunnelEvent(99L, ts("2024-01-01 14:00:00"), "signup"),
        FunnelEvent(98L, ts("2024-01-01 14:01:00"), "signup"),
        FunnelEvent(1L, ts("2024-01-01 14:30:00"), "view")
      ).foreach { e => in.addData(e); q.processAllAvailable() }
      q.stop()
      spark.table(sink).as[FunnelProgress].collect().toSeq
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.map(_.stage_times.length).sorted
        }
    }
    val evicted = run(ttlMs = 3600 * 1000L, sink = "t_funnel_ttl")
    // u1: the b1 progress (1 stage), the eviction flush (1 stage), and the
    // post-eviction restart where "view" matches nothing (0 stages)
    assert(evicted(1L) === Seq(0, 1, 1), evicted)
    val kept = run(ttlMs = 0L, sink = "t_funnel_nottl")
    // without TTL the late view extends the original funnel to 2 stages
    assert(kept(1L) === Seq(1, 2), kept)
  }

  test("streamingFunnel TTL deadline is monotonic: a late event cannot shorten it") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("signup", "view", "purchase")
    // u1 signs up at 14:00 (deadline 15:00 with a 1 h TTL). A stray LATE
    // event (ts 10:00, below the key's max-seen) arrives next batch; if the
    // deadline were re-anchored on the BATCH max it would collapse to
    // ~wm+1ms and u1 would be evicted while still live — its in-window
    // "view" at 14:45 would then restart a fresh funnel at stage 0 instead
    // of advancing to stage 2.
    val in = MemoryStream[FunnelEvent]
    val q = StatefulOps.streamingFunnel(
        in.toDS().withWatermark("ts", "0 seconds"), stages, stateTtlMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("t_funnel_late")
      .outputMode("update").start()
    Seq(
      FunnelEvent(1L, ts("2024-01-01 14:00:00"), "signup"),
      FunnelEvent(1L, ts("2024-01-01 10:00:00"), "view"),   // LATE (ignored by stages too)
      FunnelEvent(99L, ts("2024-01-01 14:30:00"), "signup"),// advances the watermark
      FunnelEvent(1L, ts("2024-01-01 14:45:00"), "view")    // in-window stage 2
    ).foreach { e => in.addData(e); q.processAllAvailable() }
    q.stop()
    val u1 = spark.table("t_funnel_late").as[FunnelProgress].collect()
      .filter(_.user_id == 1L).map(_.stage_times.length)
    // the funnel reaches 2 stages and is NEVER evicted-and-restarted (no
    // 0-stage row may exist for u1)
    assert(u1.max === 2, u1.toSeq)
    assert(!u1.contains(0), u1.toSeq)
  }

  test("streamingAsofEnrich stateTtlMs drops the reference after idle expiry") {
    implicit val sqlCtx = spark.sqlContext
    def run(ttlMs: Long, sink: String): Set[(Long, Long)] = {
      val in = MemoryStream[EnrichEvent]
      val q = StatefulOps.streamingAsofEnrich(
          in.toDS().withWatermark("ts", "0 seconds"), "view", "purchase",
          stateTtlMs = ttlMs)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      Seq(
        EnrichEvent(1L, ts("2024-01-01 10:00:00"), 1L, "view", 5.0),
        EnrichEvent(99L, ts("2024-01-01 14:00:00"), 2L, "view", 1.0),
        EnrichEvent(98L, ts("2024-01-01 14:01:00"), 3L, "view", 2.0),
        EnrichEvent(1L, ts("2024-01-01 14:30:00"), 4L, "purchase", 70.0)
      ).foreach { e => in.addData(e); q.processAllAvailable() }
      q.stop()
      spark.table(sink).as[EnrichedFact].collect().map(e => (e.user_id, e.event_id)).toSet
    }
    // u1's view is >1 h idle when the purchase arrives: state evicted, the
    // fact has no reference and is dropped — exactly the no-prior-view path
    assert(run(3600 * 1000L, "t_enrich_ttl") === Set.empty)
    // without TTL the stale reference still matches
    assert(run(0L, "t_enrich_nottl") === Set((1L, 4L)))
  }

  test("streamingAsofEnrich live == batch asofJoinMerge under in-order delivery") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // interleaved views/purchases; purchases before any view; equal-ts
    // view+purchase (at-or-before: the view counts); a view between batches
    val b1 = Seq(
      EnrichEvent(1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 50.0), // no prior view
      EnrichEvent(1L, ts("2024-01-01 10:01:00"), 2L, "view", 1.0),
      EnrichEvent(1L, ts("2024-01-01 10:02:00"), 3L, "purchase", 60.0),
      EnrichEvent(2L, ts("2024-01-01 10:00:00"), 4L, "view", 9.0),
      EnrichEvent(2L, ts("2024-01-01 10:00:00"), 5L, "purchase", 70.0)) // same ts as its view
    val b2 = Seq(
      EnrichEvent(1L, ts("2024-01-01 10:05:00"), 6L, "view", 2.0),
      EnrichEvent(1L, ts("2024-01-01 10:06:00"), 7L, "purchase", 80.0),
      EnrichEvent(3L, ts("2024-01-01 10:00:00"), 8L, "purchase", 90.0)) // never any view
    val all = b1 ++ b2

    // batch path: the custom-exec as-of join, matched rows only (q_asof_join shape)
    val df = all.toDF()
    val purchases = df.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = df.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"),
        col("event_id").as("view_seq"))
    val batch = graft.operators.Analytics.asofJoinMerge(
        purchases, views, "user_id", "ts", "ts", Seq("view_value"),
        rightTies = Seq("view_seq"))
      .filter(col("asof_view_value").isNotNull)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(3), r.getDouble(4))).toSet

    // streaming path: same events in two ts-ordered micro-batches
    val in = MemoryStream[EnrichEvent]
    in.addData(b1: _*)
    in.addData(b2: _*)
    val enriched = StatefulOps.streamingAsofEnrich(in.toDS(), "view", "purchase")
    val q = enriched.writeStream.format("memory").queryName("t_asof_enrich")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_asof_enrich").as[EnrichedFact].collect()
      .map(e => (e.user_id, e.event_id, e.value, e.prior_view_value)).toSet

    assert(streamed === batch)
    assert(streamed.contains((2L, 5L, 70.0, 9.0)))  // same-instant view counts
    assert(!streamed.exists(_._2 == 1L) && !streamed.exists(_._1 == 3L)) // unmatched dropped
  }

  test("streamingEma equals the batch recursive fold under ordered cross-batch delivery") {
    implicit val sqlCtx = spark.sqlContext
    val alpha = 0.1
    val events = Seq(
      EmaEvent(1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      EmaEvent(1L, ts("2024-01-01 10:01:00"), 2L, 20.0),
      EmaEvent(1L, ts("2024-01-01 10:02:00"), 3L, 30.0),
      EmaEvent(2L, ts("2024-01-01 10:00:00"), 4L, 5.0),
      EmaEvent(2L, ts("2024-01-01 10:03:00"), 5L, 6.0))
    // split across micro-batches, per-key order preserved; batch 2 also
    // arrives intra-batch DISORDERED to exercise the sort
    val in = MemoryStream[EmaEvent]
    in.addData(events(0), events(3))
    in.addData(events(2), events(1), events(4))

    val q = StatefulOps.streamingEma(in.toDS(), alpha)
      .writeStream.format("memory").queryName("t_ema")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // last emitted row per event_id is the final smoothed value
    val live = spark.table("t_ema").as[EmaOut].collect()
      .map(o => o.event_id -> o.ema).toMap

    val expected = events.groupBy(_.user_id).values.flatMap { es =>
      var ema = Option.empty[Double]
      es.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        val next = ema.map(s => alpha * e.value + (1 - alpha) * s).getOrElse(e.value)
        ema = Some(next)
        e.event_id -> next
      }
    }.toMap
    assert(live === expected)
    assert(live(3L) === alpha * 30.0 + (1 - alpha) * (alpha * 20.0 + (1 - alpha) * 10.0))
  }

  test("streamingHeavyHitters: cross-batch summary == one-pass batch MG; contract holds") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode}
    val k = 4
    // skewed fixture: "hot" 40%, "warm" 20%, 30 rotating cold items (the
    // cold tail forces decrement events, the interesting MG path)
    val events = (0 until 300).map { i =>
      val item = if (i % 5 < 2) "hot" else if (i % 5 == 2) "warm" else s"cold${i % 30}"
      HHEvent("g", i.toLong, item)
    }
    val in = MemoryStream[HHEvent]
    val q = StatefulOps.streamingHeavyHitters(in.toDS(), k)
      .writeStream.format("memory").queryName("t_hh").outputMode("update").start()
    // a null item rides along in the first block: skipped entirely (no n
    // increment, no counter) exactly like the batch FreqItemsAgg
    val withNull = HHEvent("g", -1L, null) +: events
    withNull.grouped(101).foreach { block =>   // three genuine micro-batches
      in.addData(block: _*); q.processAllAvailable()
    }
    q.stop()
    val snaps = spark.table("t_hh").as[HHSnapshot].collect()
    assert(snaps.map(_.n).max === 300L, "final snapshot covers all items")
    val live = snaps.filter(_.n == 300L).map(s => s.item -> s.est).toMap

    // batch: the SAME ordered single-partition pass through FreqItemsAgg —
    // cross-batch state continuation must be literally the same fold
    val batch = events.toDF("group", "seq", "item")
      .repartition(1).sortWithinPartitions("seq")
      .agg(graft.functions.TextFunctions.freqItems(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toMap
    assert(live === batch)

    // mergeable-summaries contract regardless of batching: guaranteed
    // presence above n/(k+1), undercount bounded by n/(k+1)
    val exact = events.groupBy(_.item).view.mapValues(_.size.toLong).toMap
    val bar = 300.0 / (k + 1)
    exact.filter(_._2 > bar).keys.foreach { i => assert(live.contains(i), i) }
    live.foreach { case (i, est) =>
      assert(est <= exact(i) && exact(i) - est <= bar, s"$i: $est vs ${exact(i)}")
    }
    // state is bounded: never more than k counters in any snapshot
    snaps.groupBy(_.n).foreach { case (_, rows) => assert(rows.length <= k) }
  }

  test("streamingKmvDistinct: cross-batch summary == batch kmvDistinct exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val k = 4
    // group a: 12 distinct items (> k, estimate path) with heavy duplication
    // across batches; group b: 2 distinct (< k, exact path)
    val events = (0 until 36).map { i =>
      KmvEvent(if (i % 3 == 2) "b" else "a",
        if (i % 3 == 2) s"u${i % 2}" else s"item${i % 12}")
    }
    val in = MemoryStream[KmvEvent]
    val q = StatefulOps.streamingKmvDistinct(in.toDS(), k)
      .writeStream.format("memory").queryName("t_kmv").outputMode("update").start()
    // a null item rides along: skipped like the batch side's null-eating hash
    val withNull = KmvEvent("a", null) +: events
    withNull.grouped(13).foreach { block =>
      in.addData(block: _*); q.processAllAvailable()
    }
    q.stop()
    val snaps = spark.table("t_kmv").as[KmvSnapshot].collect()
    // the final state per group: kmv_k is nondecreasing over batches and,
    // at equal kmv_k, the summary only improves downward (h_k nonincreasing)
    val live = snaps.groupBy(_.group).map { case (g, ss) =>
      val fin = ss.maxBy(s => (s.kmv_k, -s.h_k))
      g -> ((fin.kmv_k, fin.h_k, fin.est_distinct))
    }
    val batch = Analytics.kmvDistinct(
        events.toDF("group", "item"), "group", col("item"), k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(live === batch)
    assert(live("b")._1 === 2L)
    assert(live("b")._3 === 2.0)  // below k the estimate IS the exact count
    assert(live("a")._1 === 4L)   // summary capped at k forever
  }

  test("streamingAnomaly equals the batch Welford fold; spike flags after warmup") {
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 8).map(i => EmaEvent(1L, ts(f"2024-01-01 10:00:$i%02d"), i.toLong,
      if (i % 2 == 0) 11.0 else 9.0))
    val spike = EmaEvent(1L, ts("2024-01-01 10:01:00"), 99L, 100.0)
    val in = MemoryStream[EmaEvent]
    in.addData(base.take(5): _*)
    in.addData((base.drop(5) :+ spike): _*)

    val q = StatefulOps.streamingAnomaly(in.toDS(), zMax = 3.0, minN = 5L)
      .writeStream.format("memory").queryName("t_anom")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val live = spark.table("t_anom").as[AnomalyOut].collect()
      .map(o => o.event_id -> ((o.z, o.anomaly))).toMap

    // batch Welford fold over the same ordered series
    var (n, mean, m2) = (0L, 0.0, 0.0)
    val expected = (base :+ spike).sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
      val z = if (n >= 5 && m2 > 0.0) (e.value - mean) / math.sqrt(m2 / (n - 1)) else 0.0
      val n1 = n + 1; val d = e.value - mean; val mean1 = mean + d / n1
      m2 = m2 + d * (e.value - mean1); n = n1; mean = mean1
      e.event_id -> ((z, n - 1 >= 5 && math.abs(z) > 3.0))
    }.toMap
    assert(live === expected)
    assert(live(99L)._2, "the spike must be flagged")
    assert(live(3L)._1 === 0.0, "pre-warmup events carry z = 0")
  }

  test("native session_window streaming == batch session_window on the same events") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      SessionEvent(1L, ts("2024-01-01 09:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 09:10:00"), 2.0),
      SessionEvent(1L, ts("2024-01-01 11:00:00"), 4.0),
      SessionEvent(2L, ts("2024-01-01 09:05:00"), 8.0))
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("n"), col("total"))
    val batch = sessions(events.toDF())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet

    val in = MemoryStream[SessionEvent]
    in.addData(events.take(2): _*)
    in.addData(events.drop(2): _*)
    // advance the watermark far enough to close every session
    in.addData(SessionEvent(99L, ts("2024-01-02 00:00:00"), 0.0))
    val q = sessions(in.toDF().withWatermark("ts", "10 seconds"))
      .writeStream.format("memory").queryName("t_native_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val live = spark.table("t_native_sessions")
      .filter(col("user_id") =!= 99L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSet
    assert(live === batch.filter(_._1 != 99L))
  }

  test("streamingRateLimit: refill is exact event-time micro-token arithmetic; rejection keeps the clock") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[RateEvent]
    in.addData(
      RateEvent(1L, ts("2024-01-01 10:00:00"), 1L),
      RateEvent(1L, ts("2024-01-01 10:00:00.1"), 2L),
      RateEvent(1L, ts("2024-01-01 10:00:00.5"), 3L),
      RateEvent(1L, ts("2024-01-01 10:00:02.6"), 4L))
    val q = StatefulOps.streamingRateLimit(in.toDS(), capTokens = 2, ratePerSec = 1)
      .writeStream.format("memory").queryName("t_rate").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("t_rate").as[RateDecision].collect()
      .map(d => d.event_id -> ((d.admitted, d.tokens_after_micro))).toMap
    // full bucket (2 tokens) at first sight; +0.1s, +0.4s, +2.1s refills
    assert(out === Map(
      1L -> ((true, 1000000L)),   // 2.0 → admit → 1.0
      2L -> ((true, 100000L)),    // 1.1 → admit → 0.1
      3L -> ((false, 500000L)),   // 0.5 → reject (clock still advanced)
      4L -> ((true, 1000000L))))  // capped at 2.0 → admit → 1.0
  }

  test("streamingRateLimit live == rateLimitBatch under in-order cross-batch delivery") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      RateEvent(1L, ts("2024-01-01 10:00:00"), 1L),
      RateEvent(1L, ts("2024-01-01 10:00:00.2"), 2L),
      RateEvent(2L, ts("2024-01-01 10:00:00"), 3L),
      RateEvent(1L, ts("2024-01-01 10:00:00.9"), 4L),
      RateEvent(2L, ts("2024-01-01 10:00:03"), 5L),
      RateEvent(1L, ts("2024-01-01 10:00:04"), 6L),
      RateEvent(2L, ts("2024-01-01 10:00:04.5"), 7L))
    val in = MemoryStream[RateEvent]
    in.addData(events.take(3): _*)   // three micro-batches, per-key in order
    in.addData(events.slice(3, 5): _*)
    in.addData(events.drop(5): _*)
    val q = StatefulOps.streamingRateLimit(in.toDS(), capTokens = 1, ratePerSec = 1)
      .writeStream.format("memory").queryName("t_rate_parity").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val live = spark.table("t_rate_parity").as[RateDecision].collect()
      .map(d => d.event_id -> ((d.admitted, d.tokens_after_micro))).toMap
    val batch = StatefulOps.rateLimitBatch(events.toDS(), capTokens = 1, ratePerSec = 1)
      .collect().map(d => d.event_id -> ((d.admitted, d.tokens_after_micro))).toMap
    assert(live === batch)
    assert(batch.values.exists(!_._1), "the scenario must actually reject something")
  }
}
