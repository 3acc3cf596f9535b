package graft.streaming

import graft.SparkSpec
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
}
