package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourly rollup over a MemoryStream matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.hourlyRollup(events)
      .writeStream.format("memory").queryName("rollup")
      .outputMode(OutputMode.Append).start()

    input.addData(
      (ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(65), "click", 4.0),
      (ts(70), "buy", 8.0))
    q.processAllAvailable()
    // advance watermark far enough to close hour 0 and hour 1
    input.addData((ts(600), "click", 0.0))
    q.processAllAvailable()
    val rows = spark.table("rollup")
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains((ts(0), "click", 2L, 3.0)))
    assert(rows.contains((ts(60), "click", 1L, 4.0)))
    assert(rows.contains((ts(60), "buy", 1L, 8.0)))
  }

  test("streaming rollup transform is batch-reusable (same code path)") {
    // the SAME function applied to a static frame — no watermark needed
    val batch = Seq((ts(5), "click", 1.0), (ts(61), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.hourlyRollup(batch)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out == Set((ts(0), "click", 1L, 1.0), (ts(60), "click", 1L, 2.0)))
  }

  test("built-in session_window matches batch q14 session boundaries") {
    // same 30-minute gap, two independent mechanisms: q14's lag-window
    // session indexing vs the engine's native session_window merge.
    // (No event pair in this data sits EXACTLY on the gap boundary,
    // where the two definitions differ: q14 keeps t = prev + gap in the
    // session, session_window starts a new one.)
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("ts"), col("value"))
    val built = EventStreams.sessionWindowRollup(ev)
      .select(col("user_id"),
        unix_timestamp(col("session_start")).as("session_start_sec"),
        col("n_events"))
    val q14 = graft.queries.Relational.q14Sessionize(spark, sf)
      .select(col("user_id"), col("session_start_sec"),
        col("n_events").as("n14"))
    assert(built.count() == q14.count())
    val joined = built.join(q14, Seq("user_id", "session_start_sec"))
    assert(joined.count() == q14.count())
    assert(joined.filter(col("n_events") =!= col("n14")).count() == 0)
  }

  test("session_window streaming emits closed sessions after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionWindowRollup(
        input.toDS().toDF(), gap = "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0), Event(1L, ts(35), 4.0))
    q.processAllAvailable()
    input.addData(Event(2L, ts(300), 0.0))
    q.processAllAvailable()
    input.addData(Event(2L, ts(600), 0.0))
    q.processAllAvailable()
    val rows = spark.table("sw_sessions")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSeq
    q.stop()
    val u1 = rows.filter(_._1 == 1L).sortBy(_._2).reverse
    assert(u1 == Seq((1L, 2L, 3.0), (1L, 1L, 4.0)),
      s"got $rows")
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMillis = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()

    // user 1: two events 5 min apart (one session), then 30 min gap → new session
    input.addData(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0), Event(1L, ts(35), 4.0))
    q.processAllAvailable()
    // push watermark forward so the last session times out
    input.addData(Event(2L, ts(300), 0.0))
    q.processAllAvailable()
    input.addData(Event(2L, ts(600), 0.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").as[SessionOut].collect()
    q.stop()
    val u1 = rows.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(u1.length == 2, s"got ${u1.toSeq}")
    assert(u1(0).n_events == 2 && u1(0).total_value == 3.0)
    assert(u1(1).n_events == 1 && u1(1).total_value == 4.0)
  }
}
