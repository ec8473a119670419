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
