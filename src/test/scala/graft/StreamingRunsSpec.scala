package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import graft.streaming.EventStreams.RunEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingRunsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  /** RunEvent at minute granularity: ts_us carried explicitly (the
    * precision contract — NOT derived from ts.getTime inside the
    * operator). */
  private def ev(minute: Int, typ: String, user: Long, id: Long = 0L): RunEvent =
    RunEvent(ts(minute), ts(minute).getTime * 1000L, id, typ, user)

  test("streaming runs close on type change and match the batch islands") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RunEvent]
    val q = EventStreams.streamingRuns(input.toDS())
      .writeStream.format("memory").queryName("runs")
      .outputMode(OutputMode.Append).start()

    // user 1: view view click view — two runs close as later types arrive
    // user 2: click click — stays open until the watermark flush
    input.addData(
      ev(0, "view", 1L, 1L), ev(1, "view", 1L, 2L),
      ev(2, "click", 1L, 3L), ev(3, "view", 1L, 4L),
      ev(10, "click", 2L, 5L), ev(20, "click", 2L, 6L))
    q.processAllAvailable()
    val closedEarly = spark.table("runs")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val m = 60000000L // one fixture minute in micros
    val b = ts(0).getTime * 1000L // fixture epoch base in micros
    assert(closedEarly == Set(
      (1L, "view", b, b + 1 * m, 2L),
      (1L, "click", b + 2 * m, b + 2 * m, 1L)))

    // push the watermark (1 h) + flush horizon (1 h) past everything:
    // the open tails (u1 view@3, u2 click run, u3's own run later) flush
    input.addData(ev(10 * 60, "view", 3L, 7L))
    q.processAllAvailable()
    input.addData(ev(24 * 60, "view", 4L, 8L))
    q.processAllAvailable()
    val all = spark.table("runs")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    q.stop()
    assert(all.contains((1L, "view", b + 3 * m, b + 3 * m, 1L)))
    assert(all.contains((2L, "click", b + 10 * m, b + 20 * m, 2L)))

    // batch twin over the same rows: every streaming-closed run appears
    // in the batch islands output (batch q121 on a parquet fixture)
    val d = java.nio.file.Files.createTempDirectory("graft-sruns").toString
    Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(1), 1L, "view", 0.0, "{}"),
      (3L, ts(2), 1L, "click", 0.0, "{}"),
      (4L, ts(3), 1L, "view", 0.0, "{}"),
      (5L, ts(10), 2L, "click", 0.0, "{}"),
      (6L, ts(20), 2L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val batch = graft.queries.StatsQueries.q121Scd2Runs(spark, d)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val streamed = all.filter(r => r._1 == 1L || r._1 == 2L)
    assert(streamed == batch)
  }

  test("sub-millisecond event time survives and same-microsecond ties order on event_id") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RunEvent]
    val q = EventStreams.streamingRuns(input.toDS())
      .writeStream.format("memory").queryName("runs_us")
      .outputMode(OutputMode.Append).start()

    val baseUs = ts(0).getTime * 1000L
    // user 7: three events inside ONE millisecond — micros 250 and 750
    // past the base, plus a same-microsecond tie at 750 resolved by
    // event_id (click id=2 before view id=3 ⟹ the click run closes
    // when the view arrives). ts (millis) is identical for all three.
    input.addData(
      RunEvent(ts(0), baseUs + 250L, 1L, "click", 7L),
      RunEvent(ts(0), baseUs + 750L, 2L, "click", 7L),
      RunEvent(ts(0), baseUs + 750L, 3L, "view", 7L))
    q.processAllAvailable()
    input.addData(ev(10 * 60, "view", 8L), ev(24 * 60, "view", 9L))
    q.processAllAvailable()
    q.stop()
    val runs = spark.table("runs_us")
      .as[(Long, String, Long, Long, Long)].collect().toSet
      .filter(_._1 == 7L)
    // the click run keeps exact micros (250 → 750); getTime-derived
    // boundaries would have truncated both to the millisecond
    assert(runs == Set(
      (7L, "click", baseUs + 250L, baseUs + 750L, 2L),
      (7L, "view", baseUs + 750L, baseUs + 750L, 1L)))
  }
}
