package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import graft.streaming.EventStreams.UserEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingRunsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming runs close on type change and match the batch islands") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.streamingRuns(input.toDS())
      .writeStream.format("memory").queryName("runs")
      .outputMode(OutputMode.Append).start()

    // user 1: view view click view — two runs close as later types arrive
    // user 2: click click — stays open until the watermark flush
    input.addData(
      UserEvent(ts(0), "view", 1L), UserEvent(ts(1), "view", 1L),
      UserEvent(ts(2), "click", 1L), UserEvent(ts(3), "view", 1L),
      UserEvent(ts(10), "click", 2L), UserEvent(ts(20), "click", 2L))
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
    input.addData(UserEvent(ts(10 * 60), "view", 3L))
    q.processAllAvailable()
    input.addData(UserEvent(ts(24 * 60), "view", 4L))
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
}
