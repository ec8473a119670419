package graft

import java.sql.Timestamp
import graft.operators.Sketches
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{BloomOut, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming bloom build: a closed window must emit EXACTLY the set-bit
  * positions of the batch bloomBuild over the same keys — the
  * reconciliation law that lets a stream ship per-window membership
  * filters (e.g. "users active in hour H") that a batch backfill, or
  * Sketches.bloomProbe on either side, treats interchangeably. */
class StreamingBloomSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming closed-window positions == batch bloomBuild, exactly") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.streamingBloom(input.toDS())
      .writeStream.format("memory").queryName("bloomstream")
      .outputMode(OutputMode.Append).start()

    // hour 0: clicks from 40 users (with repeats — sets are idempotent),
    // a view window; hour 1: different users
    val hour0 = (0 until 40).map(u => UserEvent(ts(u), "click", u.toLong)) ++
      (0 until 40).map(u => UserEvent(ts(u + 5), "click", u.toLong)) ++
      (0 until 10).map(u => UserEvent(ts(u + 3), "view", (u + 100).toLong))
    val hour1 = (0 until 15).map(u => UserEvent(ts(60 + u), "click", (u * 3).toLong))
    input.addData(hour0 ++ hour1: _*)
    q.processAllAvailable()
    input.addData(UserEvent(ts(600), "noise", 0L)) // push watermark past both
    q.processAllAvailable()
    val streamed = spark.table("bloomstream").as[BloomOut].collect()
      .groupBy(o => (o.window_start, o.event_type))
      .view.mapValues(_.map(_.pos).toSet).toMap
    q.stop()

    val windowMillis = 3600000L
    val byWindow = (hour0 ++ hour1)
      .groupBy(e => (new Timestamp(
        Math.floorDiv(e.ts.getTime, windowMillis) * windowMillis), e.event_type))
    assert(streamed.keySet == byWindow.keySet)
    for ((key, events) <- byWindow) {
      val batch = Sketches.bloomBuild(events.toDF(), col("user_id"))
        .collect().map(_.getLong(0).toInt).toSet
      assert(streamed(key) == batch, s"$key: streaming filter != batch filter")
    }

    // the emitted positions feed bloomProbe unchanged: members of the
    // hour-0 click window all pass (no false negatives)
    val filter = streamed((ts(0), "click")).toSeq.toDF("pos")
    val probe = (0 until 40).map(_.toLong).toDF("user_id")
    val passed = Sketches.bloomProbe(probe, col("user_id"), filter)
      .filter(col("bloom_pass")).count()
    assert(passed == 40L)
  }
}
