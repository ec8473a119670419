package graft

import java.sql.Timestamp
import graft.operators.Sketches
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{CmOut, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming count-min: closed windows must reproduce the BATCH sketch
  * cell-for-cell — the reconciliation law that lets an incremental
  * frequency census and a batch backfill share one definition of
  * "approximately how often", and the mergeability (plain addition)
  * that makes supplementary late-window sketches safe. */
class StreamingCountMinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming closed-window sketch == batch countMinBuild, cell-for-cell") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.streamingCountMin(input.toDS())
      .writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Append).start()

    // hour 0: skewed clicks (user u appears u%5+1 times), a few views;
    // hour 1: uniform clicks
    val hour0 = (0 until 30).flatMap(u =>
      Seq.fill(u % 5 + 1)(UserEvent(ts(u % 55), "click", u.toLong))) ++
      (0 until 8).map(u => UserEvent(ts(u + 3), "view", (u + 50).toLong))
    val hour1 = (0 until 12).map(u => UserEvent(ts(60 + u), "click", (u * 2).toLong))
    input.addData(hour0 ++ hour1: _*)
    q.processAllAvailable()
    input.addData(UserEvent(ts(600), "noise", 0L)) // push watermark past both
    q.processAllAvailable()
    val streamed = spark.table("cms").as[CmOut].collect()
      .groupBy(o => (o.window_start, o.event_type))
      .view.mapValues(_.map(o => (o.row, o.col) -> o.c).toMap).toMap
    q.stop()

    val windowMillis = 3600000L
    val byWindow = (hour0 ++ hour1)
      .groupBy(e => (new Timestamp(
        Math.floorDiv(e.ts.getTime, windowMillis) * windowMillis), e.event_type))
    assert(streamed.keySet == byWindow.keySet)
    for ((key, events) <- byWindow) {
      val batch = Sketches
        .countMinBuild(events.toDF(), col("user_id"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
      assert(streamed(key) == batch,
        s"$key: streaming sketch != batch sketch")
    }
    // probing the streamed sketch gives the usual never-undercount law
    val h0 = streamed((ts(0), "click"))
    val sketchDf = h0.toSeq.map { case ((r, c), n) => (r, c.toLong, n) }
      .toDF("row", "col", "c")
    val probes = (0 until 30).map(_.toLong).toDF("user_id")
    val est = Sketches.countMinProbe(probes, col("user_id"), sketchDf)
      .select("user_id", "cm_count").as[(Long, Long)].collect().toMap
    (0 until 30).foreach(u =>
      assert(est(u.toLong) >= u % 5 + 1, s"undercount for user $u"))
  }

  test("state is fixed-size and the JVM kernel matches the column hash") {
    val counters = new Array[Long](Sketches.CmDepth * Sketches.CmWidth)
    (0 until 50000).foreach(i => Sketches.cmUpdate(counters, i.toString))
    assert(counters.length == Sketches.CmDepth * Sketches.CmWidth)
    assert(counters.sum == 50000L * Sketches.CmDepth) // every update lands d cells
    // cross-check one row of the JVM kernel against the column build
    val batch = Sketches.countMinBuild(
        (0 until 1000).map(_.toString).toDF("v"), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val jvm = new Array[Long](Sketches.CmDepth * Sketches.CmWidth)
    (0 until 1000).foreach(i => Sketches.cmUpdate(jvm, i.toString))
    batch.foreach { case ((r, c), n) =>
      assert(jvm(r * Sketches.CmWidth + c) == n, s"cell ($r,$c) differs")
    }
  }
}
