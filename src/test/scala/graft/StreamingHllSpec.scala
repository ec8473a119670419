package graft

import java.sql.Timestamp
import graft.operators.Sketches
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{HllOut, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming HLL: closed windows must reproduce the BATCH sketch
  * bit-for-bit — the reconciliation property that lets a streaming
  * serving layer and a batch backfill share one definition of
  * "approximately how many distinct users". */
class StreamingHllSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming window estimates == batch hllDistinct, bit-identical") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = EventStreams.streamingHllDistinct(input.toDS())
      .writeStream.format("memory").queryName("hll")
      .outputMode(OutputMode.Append).start()

    // hour 0: clicks from 40 users (ids 0..39, some repeated), views
    // from 10; hour 1: clicks from 15
    val hour0 = (0 until 40).map(u => UserEvent(ts(u % 55), "click", u.toLong)) ++
      (0 until 40).map(u => UserEvent(ts((u * 7) % 55), "click", (u % 20).toLong)) ++
      (0 until 10).map(u => UserEvent(ts(u + 2), "view", (u + 100).toLong))
    val hour1 = (0 until 15).map(u => UserEvent(ts(60 + u), "click", (u * 3).toLong))
    input.addData(hour0 ++ hour1: _*)
    q.processAllAvailable()
    // push the watermark (2h default) past both window ends
    input.addData(UserEvent(ts(600), "noise", 0L))
    q.processAllAvailable()
    val streamed = spark.table("hll").as[HllOut].collect()
      .map(o => (o.window_start, o.event_type) -> o.hll_distinct).toMap
    q.stop()

    val batch = (hour0 ++ hour1).toDF()
      .withColumn("window_start",
        timestamp_millis(expr("FLOOR(unix_millis(ts) / 3600000) * 3600000")))
    val expected = Sketches
      .hllDistinct(batch, col("user_id"), Seq("window_start", "event_type"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2)).toMap

    for (((k, v)) <- expected) {
      assert(streamed.contains(k), s"missing window $k in ${streamed.keys}")
      assert(streamed(k) == v, s"$k: streaming ${streamed(k)} != batch $v")
    }
    // and the estimates are sane vs truth (40 distinct clickers hour 0)
    val h0 = streamed((ts(0), "click"))
    assert(math.abs(h0 - 40) / 40.0 < 0.25, s"h0=$h0")
  }

  test("bloom probe applies to a stream unchanged (stream-static join)") {
    // the batch-built filter gates a stream: bloomProbe is stateless, so
    // the same code path runs under a streaming plan with no state store
    implicit val sqlCtx = spark.sqlContext
    val build = spark.range(50).select((col("id") * 3).as("k"))
    val filter = Sketches.bloomBuild(build, col("k"))
    val input = MemoryStream[Long]
    val q = Sketches.bloomProbe(input.toDF().toDF("k"), col("k"), filter)
      .writeStream.format("memory").queryName("bloomed")
      .outputMode(OutputMode.Append).start()
    input.addData(0L to 149L: _*)
    q.processAllAvailable()
    val rows = spark.table("bloomed")
      .select(col("k"), col("bloom_pass")).as[(Long, Boolean)].collect()
    q.stop()
    assert(rows.length == 150)
    // zero false negatives through the streaming plan too
    assert(rows.filter(r => r._1 % 3 == 0 && r._1 < 150).forall(_._2))
  }

  test("state is fixed-size: registers never exceed 256 bytes") {
    val regs = new Array[Byte](Sketches.HllBuckets)
    (0 until 100000).foreach(i => Sketches.hllUpdate(regs, s"hll|$i"))
    assert(regs.length == Sketches.HllBuckets)
    // and the JVM kernel tracks truth at 100k distinct within 3σ
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 100000) / 100000.0 < 0.20, s"est=$est")
  }
}
