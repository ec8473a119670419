package graft

import java.sql.Timestamp
import graft.operators.Sketches
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, QsOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming histogram-quantile: closed windows must reproduce the
  * BATCH column pipeline (the q66 shape) bit-for-bit via the shared
  * JVM kernel — the reconciliation law that lets a stream serving
  * layer and a batch backfill share one definition of "p99". */
class StreamingQuantileSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val width = 10.0
  private val qs = Seq(0.5, 0.9, 0.99)

  /** The batch column pipeline of q66, parameterized by window key —
    * the exact arithmetic the streaming kernel claims to reproduce. */
  private def batchQuantiles(events: Seq[Event],
                             windowMillis: Long): Map[(Timestamp, Double), (Double, Long)] = {
    val df = events.toDF()
      .withColumn("window_start",
        (floor(col("ts").cast("long") * 1000 / windowMillis) * windowMillis))
    val hist = df.groupBy(col("window_start"),
        floor(col("value") / width).as("bin"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("window_start").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("window_start")))
    cum.crossJoin(
        spark.range(1).select(explode(array(qs.map(lit): _*)).as("q")))
      .withColumn("target", floor(col("q") * col("n")) + 1)
      .filter(col("cum") >= col("target") &&
        col("cum") - col("c") < col("target"))
      .select(col("window_start"), col("q"),
        (col("bin") * width +
          (lit(width) * (col("target") - (col("cum") - col("c")))) /
            col("c")).as("quantile_est"),
        col("n").as("n_rows"))
      .collect()
      .map(r => (new Timestamp(r.getLong(0)), r.getDouble(1)) ->
        (r.getDouble(2), r.getLong(3)))
      .toMap
  }

  test("streaming closed-window quantiles == batch pipeline, bit-for-bit") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.streamingQuantile(input.toDS(), width = width, qs = qs)
      .writeStream.format("memory").queryName("qsketch")
      .outputMode(OutputMode.Append).start()

    // hour 0: a skewed long-tail (values 0..290, heavier low end);
    // hour 1: uniform small window
    val hour0 = (0 until 200).map(i =>
      Event(i.toLong, ts(i % 55), (i % 29) * (i % 11) + i / 10.0)) ++
      (0 until 25).map(i => Event(i.toLong, ts(i % 50), 250.0 + i))
    val hour1 = (0 until 40).map(i => Event(i.toLong, ts(60 + i % 50), i * 3.5))
    input.addData(hour0 ++ hour1: _*)
    q.processAllAvailable()
    input.addData(Event(0L, ts(600), 0.0)) // push watermark past both hours
    q.processAllAvailable()
    val streamed = spark.table("qsketch").as[QsOut].collect()
      .map(o => (o.window_start, o.q) -> (o.quantile_est, o.n_rows)).toMap
    q.stop()

    val batch = batchQuantiles(hour0 ++ hour1, 3600000L)
    val expectedKeys = Seq(ts(0), ts(60)).flatMap(t => qs.map(q0 => (t, q0))).toSet
    assert(streamed.keySet == expectedKeys)
    assert(batch.keySet == expectedKeys)
    for (key <- expectedKeys)
      assert(streamed(key) == batch(key), // exact double equality, no epsilon
        s"$key: streaming ${streamed(key)} != batch ${batch(key)}")
  }

  test("kernel matches the column pipeline on adversarial histograms") {
    // single bin, all mass in one cell; exact bin boundaries; big gaps
    val cases = Seq(
      Seq.fill(7)(42.0),
      Seq(0.0, 10.0, 20.0, 30.0),
      Seq(-35.0, -5.0, 0.0, 999.0),
      (1 to 100).map(_.toDouble * 10.0))
    for ((values, ci) <- cases.zipWithIndex) {
      val events = values.zipWithIndex.map { case (v, i) => Event(i.toLong, ts(i), v) }
      val dayMillis = 24 * 3600000L
      val winStart = new Timestamp(
        Math.floorDiv(events.head.ts.getTime, dayMillis) * dayMillis)
      val batch = batchQuantiles(events, dayMillis)
      val hist = values
        .groupBy(v => math.floor(v / width).toLong)
        .view.mapValues(_.size.toLong).toSeq
      val jvm = Sketches.histQuantiles(hist, width, qs)
      assert(jvm.size == batch.size, s"case $ci: row counts differ")
      for ((q, est, n) <- jvm) {
        val b = batch((winStart, q))
        assert((est, n) == b, s"case $ci q=$q: jvm ($est,$n) != batch $b")
      }
    }
  }

  test("state is histogram-bounded: bins, not rows")(
    // 100k rows over a bounded value range must produce <= range/width
    // cells - the memory law that justifies the sketch in a stream
    assert({
      var counts = Map.empty[Long, Long]
      (0 until 100000).foreach { i =>
        val bin = math.floor((i % 500) / width).toLong
        counts = counts.updated(bin, counts.getOrElse(bin, 0L) + 1L)
      }
      counts.size
    } <= 50))
}
