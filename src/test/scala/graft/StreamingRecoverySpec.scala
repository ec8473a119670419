package graft

import java.nio.file.{Files, Path}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Checkpoint recovery: the same hourlyRollup query, stopped and
  * restarted from its checkpoint over a file source, must behave as one
  * continuous query — no lost or duplicated windows. This is the
  * operational property that makes a streaming pipeline production-safe
  * (exactly-once sink semantics via checkpointed offsets + state). */
class StreamingRecoverySpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def writeBatch(dir: Path, name: String, rows: Seq[(String, String, Double)]): Unit = {
    val content = rows.map { case (ts, et, v) => s"""{"ts":"$ts","event_type":"$et","value":$v}""" }
      .mkString("\n")
    // write-then-rename so the file source never sees partial files
    val tmp = dir.resolve(s".$name.tmp"); val dst = dir.resolve(name)
    Files.writeString(tmp, content); Files.move(tmp, dst)
  }

  test("windowed aggregation survives stop + restart from checkpoint") {
    val root = Files.createTempDirectory("graft-recovery")
    val in = root.resolve("in"); Files.createDirectories(in)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString

    // parquet sink: fault-tolerant via its file manifest (the memory
    // sink cannot recover from a checkpoint)
    def start() = EventStreams.hourlyRollup(
        spark.readStream.schema(schema).json(in.toString), watermark = "30 minutes")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .start()

    def readOut() = spark.read.schema(
        "window_start TIMESTAMP, event_type STRING, n_events BIGINT, total_value DOUBLE")
      .parquet(outDir)

    // phase 1: two events in hour 0, watermark pushed past hour 0
    writeBatch(in, "b1.json", Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:20:00", "click", 2.0)))
    val q1 = start()
    q1.processAllAvailable()
    writeBatch(in, "b2.json", Seq(("2024-01-01 03:00:00", "click", 4.0)))
    q1.processAllAvailable()
    val afterPhase1 = readOut().count()
    q1.stop()

    // phase 2: restart from the checkpoint; more data closes hour 3
    writeBatch(in, "b3.json", Seq(("2024-01-01 03:10:00", "buy", 8.0)))
    writeBatch(in, "b4.json", Seq(("2024-01-01 09:00:00", "click", 0.0)))
    val q2 = start()
    q2.processAllAvailable()
    val rows = readOut()
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    q2.stop()

    // hour 0 was emitted exactly once (in phase 1, not re-emitted)
    val hour0 = rows.filter(_._1 == java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(hour0 == Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click", 2L, 3.0)),
      s"hour-0 rows: $hour0")
    assert(afterPhase1 >= 1) // it really was emitted before the restart
    // hour 3 was assembled ACROSS the restart: click from phase 1,
    // buy from phase 2, both present exactly once
    val hour3 = rows.filter(_._1 == java.sql.Timestamp.valueOf("2024-01-01 03:00:00")).toSet
    assert(hour3 == Set(
      (java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), "click", 1L, 4.0),
      (java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), "buy", 1L, 8.0)),
      s"hour-3 rows: $hour3")
  }
}
