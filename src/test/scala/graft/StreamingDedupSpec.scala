package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming dedup drops repeats within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")

    val q = EventStreams.streamingDedup(events)
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()

    input.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(0), "a-dup"))
    q.processAllAvailable()
    // retransmission with a FRESH timestamp must also be dropped
    input.addData((1L, ts(5), "a-retry"), (3L, ts(2), "c"))
    q.processAllAvailable()
    val ids = spark.table("dedup").select("event_id")
      .as[Long].collect().sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 2L, 3L)) // each id exactly once
  }
}
