package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables(spark, sf).documents).cache()

  test("media table: schema, modality assignment, payload round-trip") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "content", "meta"))
    assert(media.select("modality").distinct().count() == 3)
    // payload decodes back to the original text
    val row = Tables(spark, sf).documents.orderBy("doc_id").first()
    val payload = media.filter(col("media_id") === row.getAs[Long]("doc_id"))
      .select("content").first().getAs[Array[Byte]](0)
    assert(new String(payload, "UTF-8") == row.getAs[String]("text"))
  }

  test("stubDecode histogram counts every byte exactly once") {
    val bytes = "hello world".getBytes("UTF-8")
    val (n, hist) = Multimodal.stubDecode(bytes)
    assert(n == bytes.length)
    assert(hist.sum == bytes.length)
    // 'h' = 0x68 → bin 6
    assert(hist(6) > 0)
  }

  test("extractFeatures: fixed width, L1-normalized, all rows present") {
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == media.count())
    val bad = feats.filter(size(col("features")) =!= 16).count()
    assert(bad == 0)
    val sums = feats.select(aggregate(col("features"), lit(0.0), (a, x) => a + x).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
    assert(sums.count() == 0) // every histogram sums to 1
  }

  test("repartitionForIo sizes partitions from payload bytes") {
    val tiny = Multimodal.repartitionForIo(media, targetBytes = 10000L)
    assert(tiny.rdd.getNumPartitions > 1)
    val one = Multimodal.repartitionForIo(media, targetBytes = Long.MaxValue >> 8)
    assert(one.rdd.getNumPartitions == 1)
  }

  test("stubResize truncates payloads but keeps schema") {
    val resized = Multimodal.stubResize(media, maxBytes = 10)
    assert(resized.schema == media.schema)
    assert(resized.filter(length(col("content")) > 10).count() == 0)
  }

  test("stubFrameSample emits k frames per video row") {
    val frames = Multimodal.stubFrameSample(media, k = 4)
    val videos = media.filter(col("modality") === "video").count()
    assert(frames.count() == 4 * videos)
    assert(frames.filter(length(col("frame")) === 0).count() == 0)
  }
}
