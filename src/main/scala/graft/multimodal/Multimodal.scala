package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batch-shaped partition
  * passes.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[stubDecode]]); everything
  * Spark-side — schema, partition-batch iteration, feature shapes,
  * column pruning — is real and tested. Swapping the stub for a JNI/
  * native decoder changes one function, not the pipeline.
  *
  * Scale notes: payloads travel ONLY through narrow mapPartitions
  * passes — no shuffle ever carries the binary column; aggregations
  * happen after projection to small feature vectors. `repartitionForIo`
  * right-sizes partitions by payload bytes, the knob that matters when
  * rows are megabytes not kilobytes.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Build a media table from the documents table (texts as fake
    * payloads) — the deterministic stand-in for an object-store scan of
    * real media. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** Right-size partitions by cumulative payload bytes so executors get
    * ~`targetBytes` of media each regardless of row count. */
  def repartitionForIo(media: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    // sum() is null on empty/all-null input — treat as zero bytes
    val total = Option(media.agg(sum(length(col("content")))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val parts = math.max(1, math.min(10000, (total / targetBytes).toInt + 1))
    media.repartition(parts)
  }

  /** STUB DECODE — the container ships no codecs. Deterministic fake:
    * "decodes" a payload to (n_bytes, a 16-bin byte histogram). A real
    * deployment replaces this body with the codec call; the partition-
    * batch shape and output schema stay identical. */
  def stubDecode(payload: Array[Byte]): (Int, Array[Long]) = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1; i += 1 }
    (payload.length, hist)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Decode + feature-extract in one batch-shaped partition pass
    * (the Scala analogue of a pandas-batch UDF): iterate rows inside a
    * partition, emit fixed-width L1-normalized histogram features. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "modality", "content").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("content"))
            .getOrElse(Array.emptyByteArray)
          val (n, hist) = stubDecode(payload)
          val tot = math.max(1L, hist.sum).toDouble
          Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
            n, hist.map(_ / tot).toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** STUB RESIZE — plumbing-only: a real impl transforms pixels; the
    * stub truncates payloads, preserving schema and batch shape. */
  def stubResize(media: DataFrame, maxBytes: Int = 1024): DataFrame =
    media.withColumn("content",
      expr(s"substring(content, 1, $maxBytes)").cast(BinaryType))

  /** STUB FRAME SAMPLE — emits k evenly-spaced "frames" (payload
    * slices) per video row; explode happens AFTER slicing so the
    * shuffle-free narrow shape is preserved. */
  def stubFrameSample(media: DataFrame, k: Int = 4): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("frame_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("frame",
        expr(s"substring(content, frame_idx * greatest(length(content) DIV $k, 1) + 1, " +
          s"greatest(length(content) DIV $k, 1))").cast(BinaryType))
      .select("media_id", "frame_idx", "frame")
}
