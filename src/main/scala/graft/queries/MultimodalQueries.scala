package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal queries over REAL encoded payloads (MediaCodec: BMP/WAV/
  * GFV1). q60 oracle-checks the binary-column pipeline — every payload
  * size is closed-form in the document's UTF-8 byte length (BMP:
  * 54 + 48·rows; WAV: 44 + 2·samples; GFV1: fixed 1008), so DuckDB
  * reproduces the exact byte accounting without decoding. q61 runs the
  * full batch-shaped decode+feature pass (real pixel/sample decode →
  * rows-only check; exact feature values for known payloads are
  * asserted in MultimodalSpec).
  */
object MultimodalQueries {

  // ---------------------------------------------------------------- q60
  /** Byte-volume rollup per modality over the binary media table. */
  def q60MediaBytes(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_media"),
        sum(length(col("content"))).as("total_bytes"),
        min(length(col("content"))).cast("long").as("min_bytes"),
        max(length(col("content"))).cast("long").as("max_bytes"))
      .orderBy("modality")

  // encoded sizes, closed-form per modality (n = utf-8 byte length):
  //   image: 16-wide 24-bit BMP, rows = max(ceil(n/48), 1) → 54 + 48·rows
  //   audio: 16-bit mono WAV, samples = ceil(n/2)          → 44 + 2·samples
  //   video: GFV1 of four 8×8 BMPs (246 each)              → 8 + 16 + 4·246
  val q60Sql: String =
    """SELECT modality, count(*) AS n_media,
      |  CAST(sum(sz) AS BIGINT) AS total_bytes,
      |  CAST(min(sz) AS BIGINT) AS min_bytes,
      |  CAST(max(sz) AS BIGINT) AS max_bytes
      |FROM (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS modality,
      |    CASE WHEN doc_id % 3 = 0
      |           THEN 54 + 48 * greatest((octet_length(encode(text)) + 47) // 48, 1)
      |         WHEN doc_id % 3 = 1
      |           THEN 44 + 2 * ((octet_length(encode(text)) + 1) // 2)
      |         ELSE 1008 END AS sz
      |  FROM documents)
      |GROUP BY modality ORDER BY modality""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Full batch-shaped decode + feature extraction (stub codec), rolled
    * up per modality: mean first-bin weight and mean payload size. */
  def q61MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables(spark, dir).documents))
    feats
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(element_at(col("features"), 7)).as("bin7_mass"))
      .orderBy("modality")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_media_bytes"    -> (q60MediaBytes _),
    "q61_media_features" -> (q61MediaFeatures _)
  )

  val oracles: Map[String, String] = Map(
    "q60_media_bytes" -> q60Sql
  )
}
