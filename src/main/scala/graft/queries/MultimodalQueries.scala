package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing queries. q60 oracle-checks the binary-column
  * pipeline (payload sizes survive the encode → binary → length path
  * identically in both engines); q61 runs the full batch-shaped
  * decode+feature pass (stubbed codec → rows-only check; numeric
  * correctness of the histogram features is asserted in
  * MultimodalSpec).
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

  val q60Sql: String =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS modality,
      |  count(*) AS n_media,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
      |  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
      |FROM documents GROUP BY modality ORDER BY modality""".stripMargin

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
