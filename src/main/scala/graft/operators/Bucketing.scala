package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the pre-shuffle that pays for itself.
  *
  * At 100 TB, the dominant cost of fact-fact joins and repeated
  * aggregations is the shuffle. Writing a table bucketed (and sorted)
  * by its join/group key moves that shuffle to WRITE time, once;
  * every subsequent join or aggregation on the key runs with NO
  * exchange on the bucketed side (verified in BucketingSpec by
  * asserting the physical plan has no Exchange under the join).
  *
  * Bucket count guidance: target `table_size / bucket_count` ≈ one
  * healthy task input (128-512 MB); both sides of a co-located join
  * must agree on count and key.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (replacing any
    * previous incarnation — Overwrite alone refuses a leftover
    * location). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located equi-join of two tables previously bucketed on the same
    * key with the same bucket count — planwise shuffle-free. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
