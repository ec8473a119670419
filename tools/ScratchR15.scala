package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Throwaway r15 scratch: bucket-size census for q42's 8x4-bit LSH. */
object ScratchR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch-r15")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = 8; val bits = 4
    val e = Tables(spark, sfDir).embeddings
    println(s"corpus rows = ${e.count()}")
    val c = e.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("emb"))
      .withColumn("sigAll", Similarity.lshSignature(col("emb"), tables * bits, 64))
      .withColumn("ts", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          shiftright(col("sigAll"), t * bits).mod(lit(1L << bits)).as("s"))): _*)))
      .select(col("ts.t").as("t"), col("ts.s").as("s"))
    val census = c.groupBy("t", "s").count()
    census.agg(min("count").as("min_b"), expr("percentile(count, 0.5)").as("med_b"),
        max("count").as("max_b"), count(lit(1)).as("n_buckets")).show()
    census.orderBy(col("count").desc).show(12)
    spark.stop()
  }
}
