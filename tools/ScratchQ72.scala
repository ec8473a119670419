package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway q72 x300 decomposition (r18) — deleted after the read. */
object ScratchQ72 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch-q72")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_scale/_root_testdata_sf0.1_v3_x300"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(name: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      }
      println(f"[scratch] $name%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    println(s"[scratch] calib=${HostCalib.seconds(spark)}")
    time("scan-project-only") { li.select(col("l_returnflag"), col("l_partkey")) }
    time("dedup-only") { li.select(col("l_returnflag"), col("l_partkey")).distinct() }
    time("q72-full") { graft.queries.SketchQueries.q72HllMerge(spark, dir) }
    println(s"[scratch] calib_end=${HostCalib.seconds(spark)}")
    spark.stop()
  }
}
