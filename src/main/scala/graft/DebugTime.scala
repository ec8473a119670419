package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Throwaway profiling main (not part of the library surface). */
object DebugTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-debug")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          f"dur=${dur.getOrElse(-1L)}ms ${si.name.take(60)}")
      }
    })

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val keys = Tables(spark, sfDir).lineitem.select("l_partkey")
    t("scan warmup")(noop(keys))
    val build = Sketches.countMinBuild(keys, col("l_partkey"))
    t("build (1)")(build.collect())
    t("build (2)")(Sketches.countMinBuild(keys, col("l_partkey")).collect())
    val probed = Sketches.countMinProbe(keys, col("l_partkey"), build)
    t("probe eval (1)")(noop(probed))
    t("probe eval (2)")(noop(probed))
    val gated = probed.filter(col("cm_count") >= 40L)
      .groupBy("l_partkey")
      .agg(min("cm_count").as("cm_count"), count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= 40L)
      .orderBy(desc("exact_count"), col("l_partkey"))
    t("gate+agg+sort eval")(noop(gated))
    t("full q71 (1)")(noop(graft.queries.SketchQueries.q71HeavyHitters(spark, sfDir)))
    t("full q71 (2)")(noop(graft.queries.SketchQueries.q71HeavyHitters(spark, sfDir)))
    spark.stop()
  }
}
