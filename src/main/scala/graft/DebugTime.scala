package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
        if (dur.exists(_ > 400)) {
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"dur=${dur.getOrElse(-1L)}ms cpu=${m.executorCpuTime / 1000000}ms " +
            f"gc=${m.jvmGCTime}ms shufR=${m.shuffleReadMetrics.recordsRead} " +
            f"shufW=${m.shuffleWriteMetrics.recordsWritten}")
        }
      }
    })

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (q <- args) {
      t(s"$q (1)")(noop(SparkEntry.queries(q)(spark, sfDir)))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      t(s"$q (2)")(noop(SparkEntry.queries(q)(spark, sfDir)))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
