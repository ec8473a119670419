package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named catalog queries to files.
  *
  * Usage: runMain graft.PlanDump <dataDir> <outDir> <suffix> <q1> [q2 ...]
  * Writes <outDir>/<qname>_<suffix>.txt per query. Lives in tools/ (not
  * compiled); copy under src/main/scala/graft/ to run, like Scratch.scala.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dataDir = args(0)
    val outDir  = Paths.get(args(1))
    val suffix  = args(2)
    val names   = args.drop(3).toSeq
    Files.createDirectories(outDir)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Mirror Bench's session config exactly so plans match what the
    // bench executes (AQE, graft extensions, partition count).
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val catalog = SparkEntry.queries
    names.foreach { n =>
      val df   = catalog(n)(spark, dataDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val out  = outDir.resolve(s"${n}_$suffix.txt")
      Files.write(out, plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $out (${plan.length} chars)")
    }
    spark.stop()
  }
}
