package graft

import org.apache.spark.sql.SparkSession

/** r15 audit: walk every catalog query's plan and report generated
  * whole-stage-codegen units near janino's 64 KB method limit — the
  * silent-interpretation disease q42's composed signature had (80 KB
  * generated, stage quietly interpreted, 95% of the 100x wall time).
  * Run at sf0.001 (plan shapes are SF-independent).
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-codegen-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false") // AQE wraps the plan; codegenToSeq sees nothing
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.debug._
    val limit = 60000 // report anything within sight of janino's 65535
    var worst = List.empty[(String, Int)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // third element = CodeStats from an actual janino compile:
        // maxMethodCodeSize = -1 means the unit FAILED to compile and
        // the stage will run interpreted (the q42 disease)
        val units = df.queryExecution.debug.codegenToSeq()
        val srcMax = if (units.isEmpty) 0 else units.map(_._2.length).max
        val byteMax = units.map(_._3.maxMethodCodeSize) match {
          case s if s.isEmpty => 0
          case s => s.max
        }
        val failed = units.exists(_._3.maxMethodCodeSize < 0)
        worst ::= (name, srcMax)
        if (failed) println(s"[audit] FAILED-COMPILE $name (src $srcMax)")
        else if (byteMax > 8000)
          println(s"[audit] HUGE-METHOD $name maxMethodBytecode=$byteMax (src $srcMax; >8k disables JIT)")
      } catch { case e: Throwable =>
        println(s"[audit] SKIP $name: ${Option(e.getMessage).getOrElse(e).toString.take(80)}")
      }
    }
    println("[audit] top 10 by codegen unit size:")
    worst.sortBy(-_._2).take(10).foreach { case (n, s) =>
      println(f"[audit]   $s%6d  $n")
    }
    spark.stop()
  }
}
