package graft

import java.util.Locale

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** r19 scratch: instrument q82's in-sweep bimodality.
  *
  * Runs a named catalog query N times in one JVM with Bench's exact
  * between-run cleanup, printing per-rep wall seconds plus the rep's
  * aggregate task metrics (executor run time, JVM GC time, shuffle
  * fetch wait, shuffle bytes, spill) from a SparkListener — the numbers
  * that tell a GC-bound slow rep from a fetch-bound or recompute-bound
  * one. DELETE BEFORE ROUND CLOSE (lives in tools/ afterwards).
  *
  * Usage: runMain graft.ScratchR19 <query> <reps>
  */
object ScratchR19 {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q82_setsim_join"
    val reps = if (args.length > 1) args(1).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scratch-r19")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-rep task-metric accumulator, keyed by stage
    case class St(var run: Long = 0, var cpu: Long = 0, var gc: Long = 0,
      var tasks: Int = 0, var rows: Long = 0, var name: String = "")
    object M {
      var run, gc, fetch, shRead, shWrite, spillMem, spillDisk, tasks, cpu = 0L
      var stages = 0
      val perStage = scala.collection.mutable.LinkedHashMap[Int, St]()
      def reset(): Unit = { run = 0; gc = 0; fetch = 0; shRead = 0; shWrite = 0
        spillMem = 0; spillDisk = 0; tasks = 0; cpu = 0; stages = 0
        perStage.clear() }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) M.synchronized {
          M.tasks += 1
          M.run += m.executorRunTime
          M.cpu += m.executorCpuTime / 1000000L
          M.gc += m.jvmGCTime
          M.fetch += m.shuffleReadMetrics.fetchWaitTime
          M.shRead += m.shuffleReadMetrics.totalBytesRead
          M.shWrite += m.shuffleWriteMetrics.bytesWritten
          M.spillMem += m.memoryBytesSpilled
          M.spillDisk += m.diskBytesSpilled
          val st = M.perStage.getOrElseUpdate(t.stageId, St())
          st.run += m.executorRunTime
          st.cpu += m.executorCpuTime / 1000000L
          st.gc += m.jvmGCTime
          st.tasks += 1
          st.rows += m.outputMetrics.recordsWritten +
            m.shuffleWriteMetrics.recordsWritten
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        M.synchronized {
          M.stages += 1
          M.perStage.get(s.stageInfo.stageId)
            .foreach(_.name = s.stageInfo.name.take(60))
        }
    })

    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def driverGcMs: Long = {
      var t = 0L; gcBeans.forEach(b => t += b.getCollectionTime); t
    }
    def cgCompiles: (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount, m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    }

    def f(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)
    // table warm-up like Bench
    Seq("lineitem", "orders", "events", "documents", "embeddings", "part",
      "customer", "supplier", "nation", "region").foreach { t =>
      try { spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count(); () }
      catch { case _: Throwable => () }
    }
    println(s"rep\twall_s\ttask_run_s\ttask_cpu_s\ttask_gc_s\tfetch_s\tsh_read_mb\tsh_write_mb\tspill_mb\ttasks\tstages\tdrv_gc_ms")
    (1 to reps).foreach { i =>
      M.synchronized(M.reset())
      val g0 = driverGcMs
      val c0 = cgCompiles._1
      val t0 = System.nanoTime()
      @volatile var done = false
      val watchdog = new Thread(() => {
        val limitMs = sys.env.getOrElse("SCRATCH_DUMP_AFTER_MS", "0").toLong
        if (limitMs > 0) {
          Thread.sleep(limitMs)
          if (!done) {
            val sb = new StringBuilder
            (1 to 3).foreach { d =>
              sb.append(s"==== dump $d (t+${limitMs + (d - 1) * 1000}ms) ====\n")
              Thread.getAllStackTraces.forEach { (th, st) =>
                if (st.nonEmpty && th.getName.startsWith("Executor task launch")) {
                  sb.append(s"-- ${th.getName} state=${th.getState}\n")
                  st.take(25).foreach(f => sb.append(s"   $f\n"))
                }
              }
              Thread.sleep(1000)
            }
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"/tmp/scratch_dump_rep$i.txt"),
              sb.toString.getBytes("UTF-8"))
          }
        }
      })
      watchdog.setDaemon(true); watchdog.start()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      done = true
      if (sys.env.get("SCRATCH_PLANS").contains("1")) {
        val p = df.queryExecution.executedPlan.toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/tmp/scratch_plan_rep$i.txt"),
          p.getBytes("UTF-8"))
      }
      if (sys.env.get("SCRATCH_CG").contains("1")) {
        val top = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        val codes = org.apache.spark.sql.execution.debug.codegenStringSeq(top)
        codes.zipWithIndex.foreach { case ((_, code, _), j) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"/tmp/scratch_cg_rep${i}_unit$j%02d.java"),
            code.getBytes("UTF-8"))
        }
      }
      // give listener events a beat to drain
      Thread.sleep(300)
      val g1 = driverGcMs
      M.synchronized {
        println(s"$i\t${f(dt)}\t${f(M.run / 1e3)}\t${f(M.cpu / 1e3)}\t${f(M.gc / 1e3)}\t${f(M.fetch / 1e3)}\t" +
          s"${M.shRead / 1048576}\t${M.shWrite / 1048576}\t${(M.spillMem + M.spillDisk) / 1048576}\t${M.tasks}\t${M.stages}\t${g1 - g0}\tcg=${cgCompiles._1 - c0}")
        if (sys.env.get("SCRATCH_STAGES").contains("1"))
          M.perStage.toSeq.sortBy(-_._2.run).take(6).foreach { case (id, s) =>
            println(f"    stage $id%4d run ${s.run / 1e3}%7.3f cpu ${s.cpu / 1e3}%7.3f gc ${s.gc / 1e3}%6.3f tasks ${s.tasks}%4d rows ${s.rows}%9d  ${s.name}")
          }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    Tables.clear(spark)
    spark.stop()
  }
}
