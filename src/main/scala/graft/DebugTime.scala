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
        if (dur.exists(_ > 500)) {
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"dur=${dur.getOrElse(-1L)}ms cpu=${m.executorCpuTime / 1000000}ms " +
            f"run=${m.executorRunTime}ms gc=${m.jvmGCTime}ms " +
            f"deser=${m.executorDeserializeTime}ms " +
            f"shufR=${m.shuffleReadMetrics.recordsRead} " +
            f"shufW=${m.shuffleWriteMetrics.recordsWritten} " +
            f"out=${m.outputMetrics.recordsWritten}")
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

    import graft.functions.TextFunctions.whitespaceTokens
    val base = Tables(spark, sfDir).documents
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("id"),
        array_distinct(whitespaceTokens(col("text"))).as("toks"))
    t("base")(noop(base))
    val freq = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tok_freq"))
    t("freq")(noop(freq))
    val t6 = 800000L
    val ordered = base
      .select(col("id"), size(col("toks")).as("n"), explode(col("toks")).as("tok"))
      .join(freq, "tok")
      .groupBy("id", "n")
      .agg(array_sort(collect_list(struct(col("tok_freq"), col("tok"))))
        .as("ordered"))
      .withColumn("prefix_len",
        expr(s"cast(n - ((cast(n as bigint) * $t6 + 999999) DIV 1000000) + 1 as int)"))
      .select(col("id"), col("n"),
        expr("transform(slice(ordered, 1, prefix_len), s -> s.tok)").as("prefix"))
    t("ordered nocache (1)")(noop(ordered))
    t("ordered nocache (2)")(noop(ordered))
    val a = ordered.select(col("id").as("id_a"), col("n").as("n_a"),
      posexplode(col("prefix")).as(Seq("p_a", "tok_a")))
    t("a explode")(noop(a))
    val b = ordered.select(col("id").as("id_b"), col("n").as("n_b"),
      posexplode(col("prefix")).as(Seq("p_b", "tok_b")))
    val joined = a.join(b,
      col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
        col("n_b") * t6 <= col("n_a") * 1000000L &&
        col("n_a") * t6 <= col("n_b") * 1000000L)
    t("join raw")(println("[debug] joinrows=" + joined.count()))
    val agg = joined
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("o"),
        max(col("p_a")).as("lp_a"), max(col("p_b")).as("lp_b"))
      .filter((col("o") +
          least(col("n_a") - col("lp_a") - 1L, col("n_b") - col("lp_b") - 1L)) *
          (1000000L + t6) >= (col("n_a") + col("n_b")) * t6)
      .select("id_a", "id_b")
    t("agg candidates nocache")(println("[debug] cands=" + agg.count()))
    val orderedC = ordered.cache()
    val ac = orderedC.select(col("id").as("id_a"), col("n").as("n_a"),
      posexplode(col("prefix")).as(Seq("p_a", "tok_a")))
    val bc = orderedC.select(col("id").as("id_b"), col("n").as("n_b"),
      posexplode(col("prefix")).as(Seq("p_b", "tok_b")))
    val joinedC = ac.join(bc,
      col("tok_a") === col("tok_b") && col("id_a") < col("id_b") &&
        col("n_b") * t6 <= col("n_a") * 1000000L &&
        col("n_a") * t6 <= col("n_b") * 1000000L)
    t("join cached (1)")(println("[debug] joinrowsC=" + joinedC.count()))
    t("join cached (2)")(println("[debug] joinrowsC=" + joinedC.count()))
    val verified = agg
      .join(base.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("uni",
        size(col("toks_a")).cast("long") + size(col("toks_b")) - col("inter"))
      .filter(col("inter") * 1000000L >= col("uni") * t6)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
    t("verify (1)")(noop(verified))
    t("verify (2)")(noop(verified))
    t("verify+sort")(noop(verified.orderBy("id_a", "id_b")))
    t("full q82 (1)")(noop(graft.queries.TextQueries.q82SetSimJoin(spark, sfDir)))
    spark.catalog.clearCache()
    t("full q82 (2)")(noop(graft.queries.TextQueries.q82SetSimJoin(spark, sfDir)))
    spark.stop()
  }
}
