package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 q107 duel: committed struct-pair kernel census vs packed-code
  * census (FrequentPairCodesExpr). Moved to tools/ after the read. */
object ScratchQ107 {

  def q107Codes(spark: SparkSession, dir: String, cap: Int,
      support: Int): DataFrame = {
    val toks = graft.functions.TextFunctions.whitespaceTokens(col("text"))
    val tok = Tables(spark, dir).documents
      .select(col("doc_id"), explode(array_distinct(toks)).as("token"))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= support)
      .select("token")
    val freqHead = freq.limit(cap + 1).collect().map(_.getString(0))
    require(freqHead.length <= cap, "scratch: join tier not duelled here")
    val byUtf8 = Ordering.comparatorToOrdering(
      java.util.Comparator.comparing[String, Array[Byte]](
        (s: String) => s.getBytes("UTF-8"),
        java.util.Arrays.compareUnsigned(_, _)))
    val sortedSet = freqHead.sorted(byUtf8).toSeq
    val k = sortedSet.length
    val tokLit = typedLit(sortedSet)
    Tables(spark, dir).documents
      .select(explode(graft.plans.FrequentPairCodesExpr.column(
        toks, sortedSet)).as("code"))
      .groupBy("code").agg(count(lit(1)).as("support"))
      .filter(col("support") >= support)
      .orderBy(col("support").desc, col("code").asc)
      .limit(50)
      .select(
        element_at(tokLit, expr(s"CAST(code DIV $k AS INT) + 1")).as("tok_a"),
        element_at(tokLit, expr(s"CAST(code % $k AS INT) + 1")).as("tok_b"),
        col("support"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch-q107")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // parity first: identical rows at sf0.001 / sf0.01 / sf0.1 / x100
    val cells = Seq(
      ("/root/testdata/sf0.001", 5),
      ("/root/testdata/sf0.01", 20),
      ("/root/testdata/sf0.1", 100),
      ("/tmp/graft_scale/_root_testdata_sf0.1_v3_x100", 100 * 100))
    cells.foreach { case (dir, support) =>
      val a = graft.queries.Relational.frequentPairsTiered(spark, dir,
        graft.queries.Relational.FreqLiteralCap, support)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val b = q107Codes(spark, dir, graft.queries.Relational.FreqLiteralCap,
        support).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      require(a == b, s"PARITY FAIL at $dir: \n${a.take(5)}\nvs\n${b.take(5)}")
      println(s"[scratch] parity OK at $dir (${a.size} rows)")
      cleanup()
    }
    // interleaved duel
    println(s"[scratch] calib=${HostCalib.seconds(spark)}")
    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup(); dt
    }
    Seq(("x1", "/root/testdata/sf0.1", 100),
        ("x100", "/tmp/graft_scale/_root_testdata_sf0.1_v3_x100", 10000))
      .foreach { case (tag, dir, support) =>
        // warm-up pair
        time(graft.queries.Relational.frequentPairsTiered(spark, dir, 2048, support))
        time(q107Codes(spark, dir, 2048, support))
        val as = collection.mutable.ArrayBuffer[Double]()
        val bs = collection.mutable.ArrayBuffer[Double]()
        (1 to 5).foreach { _ =>
          as += time(graft.queries.Relational.frequentPairsTiered(spark, dir, 2048, support))
          bs += time(q107Codes(spark, dir, 2048, support))
        }
        def stats(x: Seq[Double]) = f"min=${x.min}%.3f med=${x.sorted.apply(2)}%.3f all=${x.map(t => f"$t%.2f").mkString(",")}"
        println(s"[scratch] $tag committed ${stats(as.toSeq)}")
        println(s"[scratch] $tag codes     ${stats(bs.toSeq)}")
      }
    println(s"[scratch] calib_end=${HostCalib.seconds(spark)}")
    spark.stop()
  }
}
