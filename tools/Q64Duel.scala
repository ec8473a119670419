package graft

import java.util.Locale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.md5Hash60
import graft.operators.Sketches

/** Throwaway r15 duel (verdict item 6): q64's register pipeline
  * (distinct → per-(flag,bucket) max → estimate agg → exact branch →
  * join; 4 exchanges + a localCheckpoint) vs a SINGLE-EXCHANGE wide
  * register layout (distinct → one groupBy(flag) with 256 max(when)
  * aggregates + the exact count in the same pass → estimate fold over
  * the 256 columns). Interleaved reps, noop sink, same cleanup as
  * Crossover. Adopt only if the wide form wins clearly and the output
  * stays bit-identical (same estimate arithmetic over exact ints).
  */
object Q64Duel {

  def q64Wide(spark: SparkSession, dir: String): DataFrame = {
    val M = Sketches.HllBuckets
    val li = Tables(spark, dir).lineitem
    val d = li.select(col("l_returnflag"), col("l_partkey")).distinct()
    val h = md5Hash60(concat(lit("hll|"), col("l_partkey").cast("string")))
    val hashed = d.select(col("l_returnflag"), h.as("h"))
      .select(col("l_returnflag"), (col("h") % M).as("b"),
        expr(s"h DIV $M").as("w"))
    val rho = when(col("w") === 0, lit(53))
      .otherwise(lit(53) - length(bin(col("w"))))
    val rows = hashed.select(col("l_returnflag"), col("b"), rho.as("rho"))
    val aggs = (0 until M).map(b =>
      max(when(col("b") === b, col("rho"))).as(s"m$b")) :+
      count(lit(1)).as("exact_distinct")
    val wide = rows.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
    val sCol = (0 until M).map(b =>
      expr(s"shiftleft(CAST(1 AS BIGINT), 53 - coalesce(m$b, 0))"))
      .reduce(_ + _)
    val zerosCol = (0 until M).map(b =>
      when(coalesce(col(s"m$b"), lit(0)) === 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val usedCol = (0 until M).map(b =>
      when(coalesce(col(s"m$b"), lit(0)) > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    val raw = lit(Sketches.HllAlphaScaled) / sCol.cast("double")
    val est = when(raw <= lit(2.5 * M) && zerosCol > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / zerosCol.cast("double")))
      .otherwise(raw)
    wide.select(col("l_returnflag"), round(est, 4).as("hll_distinct"),
      usedCol.as("hll_buckets_used"), col("exact_distinct"),
      round(abs(round(est, 4) - col("exact_distinct")) /
        col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("l_returnflag")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-q64duel")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    def fmt(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)
    // equality check first: same rows, same bits
    val a = graft.queries.SketchQueries.q64HllDistinct(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = q64Wide(spark, sfDir).collect().map(_.toSeq).toSeq
    println(s"[duel] outputs identical: ${a == b}")
    if (a != b) { println(s"A=$a"); println(s"B=$b") }
    val reps = 6
    val ta = collection.mutable.ArrayBuffer[Double]()
    val tb = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      ta += time(graft.queries.SketchQueries.q64HllDistinct(spark, sfDir))
      tb += time(q64Wide(spark, sfDir))
    }
    println(s"[duel] calib ${fmt(HostCalib.seconds(spark))}")
    def stats(ts: Seq[Double]): String = {
      val w = ts.drop(1).sorted
      s"min=${fmt(w.head)} med=${fmt(w(w.size / 2))} all=${ts.map(fmt).mkString(",")}"
    }
    println(s"[duel] A current: ${stats(ta.toSeq)}")
    println(s"[duel] B wide1x:  ${stats(tb.toSeq)}")
    spark.stop()
  }
}
