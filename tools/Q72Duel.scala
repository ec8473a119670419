package graft

import java.util.Locale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Throwaway r15 duel: q72's stage stack (separate flagEst/allEst agg
  * branches + two localCheckpoints) vs the ORACLE's own shape — union
  * the per-flag register frame with its 'ALL' relabeling, ONE merge
  * agg, ONE estimate agg — with checkpoint variants. All variants are
  * bit-identical (merge over already-unique (flag,bucket) rows is the
  * identity for the per-flag scopes).
  */
object Q72Duel {

  def oracleShape(spark: SparkSession, dir: String,
                  chkD: Boolean, chkRegs: Boolean): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val d0 = li.select(col("l_returnflag"), col("l_partkey")).distinct()
    val d = if (chkD) d0.localCheckpoint() else d0
    val pf0 = Sketches.hllRegisters(d, col("l_partkey"), Seq("l_returnflag"))
    val perFlag = if (chkRegs) pf0.localCheckpoint() else pf0
    val regs = perFlag.select(col("l_returnflag").as("scope"),
        col("__hll_bucket"), col("__hll_m"))
      .unionByName(perFlag.select(lit("ALL").as("scope"),
        col("__hll_bucket"), col("__hll_m")))
    val est = Sketches.hllEstimateRegisters(
      Sketches.hllMergeRegisters(regs, Seq("scope")), Seq("scope"))
    val exact = d.groupBy(col("l_returnflag").as("scope"))
      .agg(count(lit(1)).as("exact_distinct"))
      .unionByName(d.select("l_partkey").distinct()
        .agg(count(lit(1)).as("exact_distinct"))
        .select(lit("ALL").as("scope"), col("exact_distinct")))
    est.join(exact, Seq("scope"))
      .select(col("scope"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"),
        round(abs(col("hll_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("scope")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-q72duel")
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
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "A_current" -> (() => graft.queries.SketchQueries.q72HllMerge(spark, sfDir)),
      "B_oracle_chk2" -> (() => oracleShape(spark, sfDir, chkD = true, chkRegs = true)),
      "C_oracle_chkD" -> (() => oracleShape(spark, sfDir, chkD = true, chkRegs = false)),
      "D_oracle_nochk" -> (() => oracleShape(spark, sfDir, chkD = false, chkRegs = false)))
    val ref = variants.head._2().collect().map(_.toSeq).toSeq
    variants.tail.foreach { case (n, f) =>
      val got = f().collect().map(_.toSeq).toSeq
      println(s"[q72] $n identical to current: ${got == ref}")
    }
    val reps = 7
    val times = collection.mutable.LinkedHashMap[String, Vector[Double]]()
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        times(n) = times.getOrElse(n, Vector()) :+ time(f())
      }
    }
    println(s"[q72] calib ${fmt(HostCalib.seconds(spark))}")
    times.foreach { case (n, ts) =>
      val w = ts.drop(1).sorted
      println(s"[q72] $n min=${fmt(w.head)} med=${fmt(w(w.size / 2))} " +
        s"all=${ts.map(fmt).mkString(",")}")
    }
    spark.stop()
  }
}
