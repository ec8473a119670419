package graft.tools

import java.util.Locale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{HostCalib, Tables}
import graft.operators.Sketches

/** r17 duel (verdict item 3): q64's committed shape (dedup →
  * localCheckpoint → register branch + exact branch → join) vs the
  * FUSED single-pipeline form (Sketches.hllDistinctExact: dedup →
  * register agg carrying count(*) → estimate agg summing it back).
  * Interleaved reps, noop sink, the Bench/Crossover cleanup discipline.
  * Adopt only on a clear win with bit-identical output.
  */
object Q64Duel2 {

  def q64Old(spark: SparkSession, dir: String): DataFrame = {
    import graft.Checkpoints._
    val li = Tables(spark, dir).lineitem
    val d = li.select(col("l_returnflag"), col("l_partkey"))
      .distinct().localCheckpointAudited()
    val hll = Sketches.hllDistinct(d, col("l_partkey"), Seq("l_returnflag"))
    val exact = d.groupBy("l_returnflag")
      .agg(count(lit(1)).as("exact_distinct"))
    hll.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("hll_distinct"),
        col("hll_buckets_used"), col("exact_distinct"),
        round(abs(col("hll_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("l_returnflag")
  }

  def q64Fused(spark: SparkSession, dir: String): DataFrame =
    Sketches.hllDistinctExact(Tables(spark, dir).lineitem,
        col("l_partkey"), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("hll_distinct"),
        col("hll_buckets_used"), col("exact_distinct"),
        round(abs(col("hll_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("l_returnflag")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-q64duel2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def f(d: Double): String = "%.3f".formatLocal(Locale.ROOT, d)

    // parity first: bit-identical rows on all three SFs
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", sfDir).foreach { d =>
      val a = q64Old(spark, d).collect().toSeq
      val b = q64Fused(spark, d).collect().toSeq
      require(a == b, s"FUSED OUTPUT DIFFERS at $d:\n old=$a\n new=$b")
      println(s"[duel] parity OK at $d (${a.size} rows)")
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }

    val dirs = Seq("x1" -> sfDir) ++
      (if (args.contains("x10"))
        Seq("x10" -> graft.ScaleBench.ensureLineitem(spark,
          "/root/testdata/sf0.1", 10))
      else Seq.empty)
    dirs.foreach { case (label, dir) =>
      val calib0 = HostCalib.seconds(spark)
      time(q64Old(spark, dir)); time(q64Fused(spark, dir)) // warmup pair
      val reps = 5
      val old = scala.collection.mutable.ArrayBuffer[Double]()
      val fus = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        old += time(q64Old(spark, dir))
        fus += time(q64Fused(spark, dir))
      }
      val calib1 = HostCalib.seconds(spark)
      def stats(xs: Seq[Double]) =
        s"min=${f(xs.min)} med=${f(xs.sorted.apply(xs.size / 2))}"
      println(s"[duel] $label old:   ${stats(old.toSeq)}  (${old.map(f).mkString(",")})")
      println(s"[duel] $label fused: ${stats(fus.toSeq)}  (${fus.map(f).mkString(",")})")
      println(s"[duel] $label calib $calib0 -> $calib1")
    }
    spark.stop()
  }
}
