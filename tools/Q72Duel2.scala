package graft.tools

import java.util.Locale
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{HostCalib, Tables}
import graft.Checkpoints._
import graft.operators.Sketches

/** r17 duel (standing carousel rule fired: q72 over 2x warm in BOTH
  * same-HEAD pairings, 2.132x/2.236x): the committed r15 shape (dedup
  * (flag,partkey) -> checkpoint -> registers -> union+merge -> estimate
  * -> exact branches incl. a SECOND wide dedup on partkey -> join) vs a
  * ONE-wide-exchange form: groupBy(partkey).agg(collect_set(flag)) —
  * exploded pairs are unique by construction so the register agg
  * carries exact counts (q64's fusion), the ALL row keeps the genuine
  * hllMergeRegisters demonstration, and the ALL exact is count(*) of
  * the grouped frame. Adopt only on a clear win with bit-identical
  * output. */
object Q72Duel2 {

  /** The r15-r16 committed shape, verbatim. */
  def q72Old(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val d = li.select(col("l_returnflag"), col("l_partkey"))
      .distinct().localCheckpointAudited()
    val perFlag = Sketches.hllRegisters(d, col("l_partkey"), Seq("l_returnflag"))
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

  def q72New(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val d = li.select(col("l_returnflag"), col("l_partkey"))
      .groupBy("l_partkey")
      .agg(collect_set(col("l_returnflag")).as("flags"))
      .localCheckpointAudited()
    val pairs = d.select(col("l_partkey"),
      explode(col("flags")).as("l_returnflag"))
    val regs = Sketches.hllRegistersUnique(pairs, col("l_partkey"),
      Seq("l_returnflag"))
    val flagRows = Sketches.hllEstimateExact(regs, Seq("l_returnflag"))
      .select(col("l_returnflag").as("scope"), col("hll_distinct"),
        col("hll_buckets_used"), col("exact_distinct"))
    val allEst = Sketches.hllEstimateRegisters(
      Sketches.hllMergeRegisters(
        regs.select(lit("ALL").as("scope"),
          col("__hll_bucket"), col("__hll_m")), Seq("scope")),
      Seq("scope"))
    val allRow = allEst.crossJoin(
        d.agg(count(lit(1)).as("exact_distinct")))
      .select(col("scope"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"))
    flagRows.unionByName(allRow)
      .select(col("scope"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"),
        round(abs(col("hll_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("scope")
  }

  /** q72New without the checkpoint — is the one-exchange frame's
    * double consumption (register path + 1-row count) cheaper re-run
    * than materialized? */
  def q72NewNoCkpt(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val d = li.select(col("l_returnflag"), col("l_partkey"))
      .groupBy("l_partkey")
      .agg(collect_set(col("l_returnflag")).as("flags"))
    val pairs = d.select(col("l_partkey"),
      explode(col("flags")).as("l_returnflag"))
    val regs = Sketches.hllRegistersUnique(pairs, col("l_partkey"),
      Seq("l_returnflag"))
    val flagRows = Sketches.hllEstimateExact(regs, Seq("l_returnflag"))
      .select(col("l_returnflag").as("scope"), col("hll_distinct"),
        col("hll_buckets_used"), col("exact_distinct"))
    val allEst = Sketches.hllEstimateRegisters(
      Sketches.hllMergeRegisters(
        regs.select(lit("ALL").as("scope"),
          col("__hll_bucket"), col("__hll_m")), Seq("scope")),
      Seq("scope"))
    val allRow = allEst.crossJoin(
        d.agg(count(lit(1)).as("exact_distinct")))
      .select(col("scope"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"))
    flagRows.unionByName(allRow)
      .select(col("scope"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"),
        round(abs(col("hll_distinct") - col("exact_distinct")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("scope")
  }

  /** Keep old's two wide exchanges + checkpoint; fuse ONLY the exact
    * side: per-flag exacts ride the register agg (q64's trick), the
    * est⋈exact join and the flag-exact branch delete; ALL keeps the
    * merge demo + its count from the second dedup. */
  def q72FusedLight(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val d = li.select(col("l_returnflag"), col("l_partkey"))
      .distinct().localCheckpointAudited()
    val regs = Sketches.hllRegistersUnique(d, col("l_partkey"),
      Seq("l_returnflag"))
    val flagRows = Sketches.hllEstimateExact(regs, Seq("l_returnflag"))
      .select(col("l_returnflag").as("scope"), col("hll_distinct"),
        col("hll_buckets_used"), col("exact_distinct"))
    val allEst = Sketches.hllEstimateRegisters(
      Sketches.hllMergeRegisters(
        regs.select(lit("ALL").as("scope"),
          col("__hll_bucket"), col("__hll_m")), Seq("scope")),
      Seq("scope"))
    val allRow = allEst.crossJoin(
        d.select("l_partkey").distinct().agg(count(lit(1)).as("exact_distinct")))
      .select(col("scope"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"))
    flagRows.unionByName(allRow)
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
      .appName("graft-q72duel2")
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

    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", sfDir).foreach { d =>
      val a = q72Old(spark, d).collect().toSeq
      val b = q72New(spark, d).collect().toSeq
      val c = q72NewNoCkpt(spark, d).collect().toSeq
      val l = q72FusedLight(spark, d).collect().toSeq
      require(a == b && a == c && a == l,
        s"OUTPUT DIFFERS at $d:\n old=$a\n new=$b\n nock=$c\n light=$l")
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
      time(q72Old(spark, dir)); time(q72New(spark, dir))
      time(q72NewNoCkpt(spark, dir)); time(q72FusedLight(spark, dir))
      val reps = 5
      val o = scala.collection.mutable.ArrayBuffer[Double]()
      val n = scala.collection.mutable.ArrayBuffer[Double]()
      val k = scala.collection.mutable.ArrayBuffer[Double]()
      val l = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        o += time(q72Old(spark, dir))
        n += time(q72New(spark, dir))
        k += time(q72NewNoCkpt(spark, dir))
        l += time(q72FusedLight(spark, dir))
      }
      val calib1 = HostCalib.seconds(spark)
      def stats(xs: Seq[Double]) =
        s"min=${f(xs.min)} med=${f(xs.sorted.apply(xs.size / 2))}"
      println(s"[duel] $label old:    ${stats(o.toSeq)}  (${o.map(f).mkString(",")})")
      println(s"[duel] $label new:    ${stats(n.toSeq)}  (${n.map(f).mkString(",")})")
      println(s"[duel] $label noCkpt: ${stats(k.toSeq)}  (${k.map(f).mkString(",")})")
      println(s"[duel] $label light:  ${stats(l.toSeq)}  (${l.map(f).mkString(",")})")
      println(s"[duel] $label calib $calib0 -> $calib1")
    }
    spark.stop()
  }
}
