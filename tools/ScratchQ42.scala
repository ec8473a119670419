package graft

import java.util.Locale
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Throwaway r15 stage decomposition for q42's bucket cap at 100x.
  *
  * The wide-window cap (rank the exploded corpus rows carrying emb)
  * measured WORSE than uncapped at 100x in the r15 crossover (61.6s
  * vs r14's 34.6s): the window shuffles ~900MB of embedding bytes.
  * Variants, all semantically identical (kept set is a function of
  * ids):
  *   A uncapped            — r14 baseline shape
  *   B wideCap             — current: window over wide exploded rows
  *   C skinnyChk           — localCheckpoint the (id, emb, nrm, sig)
  *                           frame once, window over skinny (id,t,s),
  *                           rejoin emb by id: shuffle ids not vectors
  * Usage: SPARK_GRAFT_Q42_DIR=<corpus dir> sbt "runMain graft.ScratchQ42"
  */
object ScratchQ42 {

  def lshVariant(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int,
                 tables: Int, cap: Option[Int], skinny: Boolean): DataFrame = {
    val dim = 64
    val slice = (sig: Column, t: Int) =>
      if (tables == 1) sig
      else shiftright(sig, t * bits).mod(lit(1L << bits))
    val c0raw = corpus.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("emb"))
      .withColumn("sigAll", Similarity.lshSignature(col("emb"), tables * bits, dim))
      .withColumn("nrm", Similarity.l2Norm(col("emb")))
    val c0 = if (skinny) c0raw.localCheckpoint() else c0raw
    val explodeTs = (df: DataFrame, cols: Seq[Column]) => df
      .withColumn("ts", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), slice(col("sigAll"), t).as("s"))): _*)))
      .select(cols ++ Seq(col("ts.t").as("t"), col("ts.s").as("s")): _*)
    val cAll = explodeTs(c0, Seq(col("vec_id"), col("emb"), col("nrm")))
    val wB = Window.partitionBy("t", "s").orderBy(col("vec_id").asc)
    val c = cap match {
      case None => cAll
      case Some(cp) if !skinny =>
        cAll.withColumn("bn", row_number().over(wB))
          .filter(col("bn") <= cp).drop("bn")
      case Some(cp) =>
        val kept = explodeTs(c0, Seq(col("vec_id")))
          .withColumn("bn", row_number().over(wB))
          .filter(col("bn") <= cp)
          .select("vec_id", "t", "s")
        kept.join(c0.select(col("vec_id"), col("emb"), col("nrm")), Seq("vec_id"))
          .select(col("vec_id"), col("emb"), col("nrm"), col("t"), col("s"))
    }
    val qBase = queries.select(col("vec_id").as("query_id"),
        Similarity.asDouble(col("embedding")).as("q_emb"))
      .withColumn("sigAll", Similarity.lshSignature(col("q_emb"), tables * bits, dim))
      .withColumn("q_nrm", Similarity.l2Norm(col("q_emb")))
    val q = qBase
      .withColumn("ts", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), slice(col("sigAll"), t).as("s"))): _*)))
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        col("ts.t").as("t"), col("ts.s").as("s"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val joined = c.join(q, Seq("t", "s"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        col("vec_id").as("neighbor_id"), col("emb"), col("nrm"))
    val once = if (tables == 1) joined
      else joined.dropDuplicates("query_id", "neighbor_id")
    once
      .withColumn("cos_sim",
        Similarity.dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm")))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_Q42_DIR",
      "/tmp/graft_scale/_root_testdata_sf0.1_v3_x100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scratch-q42")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val qs = e.filter(col("vec_id") < 20)
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
    // stage decomposition pieces (same construction as lshVariant)
    val tables = 8; val bits = 4
    def slice(sig: Column, t: Int): Column =
      shiftright(sig, t * bits).mod(lit(1L << bits))
    def c0() = e.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("emb"))
      .withColumn("sigAll", Similarity.lshSignature(col("emb"), tables * bits, 64))
      .withColumn("nrm", Similarity.l2Norm(col("emb")))
    def cAll() = c0()
      .withColumn("ts", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), slice(col("sigAll"), t).as("s"))): _*)))
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("ts.t").as("t"), col("ts.s").as("s"))
    def cCapped() = {
      val wB = Window.partitionBy("t", "s").orderBy(col("vec_id").asc)
      cAll().withColumn("bn", row_number().over(wB))
        .filter(col("bn") <= 2048).drop("bn")
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "S1_c0" -> (() => c0()),
      "S2_cAll" -> (() => cAll()),
      "S3_cCapped" -> (() => cCapped()),
      "A_uncapped" -> (() => lshVariant(e, qs, 5, 4, 8, None, skinny = false)),
      "B_wideCap" -> (() => lshVariant(e, qs, 5, 4, 8, Some(2048), skinny = false)),
      "C_skinnyChk" -> (() => lshVariant(e, qs, 5, 4, 8, Some(2048), skinny = true)))
    // equivalence check (B vs C must match exactly; A differs under cap)
    val vmap = variants.toMap
    val b = vmap("B_wideCap")().collect().map(_.toSeq).toSet
    val cOut = vmap("C_skinnyChk")().collect().map(_.toSeq).toSet
    println(s"[q42] B==C: ${b == cOut} (|B|=${b.size}, |C|=${cOut.size})")
    val reps = 4
    val times = collection.mutable.LinkedHashMap[String, Vector[Double]]()
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        times(n) = times.getOrElse(n, Vector()) :+ time(f())
      }
    }
    println(s"[q42] calib ${fmt(HostCalib.seconds(spark))}")
    times.foreach { case (n, ts) =>
      val w = ts.drop(1).sorted
      println(s"[q42] $n min=${fmt(w.head)} med=${fmt(w(w.size / 2))} " +
        s"all=${ts.map(fmt).mkString(",")}")
    }
    spark.stop()
  }
}
