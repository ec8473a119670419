package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 q77 duel scratch (uncompiled; copy under src/ to run, like
  * Scratch.scala). Question: the pair distinct() in
  * FuzzyJoin.hammingSelfJoin re-shuffles every candidate pair with both
  * key strings, but for maxDist=1 only dist-0 pairs are ever duplicated
  * (they agree on ALL len variants; a dist-1 pair agrees on exactly the
  * one variant masking its differing position). Candidate: carry the
  * masked position p through the variant, join on (vk, p), and replace
  * the distinct with a filter that admits each pair exactly once:
  * chars-differ-at-p (dist-1 pairs, their single shared variant) OR
  * p=1 AND keys equal (dist-0 pairs, counted only at the first
  * position) OR p=0 (the short-key length-block variant).
  *
  * VERDICT (r18, clean window, calib 1.73-1.79): candidate REJECTED —
  * bit-identical (262,500 rows at sf0.1) but 2.4x SLOWER:
  *
  *   vexpS min=0.298 med=0.309   (string variants explode only)
  *   vexpP min=0.345 med=0.350   (struct variants explode only)
  *   base  min=0.976 med=0.999   (string join + id/len filters)
  *   baseP min=1.212 med=1.451   (struct join on (vk,p) + id/len)
  *   dedup min=1.395 med=1.609   (base + pair distinct)
  *   newNS min=3.712 med=4.400   (candidate WITHOUT the final orderBy)
  *   old   min=2.765 med=3.291   (current catalog form, with orderBy)
  *   new   min=6.676 med=7.045   (candidate full, with orderBy)
  *
  * Two findings, both transferable:
  * 1. The distinct was never the cost (+0.4s over the raw join). The
  *    hamming verification evaluated inside the join condition — for
  *    BOTH row orientations, before the a_id < b_id conjunct in the
  *    candidate's rewritten condition — plus the output-column
  *    recompute is the bulk of per-row work.
  * 2. The distinct's exchange is accidentally LOAD-BEARING: the final
  *    orderBy's RangePartitioning samples its child, and when the
  *    child subtree has a shuffle boundary the sample job reuses the
  *    shuffle files; without one (the candidate removed it) the sample
  *    job RE-EXECUTES the whole join pipeline, then the sort exchange
  *    executes it a third time — newNS 3.71 -> new 6.68 is exactly
  *    that 2x. Removing the "redundant" exchange doubled the work.
  */
object ScratchQ77 {
  def hammingDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""),
        (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

  def variants(df: DataFrame, side: String): DataFrame = {
    val key = s"${side}_key"
    val masked = s"overlay($key, chr(1), p1, 1)"
    val vks = s"if(length($key) < 1, " +
      s"array(md5(concat(chr(2), length($key)))), " +
      s"transform(sequence(1, length($key)), p1 -> md5($masked)))"
    df.select(col("c_custkey").as(s"${side}_id"), col("c_name").as(key))
      .select(col(s"${side}_id"), col(key), length(col(key)).as(s"${side}_len"),
        explode(expr(vks)).as("vk"))
  }

  def variantsPos(df: DataFrame, side: String): DataFrame = {
    val key = s"${side}_key"
    val vexpr =
      s"""if(length($key) < 1,
         |  array(struct(0 as p, md5(concat(chr(2), length($key))) as vk)),
         |  transform(sequence(1, length($key)),
         |    p -> struct(p as p, md5(overlay($key, chr(1), p, 1)) as vk)))""".stripMargin
    df.select(col("c_custkey").as(s"${side}_id"), col("c_name").as(key))
      .select(col(s"${side}_id"), col(key), length(col(key)).as(s"${side}_len"),
        explode(expr(vexpr)).as("v"))
      .select(col(s"${side}_id"), col(key), col(s"${side}_len"),
        col("v.p").as("p"), col("v.vk").as("vk"))
  }

  def oldForm(c: DataFrame): DataFrame =
    graft.operators.FuzzyJoin.hammingSelfJoin(c, "c_custkey", "c_name", 1)
      .orderBy("id_a", "id_b")

  def newForm(c: DataFrame): DataFrame =
    variantsPos(c, "a").join(variantsPos(c, "b"), Seq("vk", "p"))
      .filter(col("a_id") < col("b_id") && col("a_len") === col("b_len"))
      .filter(
        expr("substring(a_key, p, 1) != substring(b_key, p, 1)") ||
          (col("p") === 1 && col("a_key") === col("b_key")) ||
          col("p") === 0)
      .withColumn("dist", hammingDist(col("a_key"), col("b_key")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("dist"))
      .orderBy("id_a", "id_b")

  def baseJoin(c: DataFrame): DataFrame =
    variants(c, "a").join(variants(c, "b"), "vk")
      .filter(col("a_id") < col("b_id") && col("a_len") === col("b_len"))
      .select(col("a_id"), col("b_id"), col("a_key"), col("b_key"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("scratch-q77")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"calib_start=${HostCalib.seconds(spark)}")

    def customer = Tables(spark, dir).customer

    if (args.lift(1).contains("plans")) {
      println("==== OLD ====")
      println(oldForm(customer).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println("==== NEW ====")
      println(newForm(customer).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      spark.stop(); return
    }

    // ---- bit-identical check first (cheap corpus guard) -------------
    val a = oldForm(customer).collect().map(_.toSeq).toSeq
    val b = newForm(customer).collect().map(_.toSeq).toSeq
    println(s"EQUAL=${a == b} rows_old=${a.size} rows_new=${b.size}")
    require(a == b, "old and new q77 outputs differ — candidate DEAD")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      dt
    }
    val newNoSort = () =>
      variantsPos(customer, "a").join(variantsPos(customer, "b"), Seq("vk", "p"))
        .filter(col("a_id") < col("b_id") && col("a_len") === col("b_len"))
        .filter(
          expr("substring(a_key, p, 1) != substring(b_key, p, 1)") ||
            (col("p") === 1 && col("a_key") === col("b_key")) ||
            col("p") === 0)
        .withColumn("dist", hammingDist(col("a_key"), col("b_key")).cast("long"))
        .filter(col("dist") <= 1)
        .select(col("a_id").as("id_a"), col("b_id").as("id_b"), col("dist"))
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "vexpS" -> (() => variants(customer, "a")),          // string variants explode only
      "vexpP" -> (() => variantsPos(customer, "a")),       // struct variants explode only
      "base " -> (() => baseJoin(customer)),
      "baseP" -> (() => variantsPos(customer, "a")          // struct join, id/len filters only
        .join(variantsPos(customer, "b"), Seq("vk", "p"))
        .filter(col("a_id") < col("b_id") && col("a_len") === col("b_len"))
        .select("a_id", "b_id", "a_key", "b_key")),
      "dedup" -> (() => baseJoin(customer).distinct()),
      "newNS" -> newNoSort,
      "old  " -> (() => oldForm(customer)),
      "new  " -> (() => newForm(customer)))
    // JVM warm-up: one untimed pass of each
    forms.foreach { case (_, f) => time(f()) }
    val reps = 5
    val res = collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    for (_ <- 1 to reps; (n, f) <- forms) res(n) = res(n) :+ time(f())
    forms.foreach { case (n, _) =>
      val s = res(n).sorted
      val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"$n min=${s.head}%.3f med=$med%.3f reps=${res(n).map(x => f"$x%.2f").mkString(",")}")
    }
    println(s"calib_end=${HostCalib.seconds(spark)}")
    spark.stop()
  }
}
