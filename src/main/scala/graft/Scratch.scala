package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the catalog). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
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
    def time(name: String, reps: Int = 4)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def timeJob(name: String, reps: Int = 4)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.limit(1).count()

    // q152 decomposition
    timeJob("q152_q49_checkpoint") {
      graft.queries.TextQueries.q49LmLogprob(spark, sfDir).localCheckpoint().count()
    }
    timeJob("q152_q49_plus_rank") {
      val scored = graft.queries.TextQueries.q49LmLogprob(spark, sfDir).localCheckpoint()
      val n = scored.count()
      graft.operators.GlobalRank.withRowNumber(
        scored, Seq(col("nll"), col("doc_id")), "rk")
        .write.mode("overwrite").format("noop").save()
    }
    time("q152_full")(graft.queries.TextQueries.q152PerplexityBuckets(spark, sfDir))
    time("q146_full")(graft.queries.TextQueries.q146DsirResample(spark, sfDir))
    timeJob("q146_census_only") {
      val B = graft.queries.TextQueries.DsirBuckets
      d.select(col("lang"), explode(graft.functions.TextFunctions.whitespaceTokens(col("text"))).as("tok"))
        .select(col("lang"), (graft.functions.TextFunctions.md5Hash60(col("tok")) % B).as("b"))
        .groupBy("b").agg(count(lit(1)).as("r"),
          count(when(col("lang") === "en", 1)).as("t"))
        .collect()
    }

    // A/B: persist+count vs eager localCheckpoint for q152's staging
    def rank152(stage: DataFrame => (DataFrame, Long)): DataFrame = {
      val (scored, n) = stage(graft.queries.TextQueries.q49LmLogprob(spark, sfDir))
      val base = n / 3; val rem = n % 3
      val ranked = graft.operators.GlobalRank.withRowNumber(
        scored, Seq(col("nll"), col("doc_id")), "rk")
      ranked.withColumn("bucket", expr(
        s"""CAST(IF(rk <= ${rem * (base + 1)}, (rk - 1) DIV ${base + 1} + 1,
           |$rem + (rk - 1 - ${rem * (base + 1)}) DIV ${math.max(base, 1L)} + 1) AS BIGINT)""".stripMargin))
        .orderBy("doc_id")
    }
    time("q152_persist", 6)(rank152 { df => val s0 = df.persist(); (s0, s0.count()) })
    time("q152_ckpt", 6)(rank152 { df => val s0 = df.localCheckpoint(); (s0, s0.count()) })
    time("q152_q49_only", 6)(graft.queries.TextQueries.q49LmLogprob(spark, sfDir))

    // q97 decomposition
    import graft.functions.TextFunctions._
    val toks97 = whitespaceTokens(col("text"))
    val K = graft.queries.TextQueries.ShingleDupK
    time("q97_scan_explode_only", 5) {
      d.select(col("source"), explode(shingleHashes60(toks97, K)).as("h"))
        .groupBy().agg(count(lit(1)).as("c"))
    }
    time("q97_census_h_groupby", 5) {
      d.select(lit(1L).as("m"), explode(shingleHashes60(toks97, K)).as("h"))
        .groupBy("h").agg(bit_or(col("m")).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("cnt"))
    }
    time("q97_full", 5)(graft.queries.TextQueries.q97SourceOverlap(spark, sfDir))

    // q88 A/B: round-9 window form vs round-10 census-join form
    import org.apache.spark.sql.expressions.Window
    def q88window(): DataFrame =
      d.select(col("doc_id"), whitespaceTokens(col("text")).as("l"))
        .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
        .repartition(col("token"))
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("tf"),
          array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
        .select("token", "doc_id", "tf", "positions", "df")
        .orderBy("token", "doc_id")
    time("q88_window_r9", 5)(q88window())
    time("q88_censusjoin_r10", 5)(graft.queries.TextQueries.q88InvertedIndex(spark, sfDir))

    // q42 multi-table LSH recall experiment
    {
      import graft.operators.Similarity
      val sfq = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
      val e = spark.read.parquet(s"$sfq/embeddings.parquet")
      val exact = Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 20), 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((tables, bits) <- Seq((1,4),(2,4),(4,4),(8,4),(2,6),(4,6),(2,8),(4,8))) {
        val tot = tables * bits
        val c = e.select(col("vec_id"), Similarity.lshSignature(
          org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")), tot).as("sig"))
        val tcol = explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), shiftright(col("sig"), t * bits).mod(lit(1 << bits)).as("s"))): _*))
        val cb = c.select(col("vec_id"), tcol.as("ts")).select(col("vec_id"), col("ts.t"), col("ts.s"))
        val qb = cb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("t"), col("s"))
        val cand = cb.join(qb, Seq("t", "s"))
          .filter(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id")).distinct()
        val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // rank candidates by true cosine, take top5 per query
        val hits = exact.count(candSet.contains)   // upper bound on recall numerator if k>=5 candidates kept
        val nCand = candSet.size
        println(f"[scratch] q42 tables=$tables bits=$bits candPairs=$nCand%6d exactHitsInCand=$hits/${exact.size}")
      }
    }

    // new q42 final recall@5 at this SF
    {
      import graft.operators.Similarity
      val sfq = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val e2 = spark.read.parquet(s"$sfq/embeddings.parquet")
      val qv = e2.filter(col("vec_id") < 20)
      val ex2 = Similarity.bruteForceKnn(e2, qv, 5).select("query_id","neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((t, b, mp) <- Seq((8, 4, false), (1, 4, true))) {
        val got = Similarity.signLshKnn(e2, qv, 5, bits = b, tables = t, multiProbe = mp)
          .select("query_id","neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[scratch] q42recall tables=$t bits=$b mp=$mp recall@5=${ex2.count(got.contains) / ex2.size.toDouble}%.2f")
      }
    }
    spark.stop()
  }
}
