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
    def time(name: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def timeJob(name: String, reps: Int = 5)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    import graft.functions.TextFunctions._
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.limit(1).count()
    val toks = whitespaceTokens(col("text"))

    if (args.contains("q88d")) {
      def q88d(): DataFrame = {
        val grouped = d
          .select(col("doc_id"), toks.as("l"))
          .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
          .repartitionByRange(col("token"), col("doc_id"))
          .groupBy("token", "doc_id")
          .agg(count(lit(1)).as("tf"),
            array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
        val dfCensus = d
          .select(explode(array_distinct(toks)).as("token"))
          .groupBy("token").agg(count(lit(1)).as("df"))
        grouped.join(broadcast(dfCensus), Seq("token"))
          .select("token", "doc_id", "tf", "positions", "df")
          .orderBy("token", "doc_id")
      }
      graft.queries.TextQueries.q88InvertedIndex(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      cleanup()
      time("q88_shipped", 7)(graft.queries.TextQueries.q88InvertedIndex(spark, sfDir))
      time("q88_d_range_once", 7)(q88d())
      locally {
        val base = graft.queries.TextQueries.q88InvertedIndex(spark, sfDir).collect().map(_.toString)
        val dd = q88d().collect().map(_.toString)
        println(s"[scratch] q88 parity d=${base.sameElements(dd)}")
        q88d().explain("formatted")
      }
      spark.stop()
      return
    }

    if (args.contains("q97only")) {
      // warm-up
      graft.queries.TextQueries.q97SourceOverlap(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      cleanup()
      time("q97_v3_driver20_dedup", 7)(graft.queries.TextQueries.q97SourceOverlap(spark, sfDir))
      val K2 = graft.queries.TextQueries.ShingleDupK
      timeJob("q97_floor_mask_census_dedup", 7) {
        d.select(lit(1L).as("m"), explode(array_distinct(shingleHashes60(toks, K2))).as("h"))
          .groupBy("h").agg(bit_or(col("m")).as("mask"))
          .groupBy("mask").agg(count(lit(1)).as("cnt"))
          .collect()
      }
      spark.stop()
      return
    }

    // ---------------- final floor table (one session, min of 7) ----------------
    if (args.contains("floors")) {
      val R = 7
      // session warm-up
      graft.queries.TextQueries.q88InvertedIndex(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      cleanup()
      time("q88_shipped", R)(graft.queries.TextQueries.q88InvertedIndex(spark, sfDir))
      time("q88_floor_scan_explode", R) {
        d.select(col("doc_id"), toks.as("l"))
          .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
          .groupBy().agg(count(lit(1)).as("c"))
      }
      time("q88_floor_rollup", R) {
        d.select(col("doc_id"), toks.as("l"))
          .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
          .groupBy("token", "doc_id")
          .agg(count(lit(1)).as("tf"),
            array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
      }
      time("q88_floor_rollup_sorted", R) {
        d.select(col("doc_id"), toks.as("l"))
          .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
          .groupBy("token", "doc_id")
          .agg(count(lit(1)).as("tf"),
            array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
          .orderBy("token", "doc_id")
      }
      val K2 = graft.queries.TextQueries.ShingleDupK
      time("q97_shipped", R)(graft.queries.TextQueries.q97SourceOverlap(spark, sfDir))
      time("q97_floor_scan_explode", R) {
        d.select(col("source"), explode(shingleHashes60(toks, K2)).as("h"))
          .groupBy().agg(count(lit(1)).as("c"))
      }
      timeJob("q97_floor_mask_census", R) {
        d.select(lit(1L).as("m"), explode(shingleHashes60(toks, K2)).as("h"))
          .groupBy("h").agg(bit_or(col("m")).as("mask"))
          .groupBy("mask").agg(count(lit(1)).as("cnt"))
          .collect()
      }
      time("q146_shipped", R)(graft.queries.TextQueries.q146DsirResample(spark, sfDir))
      timeJob("q146_floor_census", R) {
        val B = graft.queries.TextQueries.DsirBuckets
        d.select(col("lang"), explode(toks).as("tok"))
          .select(col("lang"), (md5Hash60(col("tok")) % B).as("b"))
          .groupBy("b").agg(count(lit(1)).as("r"),
            count(when(col("lang") === "en", 1)).as("t"))
          .collect()
      }
      spark.stop()
      return
    }

    // ---------------- round 2 experiments ----------------
    if (args.contains("r2")) {
      // new q97 (driver bit-pair finish)
      time("q97_v2_driver_finish")(graft.queries.TextQueries.q97SourceOverlap(spark, sfDir))

      // q88 tighter floor: rollup + total-order sort, NO census/join
      time("q88_floor_rollup_sorted") {
        d.select(col("doc_id"), toks.as("l"))
          .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
          .groupBy("token", "doc_id")
          .agg(count(lit(1)).as("tf"),
            array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
          .orderBy("token", "doc_id")
      }

      // q146: shipped (checkpoint) vs recompute-twice (no checkpoint)
      time("q146_shipped_ckpt", 6)(graft.queries.TextQueries.q146DsirResample(spark, sfDir))
      time("q146_no_ckpt", 6) {
        val B = graft.queries.TextQueries.DsirBuckets
        val census = d.select(col("lang"), explode(toks).as("tok"))
          .select(col("lang"), (md5Hash60(col("tok")) % B).as("b"))
          .groupBy("b").agg(count(lit(1)).as("r"),
            count(when(col("lang") === "en", 1)).as("t"))
          .collect()
        val rTot = census.map(_.getLong(1)).sum
        val tTot = census.map(_.getLong(2)).sum
        val lrArr = Array.fill(B)(0.0)
        census.foreach { row =>
          val b = row.getLong(0).toInt
          lrArr(b) = math.log((row.getLong(2) + 1).toDouble / (tTot + B).toDouble) -
            math.log((row.getLong(1) + 1).toDouble / (rTot + B).toDouble)
        }
        val lrLit = array(lrArr.toIndexedSeq.map(lit): _*)
        val sortedB = sort_array(transform(toks, t => md5Hash60(t) % B))
        val wExpr = aggregate(sortedB, lit(0.0),
          (acc, b) => acc + element_at(lrLit, (b + 1).cast("int")))
        def keyed = d
          .select(col("doc_id"), col("lang"), col("source"), wExpr.as("w"))
          .withColumn("gumbel_key",
            round(col("w") - log(-log(
              (md5Hash60(concat(lit("dsir|"), col("doc_id"))) + 1).cast("double") /
                lit(1152921504606846978L).cast("double"))), 6))
        val kept = graft.operators.GlobalRank.topKBoundary(
          keyed.select("gumbel_key", "doc_id"), graft.queries.TextQueries.DsirKeep) match {
          case None => lit(1).cast("int")
          case Some((bk, bd)) =>
            (col("gumbel_key") > bk ||
              (col("gumbel_key") === bk && col("doc_id") <= bd)).cast("int")
        }
        keyed
          .select(col("doc_id"), col("lang"), col("source"),
            round(col("w"), 6).as("dsir_w"), col("gumbel_key"), kept.as("kept"))
          .orderBy("doc_id")
      }
      spark.stop()
      return
    }

    // ---------------- q88 variants ----------------
    // (a) shipped round-10 form: repartition(token) + groupBy + census join
    time("q88_shipped")(graft.queries.TextQueries.q88InvertedIndex(spark, sfDir))

    // (b) no repartition: partial-agg the (token, doc_id) rollup map-side
    // (each group lives in ONE input partition), ship combined postings,
    // broadcast the vocab census
    def q88b(): DataFrame = {
      val grouped = d
        .select(col("doc_id"), toks.as("l"))
        .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("tf"),
          array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
      val dfCensus = d
        .select(explode(array_distinct(toks)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
      grouped.join(broadcast(dfCensus), Seq("token"))
        .select("token", "doc_id", "tf", "positions", "df")
        .orderBy("token", "doc_id")
    }
    time("q88_b_noshuffle_bcast")(q88b())

    // (c) in-row grouping: per-doc (token, tf, positions) computed inside
    // the row (no exchange before the final sort), broadcast census
    def q88c(): DataFrame = {
      val perDoc = d
        .select(col("doc_id"), toks.as("l"))
        .withColumn("g", expr(
          """transform(array_distinct(l), t -> struct(
            |  t AS token,
            |  filter(sequence(0, size(l) - 1), i -> element_at(l, i + 1) = t) AS poss))"""
            .stripMargin))
        .select(col("doc_id"), explode(col("g")).as("e"))
        .select(col("doc_id"), col("e.token").as("token"),
          size(col("e.poss")).cast("long").as("tf"),
          array_join(transform(col("e.poss"), _.cast("string")), ",").as("positions"))
      val dfCensus = d
        .select(explode(array_distinct(toks)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
      perDoc.join(broadcast(dfCensus), Seq("token"))
        .select("token", "doc_id", "tf", "positions", "df")
        .orderBy("token", "doc_id")
    }
    time("q88_c_inrow_bcast")(q88c())

    // parity: b and c vs shipped
    {
      val base = graft.queries.TextQueries.q88InvertedIndex(spark, sfDir)
        .collect().map(_.toString)
      val bb = q88b().collect().map(_.toString)
      val cc = q88c().collect().map(_.toString)
      println(s"[scratch] q88 parity b=${base.sameElements(bb)} c=${base.sameElements(cc)}")
      cleanup()
    }

    // q88 floor: scan + posexplode + count only
    time("q88_floor_scan_explode") {
      d.select(col("doc_id"), toks.as("l"))
        .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
        .groupBy().agg(count(lit(1)).as("c"))
    }
    // q88 floor + the one exchange + final agg (no census, no sort)
    time("q88_floor_grouped_only") {
      d.select(col("doc_id"), toks.as("l"))
        .select(col("doc_id"), posexplode(col("l")).as(Seq("pos", "token")))
        .groupBy("token", "doc_id")
        .agg(count(lit(1)).as("tf"),
          array_join(transform(sort_array(collect_list(col("pos"))), _.cast("string")), ",").as("positions"))
    }

    // ---------------- q97 floor ----------------
    val K = graft.queries.TextQueries.ShingleDupK
    time("q97_full")(graft.queries.TextQueries.q97SourceOverlap(spark, sfDir))
    time("q97_floor_scan_explode") {
      d.select(col("source"), explode(shingleHashes60(toks, K)).as("h"))
        .groupBy().agg(count(lit(1)).as("c"))
    }
    timeJob("q97_floor_mask_census") {
      d.select(lit(1L).as("m"), explode(shingleHashes60(toks, K)).as("h"))
        .groupBy("h").agg(bit_or(col("m")).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("cnt"))
        .collect()
    }

    // ---------------- q146 variants ----------------
    time("q146_shipped")(graft.queries.TextQueries.q146DsirResample(spark, sfDir))
    timeJob("q146_floor_census_only") {
      val B = graft.queries.TextQueries.DsirBuckets
      d.select(col("lang"), explode(toks).as("tok"))
        .select(col("lang"), (md5Hash60(col("tok")) % B).as("b"))
        .groupBy("b").agg(count(lit(1)).as("r"),
          count(when(col("lang") === "en", 1)).as("t"))
        .collect()
    }
    // staged variant: tokenize+hash ONCE into a checkpointed per-doc
    // bucket array; census explodes it, fold reads it
    time("q146_staged_bs") {
      val B = graft.queries.TextQueries.DsirBuckets
      val staged = d.select(col("doc_id"), col("lang"), col("source"),
          sort_array(transform(toks, t => md5Hash60(t) % B)).as("bs"))
        .localCheckpoint()
      val census = staged.select(col("lang"), explode(col("bs")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("r"),
          count(when(col("lang") === "en", 1)).as("t"))
        .collect()
      val rTot = census.map(_.getLong(1)).sum
      val tTot = census.map(_.getLong(2)).sum
      val lrArr = Array.fill(B)(0.0)
      census.foreach { row =>
        val b = row.getLong(0).toInt
        lrArr(b) = math.log((row.getLong(2) + 1).toDouble / (tTot + B).toDouble) -
          math.log((row.getLong(1) + 1).toDouble / (rTot + B).toDouble)
      }
      val lrLit = array(lrArr.toIndexedSeq.map(lit): _*)
      val wExpr = aggregate(col("bs"), lit(0.0),
        (acc, b) => acc + element_at(lrLit, (b + 1).cast("int")))
      val keyed = staged
        .select(col("doc_id"), col("lang"), col("source"), wExpr.as("w"))
        .withColumn("gumbel_key",
          round(col("w") - log(-log(
            (md5Hash60(concat(lit("dsir|"), col("doc_id"))) + 1).cast("double") /
              lit(1152921504606846978L).cast("double"))), 6))
        .localCheckpoint()
      val kept = graft.operators.GlobalRank.topKBoundary(
        keyed.select("gumbel_key", "doc_id"), graft.queries.TextQueries.DsirKeep) match {
        case None => lit(1).cast("int")
        case Some((bk, bd)) =>
          (col("gumbel_key") > bk ||
            (col("gumbel_key") === bk && col("doc_id") <= bd)).cast("int")
      }
      keyed
        .select(col("doc_id"), col("lang"), col("source"),
          round(col("w"), 6).as("dsir_w"), col("gumbel_key"), kept.as("kept"))
        .orderBy("doc_id")
    }

    spark.stop()
  }
}
