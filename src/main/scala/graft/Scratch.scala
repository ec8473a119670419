package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._
import graft.queries.TextQueries

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

    def time(name: String, reps: Int = 4)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        dt
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.limit(1).count()
    val toks = whitespaceTokens(col("text"))

    // ================= q146 in-expression fold =================
    def q146v3(): DataFrame = {
      val B = 512
      // pass 1: the bounded bucket census (<= B rows by construction) —
      // collected into literals, the CMS-probe pattern
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
      // pass 2: per-doc fold, zero shuffles before the tiny rank
      val sortedB = sort_array(transform(toks, t => md5Hash60(t) % B))
      val wExpr = aggregate(
        sortedB,
        struct(lit(-1L).as("pb"), lit(0L).as("n"), lit(0.0).as("acc")),
        (s, b) => {
          val flush = s.getField("acc") +
            when(s.getField("pb") === -1L, 0.0)
              .otherwise(s.getField("n").cast("double") *
                element_at(lrLit, (s.getField("pb") + 1).cast("int")))
          when(b === s.getField("pb"),
            struct(s.getField("pb").as("pb"), (s.getField("n") + 1L).as("n"),
              s.getField("acc").as("acc")))
            .otherwise(struct(b.as("pb"), lit(1L).as("n"), flush.as("acc")))
        },
        s => s.getField("acc") +
          when(s.getField("pb") === -1L, 0.0)
            .otherwise(s.getField("n").cast("double") *
              element_at(lrLit, (s.getField("pb") + 1).cast("int"))))
      d.select(col("doc_id"), col("lang"), col("source"), wExpr.as("w"))
        .withColumn("gumbel_key",
          round(col("w") - log(-log(
            (md5Hash60(concat(lit("dsir|"), col("doc_id"))) + 1).cast("double") /
              lit(1152921504606846978L).cast("double"))), 6))
        .withColumn("kept",
          (row_number().over(Window.orderBy(desc("gumbel_key"), col("doc_id"))) <= 200).cast("int"))
        .select(col("doc_id"), col("lang"), col("source"),
          round(col("w"), 6).as("dsir_w"), col("gumbel_key"), col("kept"))
        .orderBy("doc_id")
    }
    time("q146_current")(TextQueries.q146DsirResample(spark, sfDir))
    time("q146_v3_inexpr")(q146v3())
    // correctness vs current
    val cur146 = TextQueries.q146DsirResample(spark, sfDir).collect()
    val v3 = q146v3().collect()
    println(s"[scratch] q146 parity: rows ${cur146.length}/${v3.length} equal=${cur146.sameElements(v3)}")

    // ================= q97 bitmask census =================
    def q97v3(): DataFrame = {
      val names = d.select("source").distinct().collect().map(_.getString(0)).sorted
      require(names.length <= 63)
      val namesSql = names.map(s => s"'${s.replace("'", "''")}'")
        .mkString("array(", ", ", ")")
      val bitMap = map(names.toIndexedSeq.zipWithIndex.flatMap {
        case (s, i) => Seq(lit(s), lit(1L << i)) }: _*)
      val masks = d
        .select(element_at(bitMap, col("source")).as("m"),
          explode(shingleHashes60(toks, TextQueries.ShingleDupK)).as("h"))
        .groupBy("h").agg(bit_or(col("m")).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("cnt"))
        .withColumn("ss", expr(
          s"""filter(transform(sequence(0, ${names.length - 1}),
             |  i -> if((mask >> i) % 2 != 0, element_at($namesSql, i + 1),
             |          CAST(NULL AS STRING))), x -> x IS NOT NULL)""".stripMargin))
      val agg = masks
        .select(col("cnt"), explode(expr(
          """concat(
            |  transform(ss, s -> struct(s AS source_a, '' AS source_b)),
            |  if(size(ss) < 2, array(),
            |    flatten(transform(sequence(1, size(ss) - 1),
            |      i -> transform(sequence(i + 1, size(ss)),
            |        j -> struct(element_at(ss, i) AS source_a,
            |                    element_at(ss, j) AS source_b))))))"""
            .stripMargin)).as("p"))
        .select(col("p.source_a").as("a"), col("p.source_b").as("b"), col("cnt"))
        .groupBy("a", "b").agg(sum("cnt").as("n"))
        .localCheckpoint()
      val sizes = agg.filter(col("b") === "")
        .select(col("a").as("source"), col("n"))
      agg.filter(col("b") =!= "")
        .select(col("a").as("source_a"), col("b").as("source_b"),
          col("n").as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("n").as("n_b"))), Seq("source_b"))
        .withColumn("jaccard",
          round(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")), 4))
        .select("source_a", "source_b", "n_a", "n_b", "n_shared", "jaccard")
        .orderBy("source_a", "source_b")
    }
    time("q97_current")(TextQueries.q97SourceOverlap(spark, sfDir))
    time("q97_v3_bitmask")(q97v3())
    val cur97 = TextQueries.q97SourceOverlap(spark, sfDir).collect()
    val v97 = q97v3().collect()
    println(s"[scratch] q97 parity: rows ${cur97.length}/${v97.length} equal=${cur97.sameElements(v97)}")

    // sub-part decomposition
    def timeJob(name: String, reps: Int = 4)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    timeJob("q146_census_collect") {
      d.select(col("lang"), explode(toks).as("tok"))
        .select(col("lang"), (md5Hash60(col("tok")) % 512).as("b"))
        .groupBy("b").agg(count(lit(1)).as("r"),
          count(when(col("lang") === "en", 1)).as("t"))
        .collect()
    }
    timeJob("q97_sources_distinct") {
      d.select("source").distinct().collect()
    }
    val names0 = d.select("source").distinct().collect().map(_.getString(0)).sorted
    val bitMap0 = map(names0.toIndexedSeq.zipWithIndex.flatMap {
      case (s, i) => Seq(lit(s), lit(1L << i)) }: _*)
    time("q97_bitor_census_only") {
      d.select(element_at(bitMap0, col("source")).as("m"),
          explode(shingleHashes60(toks, TextQueries.ShingleDupK)).as("h"))
        .groupBy("h").agg(bit_or(col("m")).as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("cnt"))
    }
    time("q97_bitor_census_onegroup") {
      d.select(element_at(bitMap0, col("source")).as("m"),
          explode(shingleHashes60(toks, TextQueries.ShingleDupK)).as("h"))
        .groupBy("h").agg(bit_or(col("m")).as("mask"))
    }
    spark.stop()
  }
}
