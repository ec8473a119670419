package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Property checks for the mix-building queries (sampling, packing, LM
  * scoring) beyond their DuckDB hash checks. */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  test("q48: kept == (key < rate), rates roughly achieved, reruns identical") {
    val s = TextQueries.q48StratifiedSample(spark, sf).cache()
    assert(s.filter((col("sample_key") < col("rate_permyriad")).cast("long")
      =!= col("kept")).count() == 0)
    // achieved rate within a loose binomial tolerance of the target
    val byLang = s.groupBy("lang").agg(
      avg(col("kept")).as("got"),
      (first(col("rate_permyriad")) / 10000.0).as("want"),
      count(lit(1)).as("n"))
      .as[(String, Double, Double, Long)].collect()
    byLang.foreach { case (lang, got, want, n) =>
      val tol = 3 * math.sqrt(want * (1 - want) / n) + 1e-9
      assert(math.abs(got - want) <= tol, s"$lang: got $got want $want n=$n")
    }
    val again = TextQueries.q48StratifiedSample(spark, sf)
    assert(s.exceptAll(again).count() == 0)
  }

  test("q54: packing is dense and in-order within each source") {
    val p = TextQueries.q54SequencePack(spark, sf).cache()
    assert(p.filter(col("seq_offset") < 0 || col("seq_offset") >= 2048).count() == 0)
    assert(p.filter(col("seq_id") < 0).count() == 0)
    // every source starts packing at (seq 0, offset 0)
    val firsts = p.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("seq_id") =!= 0 || col("seq_offset") =!= 0).count() == 0)
    // start positions are the running cumsum: recompute independently
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val recheck = p
      .withColumn("start2", coalesce(sum("n_subtokens").over(w), lit(0L)))
      .filter(expr("start2 DIV 2048") =!= col("seq_id") ||
        (col("start2") % 2048) =!= col("seq_offset"))
    assert(recheck.count() == 0)
  }

  test("q49: nll positive and bounded by ln(N); singleton-token docs score ln N") {
    val q = TextQueries.q49LmLogprob(spark, sf).cache()
    assert(q.filter(col("nll") < 0 || isnan(col("nll"))).count() == 0)
    // NLL = ln N - (sum ln c)/n <= ln N since every count >= 1
    val d = Tables(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("t")).count()
    val lnN = math.log(d.toDouble)
    assert(q.filter(col("nll") > lnN + 1e-6).count() == 0)
  }
}
