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

  test("q69: exactly k per lang, deterministic across layouts, length-weighted") {
    val s = TextQueries.q69WeightedSample(spark, sf).cache()
    // k rows per lang (every sf lang has >= k docs), contiguous ranks
    val perLang = s.groupBy("lang").agg(
      count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
    assert(perLang.filter(col("n") =!= TextQueries.WSampleK ||
      col("mx") =!= TextQueries.WSampleK || col("mn") =!= 1).count() == 0)
    // partition-layout independence: md5 keys carry no layout state
    val again = TextQueries.q69WeightedSample(spark, sf)
    assert(s.exceptAll(again).count() == 0 && again.exceptAll(s).count() == 0)
    // A-Res keys weight by n_chars: the sampled docs must skew long —
    // mean sampled length above the corpus mean (weighted-inclusion law,
    // deterministic here since the draws are md5-fixed)
    val sampledMean = s.agg(avg(col("n_chars"))).head.getDouble(0)
    val corpusMean = Tables(spark, sf).documents
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean <= corpus mean $corpusMean")
  }

  test("q70: bm25 matches a from-scratch JVM computation on the same corpus") {
    val out = TextQueries.q70Bm25TopK(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size == TextQueries.Bm25TopK)
    // recompute from raw tokens, independently of the query's plan
    val toks = Tables(spark, sf).documents
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val nDocs = toks.size.toDouble
    val avgdl = toks.values.map(_.size.toLong).sum.toDouble / nDocs
    val terms = TextQueries.Bm25Terms
    val df = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    val scores = toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val contribs = terms.sorted.flatMap { term =>
        val tf = ts.count(_ == term).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (nDocs - df(term) + 0.5) / (df(term) + 0.5))
          Some((idf * (tf * 2.2)) /
            (tf + (1.2 * ((1.0 - 0.75) + (0.75 * (dl / avgdl))))))
        }
      }
      id -> (contribs.size.toLong,
        BigDecimal(contribs.foldLeft(0.0)(_ + _))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    for ((id, (nTerms, bm25)) <- out) {
      val (expN, expS) = scores(id)
      assert(nTerms == expN, s"doc $id n_terms $nTerms != $expN")
      assert(math.abs(bm25 - expS) < 1e-6, s"doc $id bm25 $bm25 != $expS")
    }
    // and the top-k really is the global top-k of the recomputation
    val expectedTop = scores.toSeq.sortBy { case (id, (_, s0)) => (-s0, id) }
      .take(TextQueries.Bm25TopK).map(_._1).toSet
    assert(out.keySet == expectedTop)
  }
}
