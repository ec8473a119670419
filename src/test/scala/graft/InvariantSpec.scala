package graft

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.queries.TextQueries
import org.apache.spark.sql.functions._
import scala.util.Random

/** Algebraic laws and cross-query invariants — properties the per-query
  * DuckDB oracle cannot see because they relate OPERATORS to each
  * other. */
class InvariantSpec extends SparkSpec {

  import spark.implicits._

  test("rolling fingerprint concatenation law: h(a++b) = h(a)*31^|b| + h(b)") {
    val rnd = new Random(5)
    val M = 2147483647L
    def powMod(b: Long, e: Long, m: Long): Long = {
      var r = 1L; var bb = b % m; var ee = e
      while (ee > 0) { if ((ee & 1) == 1) r = r * bb % m; bb = bb * bb % m; ee >>= 1 }
      r
    }
    val cases = (1 to 20).map { _ =>
      val a = Seq.fill(rnd.nextInt(8) + 1)(rnd.alphanumeric.take(4).mkString)
      val b = Seq.fill(rnd.nextInt(8) + 1)(rnd.alphanumeric.take(4).mkString)
      (a, b, a ++ b)
    }
    val df = cases.toDF("a", "b", "ab")
      .select(
        rollingFingerprint(col("a")).as("ha"),
        rollingFingerprint(col("b")).as("hb"),
        rollingFingerprint(col("ab")).as("hab"),
        size(col("b")).as("lb"))
    df.collect().foreach { r =>
      val (ha, hb, hab, lb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      // h(b) itself is a fold from 0, so h(a++b) = ha*31^lb + hb (mod M)
      val expected = (BigInt(ha) * BigInt(powMod(31, lb, M)) + BigInt(hb)).mod(BigInt(M))
      assert(BigInt(hab) == expected, s"ha=$ha hb=$hb lb=$lb hab=$hab")
    }
  }

  test("minhash superset law: each signature element of S∪T <= that of S") {
    val rnd = new Random(11)
    val cases = (1 to 15).map { _ =>
      val s = Seq.fill(rnd.nextInt(10) + 2)(rnd.alphanumeric.take(5).mkString)
      val extra = Seq.fill(rnd.nextInt(5) + 1)(rnd.alphanumeric.take(5).mkString)
      (s, s ++ extra)
    }
    val df = cases.toDF("s", "t")
      .select(
        minhashSignature(col("s"), 8).as("ms"),
        minhashSignature(col("t"), 8).as("mt"))
    df.collect().foreach { r =>
      val ms = r.getSeq[Long](0); val mt = r.getSeq[Long](1)
      ms.indices.foreach(i => assert(mt(i) <= ms(i), s"i=$i ms=$ms mt=$mt"))
    }
  }

  test("stopword accounting: n_content + n_stopwords == n_tokens (q23 vs q24)") {
    val q23 = TextQueries.q23StopwordFilter(spark, sf)
    val q24 = TextQueries.q24Quality(spark, sf)
    val joined = q23.join(q24.select(col("doc_id"),
        (col("stopword_ratio") * col("n_tokens")).as("n_sw")), "doc_id")
      .filter(abs(col("n_tokens") - col("n_content") - col("n_sw")) > 1e-6)
    assert(joined.count() == 0)
  }

  test("token stats consistency: n_distinct <= n_tokens, ttr in (0,1]") {
    val bad = TextQueries.q20TokenStats(spark, sf)
      .filter(col("n_distinct") > col("n_tokens") || col("n_tokens") <= 0)
    assert(bad.count() == 0)
    val badTtr = TextQueries.q24Quality(spark, sf)
      .filter(col("type_token_ratio") <= 0 || col("type_token_ratio") > 1)
    assert(badTtr.count() == 0)
  }

  test("q13/q15 bucketing semantics: DIV truncates toward zero on negatives") {
    // pins the cross-engine contract on the negative domain the fixtures
    // don't cover: DuckDB 1.0 `//` truncates toward zero for integers
    // (-7//2 = -3, verified), and so does Spark DIV — the q13/q15
    // bucketing exprs must keep that semantics (NOT floored division)
    val got = Seq(-7L, -5L, -1L, 0L, 1L, 7L).toDF("x")
      .select(expr("x DIV 2")).as[Long].collect().toSeq
    assert(got == Seq(-3L, -2L, 0L, 0L, 0L, 3L), s"got $got")
    val hour = Seq(-5000000000000L, 5000000000000L).toDF("ts_ns")
      .select(expr("(ts_ns DIV 3600000000000) * 3600")).as[Long].collect().toSeq
    assert(hour == Seq(-3600L, 3600L), s"got $hour") // truncation, not floor (-7200)
  }

  test("exact dedup partitions the corpus: sum(copies) == |documents|") {
    val total = TextQueries.q27DedupExact(spark, sf)
      .agg(sum("copies")).first().getLong(0)
    assert(total == Tables(spark, sf).documents.count())
  }

  test("long-cents money sum equals exact BigDecimal sum (incl. negatives, any partitioning)") {
    // the law behind Relational.moneySum: for 2-dp inputs, staging as
    // rounded long cents and dividing once at the end is bit-identical
    // to exact decimal summation cast to double
    val rnd = new Random(11)
    val cents = Seq.fill(5000)(rnd.between(-99999L, 10000000L))
    val doubles = cents.map(_.toDouble / 100.0) // nearest-double of k/100
    val exact = cents.map(BigInt(_)).sum // exact integer cents
    val expected = (BigDecimal(exact) / 100).toDouble
    for (parts <- Seq(1, 7, 32)) {
      val got = doubles.toDF("v").repartition(parts)
        .agg((sum(round(col("v") * 100).cast("long")) / 100.0).as("s"))
        .first().getDouble(0)
      assert(got == expected, s"parts=$parts got=$got expected=$expected")
    }
  }

  test("cents product form equals exact decimal product sum (q02 disc price shape)") {
    val rnd = new Random(12)
    val rows = Seq.fill(2000)((rnd.between(1L, 10000000L), rnd.between(0L, 11L)))
    val exact = rows.map { case (p, d) => BigInt(p) * BigInt(100 - d) }.sum
    val expected = (BigDecimal(exact) / 10000).toDouble
    val got = rows.map { case (p, d) => (p.toDouble / 100.0, d.toDouble / 100.0) }
      .toDF("price", "disc")
      .agg((sum(round(col("price") * 100).cast("long") *
        (lit(100L) - round(col("disc") * 100).cast("long"))) / 10000.0).as("s"))
      .first().getDouble(0)
    assert(got == expected)
  }

  test("q37's staged ratios equal the per-row helper operators") {
    // q37 stages integer counts for plan reasons (each array touched
    // once); the single-pass helpers define the same math. This pins
    // the two forms together so neither can drift alone.
    val toks = split(col("text"), " ")
    val helpers = Tables(spark, sf).documents.select(
      col("doc_id"),
      dupNgramRatio(toks, 2).as("h_dup2"),
      dupNgramRatio(toks, 3).as("h_dup3"),
      meanTokenLen(toks).as("h_mtl"),
      alphaRatio(col("text")).as("h_alpha"),
      symbolRatio(col("text")).as("h_symbol"))
    val q37 = TextQueries.q37QualityRules(spark, sf)
    val joined = q37.join(helpers, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("dup_bigram_ratio") == r.getAs[Double]("h_dup2"))
      assert(r.getAs[Double]("dup_trigram_ratio") == r.getAs[Double]("h_dup3"))
      assert(r.getAs[Double]("mean_token_len") == r.getAs[Double]("h_mtl"))
      assert(r.getAs[Double]("alpha_ratio") == r.getAs[Double]("h_alpha"))
      assert(r.getAs[Double]("symbol_ratio") == r.getAs[Double]("h_symbol"))
    }
  }

  test("decontamination: complete output, benchmark self-flagged, broadcast semi-join plan") {
    val d = Tables(spark, sf).documents
    val out = graft.operators.Decontaminate(d, d.filter(col("doc_id") < 5)).cache()
    // every corpus doc appears exactly once, zero-hit docs included
    assert(out.count() == d.count())
    // the benchmark docs overlap themselves completely
    val self = out.filter(col("doc_id") < 5 && col("flagged") === 1).count()
    assert(self == 5L, s"benchmark docs must self-flag, got $self/5")
    // scale shape: benchmark gram set broadcast into a semi-join — the
    // corpus side must never shuffle for the membership test
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join in:\n$plan")
    out.unpersist()
  }

  test("no catalog query plans a CartesianProduct") {
    // crossJoins against broadcast scalar frames compile to
    // BroadcastNestedLoopJoin (bounded build side — fine); an actual
    // CartesianProductExec means two unbounded sides met without a key
    // and would be a scale-killer anywhere in the catalog
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }

  test("q98 per-doc top-3 runs as a WindowGroupLimit, not a full sort") {
    val plan = graft.queries.TextQueries.q98TfidfKeywords(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit partial top-k in:\n$plan")
  }

  test("staged token queries evaluate exactly one split per row (plan shape)") {
    // q20/q23/q24/q37 stage the whitespace split into a projection the
    // optimizer must NOT collapse away — four inlined copies of
    // split(text,' ') per row was a real regression shape (round 6)
    val qs = Seq(
      "q20" -> graft.queries.TextQueries.q20TokenStats _,
      "q23" -> graft.queries.TextQueries.q23StopwordFilter _,
      "q24" -> graft.queries.TextQueries.q24Quality _,
      "q37" -> graft.queries.TextQueries.q37QualityRules _)
    qs.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.optimizedPlan.toString
      val n = "split\\(".r.findAllIn(plan).length
      assert(n == 1, s"$name: expected 1 split( in optimized plan, found $n")
    }
  }

  test("q74 funnel: stage times strictly ordered, depth consistent, one row per user") {
    val rows = graft.queries.Relational.q74Funnel(spark, sf).collect()
    val users = Tables(spark, sf).events.select("user_id").distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      val (d, t1, t2, t3) = (r.getAs[Long]("funnel_depth"),
        r.getAs[Long]("t1_us"), r.getAs[Long]("t2_us"), r.getAs[Long]("t3_us"))
      // a stage only exists if the previous one does, strictly later
      assert((t2 == -1L) || (t1 != -1L && t2 > t1))
      assert((t3 == -1L) || (t2 != -1L && t3 > t2))
      assert(d == Seq(t1, t2, t3).count(_ != -1L))
    }
    // the funnel is non-degenerate on testdata: some users convert fully,
    // and depths are not all equal
    assert(rows.exists(_.getAs[Long]("funnel_depth") == 3L))
  }

  test("q75 bigram LM: held-out NLL finite and positive, backoff branch live") {
    val rows = TextQueries.q75BigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getAs[Double]("nll")
      assert(!nll.isNaN && !nll.isInfinite && nll > 0.0)
    }
    // the backoff branch is live on this corpus: at least one held-out
    // bigram is absent from the train slice (guards against the scoring-
    // the-training-set mistake where backoff is structurally dead)
    val t = Tables(spark, sf).documents
      .select(col("doc_id"),
        posexplode(whitespaceTokens(col("text"))).as(Seq("pos", "token")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val seq = t.withColumn("prev", lag("token", 1).over(w))
      .filter(col("prev").isNotNull)
    val trainBi = seq.filter(col("doc_id") >= TextQueries.LmHeldOutBelow)
      .select("prev", "token").distinct()
    val unseen = seq.filter(col("doc_id") < TextQueries.LmHeldOutBelow)
      .join(trainBi, Seq("prev", "token"), "left_anti").count()
    assert(unseen > 0, "held-out slice exercises the backoff branch")
  }

  test("canonicalization labels are idempotent pointers") {
    val labels = Dedup.minhashCanonicalize(
      Tables(spark, sf).documents, iterations = 2).cache()
    // canonical ids are themselves docs, and map to themselves
    val canonOfCanon = labels.select(col("canonical_id").as("doc_id")).distinct()
      .join(labels, "doc_id")
      .filter(col("doc_id") =!= col("canonical_id"))
    assert(canonOfCanon.count() == 0,
      "a canonical id must be its own canonical")
    // complete labeling: exactly one row per document
    assert(labels.count() == Tables(spark, sf).documents.count())
    labels.unpersist()
  }
}
