package graft

import graft.operators.SetSimJoin
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity join: the filter must be EXACT (no
  * missed pairs vs brute force, at several thresholds) and candidate
  * generation must stay an equi-join — the two properties the DuckDB
  * hash check cannot localize. */
class SetSimJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = {
    // clusters of near-identical token sets + singletons + an empty doc
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over a lazy dog",
      3L -> "the quick brown fox leaps over the lazy dog today",
      4L -> "entirely different words about spark catalyst plans",
      5L -> "words about spark catalyst plans entirely different",
      6L -> "one token",
      7L -> "one token extra",
      8L -> "",
      9L -> "the the the quick quick dog" // duplicates collapse upstream
    )
    rows.toDF("id", "text")
      .select(col("id"), array_distinct(split(col("text"), " ")).as("toks"))
  }

  private def brute(threshold: Double): Set[(Long, Long)] = {
    val a = corpus.select(col("id").as("id_a"), col("toks").as("ta"))
    val b = corpus.select(col("id").as("id_b"), col("toks").as("tb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", size(array_union(col("ta"), col("tb"))).cast("long"))
      .filter(col("uni") > 0 &&
        col("inter") * 1000000L >= col("uni") * math.round(threshold * 1000000L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("prefix filtering == brute force at t = 0.3, 0.5, 0.8") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = SetSimJoin.jaccardSelfJoin(corpus, "id", "toks", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(t), s"threshold=$t")
    }
    assert(brute(0.5).nonEmpty) // the test must actually exercise pairs
  }

  test("jaccard values are exact |intersect| / |union|") {
    val got = SetSimJoin.jaccardSelfJoin(corpus, "id", "toks", 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // docs 4 and 5 are permutations: identical sets, jaccard exactly 1.0
    assert(got((4L, 5L)) == 1.0)
    // doc2 = doc1's 8-token set plus "a": intersect 8, union 9
    assert(got((1L, 2L)) == 8.0 / 9.0)
  }

  test("candidate generation is an equi-join, not a cross product") {
    val plan = SetSimJoin.jaccardSelfJoin(corpus, "id", "toks", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("low-entropy corpus: exact result; candidates near the output floor") {
    // The round-7 weakness shape: the documents tables draw every token
    // from a ~31-word vocabulary, so every token is hot and the rarest-
    // first prefix barely discriminates. Two properties pinned on the
    // REAL corpus (the one q82 runs on): exactness vs brute force, and
    // the aggregated positional filter keeping candidate overgeneration
    // within a small factor of the true output — the output being the
    // LOWER bound of any exact scheme. (At sf0.1 the measured ratio is
    // 222k candidates / 121,748 true pairs = 1.83; the absolute counts
    // are corpus-dense because over half the candidates ARE pairs.)
    val d = Tables(spark, sf).documents
      .select(col("doc_id").as("id"),
        array_distinct(graft.functions.TextFunctions
          .whitespaceTokens(col("text"))).as("toks"))
    val t = 0.8
    val nCand = SetSimJoin.candidates(d, "id", "toks", t).count()
    val out = SetSimJoin.jaccardSelfJoin(d, "id", "toks", t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bruteDf = d.select(col("id").as("id_a"), col("toks").as("ta"))
      .crossJoin(d.select(col("id").as("id_b"), col("toks").as("tb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", size(array_union(col("ta"), col("tb"))).cast("long"))
      .filter(col("uni") > 0 &&
        col("inter") * 1000000L >= col("uni") * 800000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == bruteDf)
    assert(out.nonEmpty)
    assert(nCand <= 4L * out.size,
      s"candidates $nCand vs ${out.size} true pairs: filters not pruning " +
        "(overgeneration should stay within ~2x on this corpus)")
  }
}
