package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Hand-computed oracles for the corpus-statistics queries (q89 PMI
  * collocations, q90 repeated-trigram boilerplate) on an injected
  * documents table — values derived on paper, independent of both the
  * Spark plan and the DuckDB twin. */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-corpus-spec").toString
    Seq(
      (0L, "a b a b", "en", "t", 7L),
      (1L, "a c", "en", "t", 3L),
      (2L, "x x x x x", "en", "t", 9L),
      (3L, "a b a b a b a b a b", "en", "t", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q90: duplicated-trigram fractions match paper arithmetic") {
    val got = TextQueries.q90BoilerplateNgram(spark, dir)
      .select("doc_id", "n_tri", "n_dup", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc0 "a b a b": trigrams [aba, bab] all distinct → 0.0
    // doc1 "a c": < 3 tokens → 0 trigrams, ratio 0 by convention
    // doc2 "x x x x x": [xxx, xxx, xxx] → 2 of 3 duplicated → 0.6667
    // doc3: 8 trigrams alternating [aba, bab]×4 → 6 duplicated → 0.75
    assert(got == Seq(
      (0L, 2L, 0L, 0.0),
      (1L, 0L, 0L, 0.0),
      (2L, 3L, 2L, 0.6667),
      (3L, 8L, 6L, 0.75)))
  }

  test("q91: OOV ratios under a 2-token budget match paper arithmetic") {
    // Census: a=8, b=7, x=5, c=1 → top-2 vocabulary {a, b}.
    // doc0 "a b a b" → 0/4; doc1 "a c" → 1/2; doc2 "x×5" → 5/5;
    // doc3 (a b alternating ×10) → 0/10.
    val got = TextQueries.q91VocabOov(spark, dir, budget = 2)
      .select("doc_id", "n_tok", "n_oov", "oov_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 4L, 0L, 0.0),
      (1L, 2L, 1L, 0.5),
      (2L, 5L, 5L, 1.0),
      (3L, 10L, 0L, 0.0)))
  }

  test("q92: first-occurrence novelty matches paper arithmetic") {
    // Distinct bigrams: doc0 {a b, b a} (both globally first here),
    // doc1 {a c} first, doc2 {x x} first, doc3 {a b, b a} seen in doc0.
    val got = TextQueries.q92NgramNovelty(spark, dir)
      .select("doc_id", "n_bigrams", "n_novel", "novelty_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1.0),
      (1L, 1L, 1L, 1.0),
      (2L, 1L, 1L, 1.0),
      (3L, 2L, 0L, 0.0)))
  }

  test("q89: PMI value and floor match paper arithmetic") {
    val got = TextQueries.q89BigramPmi(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    // Unigrams: a=8 (2+1+5), b=7 (2+5), c=1, x=5 → N_u = 21. Bigrams:
    // doc0 [ab, ba, ab], doc1 [ac], doc2 [xx×4], doc3 [ab×5, ba×4] →
    // N_bi = 17; c("a b") = 7, c("b a") = 5, c("x x") = 4 (below the
    // floor of 5), c("a c") = 1. Survivors: "a b" and "b a".
    // pmi(a b) = ln(((7·21)·21) / ((17·8)·7)) = ln(3087/952) ≈ 1.1765
    // pmi(b a) = ln(((5·21)·21) / ((17·7)·8)) = ln(2205/952) ≈ 0.8399
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      BigDecimal(math.log(((cab.toDouble * 21) * 21) / ((17.0 * ca) * cb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("a b", 7L, pmi(7, 8, 7)),
      ("b a", 5L, pmi(5, 7, 8))))
  }
}
