package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Benchmark decontamination — flag training documents that share any
  * n-gram with an evaluation/benchmark set, the standard guard against
  * test-set leakage into training corpora (n-gram overlap flagging as
  * popularized by public LLM data pipelines; n = 8 tokens by default).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus
  * (benchmarks are MBs against TBs of training text), so its distinct
  * gram set is BROADCAST; the corpus side is one narrow explode feeding
  * a broadcast semi-join, then a partial-aggregated count per doc_id —
  * a single shuffle of (doc_id, count) pairs. No corpus-vs-corpus join
  * ever forms.
  */
object Decontaminate {

  /** Per-document contamination: distinct benchmark n-grams present,
    * plus the binary flag. Every corpus document appears in the output
    * (zero-hit docs included). */
  def apply(corpus: DataFrame, benchmark: DataFrame, n: Int = 8): DataFrame = {
    val grams = corpus.select(
      col("doc_id"),
      explode(shingles(whitespaceTokens(col("text")), n)).as("gram"))
    val benchGrams = benchmark
      .select(explode(shingles(whitespaceTokens(col("text")), n)).as("gram"))
      .distinct()
    val hits = grams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
    corpus.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).cast("long").as("flagged"))
  }
}
