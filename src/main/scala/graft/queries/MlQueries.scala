package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{GraftPipelines, PosTagger}

/** ML-backed queries. q50's oracle SQL is GENERATED from the very same
  * lexicon/suffix constants the Scala tagger uses — the custom scalar
  * operator itself is hash-checked, not just exercised. q51 trains a
  * real spark.ml pipeline (not SQL-expressible → rows-only check; its
  * learning quality is asserted in MlPipelineSpec).
  */
object MlQueries {

  // ---------------------------------------------------------------- q50
  /** Corpus POS-tag distribution via the custom universal tagger. */
  def q50PosDist(spark: SparkSession, dir: String): DataFrame = {
    val tagger = new PosTagger().setInputCol("words").setOutputCol("tags")
    val tokenized = Tables(spark, dir).documents
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    tagger.transform(tokenized)
      .select(explode(col("tags")).as("tag"))
      .groupBy("tag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("tag")
  }

  /** DuckDB CASE chain generated from PosTagger's constants — identical
    * precedence: punctuation, number, lexicon, suffix rules (length
    * guard len > |suffix|+2), capitalized → NOUN, non-letter → X, NOUN. */
  val q50Sql: String = {
    val lexCases = PosTagger.Lexicon.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (tag, words) =>
        val arr = words.keys.toSeq.sorted
          .map(w => s"'${w.replace("'", "''")}'").mkString("[", ", ", "]")
        s"WHEN list_contains($arr, lower(t)) THEN '$tag'"
      }.mkString("\n      ")
    val sufCases = PosTagger.SuffixRules.map { case (suf, tag) =>
      s"WHEN len(t) > ${suf.length + 2} AND ends_with(lower(t), '$suf') THEN '$tag'"
    }.mkString("\n      ")
    // The tagger's DEFAULT mode is ASCII-strict (PosTagger.unicode =
    // false), so these ASCII classes mirror it exactly on ANY corpus —
    // including non-ASCII text, where both engines treat é as a
    // non-letter. Unicode-aware tagging is an explicit opt-in
    // (setUnicode(true)) documented as having no oracle twin. The
    // empty-token guard matches tagToken's early return (double spaces
    // in text produce "" tokens).
    s"""SELECT tag, count(*) AS cnt FROM (
       |  SELECT CASE
       |      WHEN t = '' THEN 'X'
       |      WHEN NOT regexp_matches(t, '[A-Za-z0-9]') THEN '.'
       |      WHEN regexp_matches(t, '^[0-9]+([.,][0-9]+)*$$') THEN 'NUM'
       |      $lexCases
       |      $sufCases
       |      WHEN regexp_matches(t, '^[A-Z]') THEN 'NOUN'
       |      WHEN regexp_matches(t, '[^A-Za-z]') THEN 'X'
       |      ELSE 'NOUN'
       |    END AS tag
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents))
       |GROUP BY tag ORDER BY tag""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  /** End-to-end spark.ml pipeline on the documents table: label docs by
    * length (learnable from token statistics), train bigram+LR
    * (script5 config), report the seeded-split confusion rollup. */
  def q51SentimentPipeline(spark: SparkSession, dir: String): DataFrame = {
    val data = Tables(spark, dir).documents
      .select(col("text").as("review"),
        when(col("n_chars") > 300, 1.0).otherwise(0.0).as("label"))
    val Array(train, test) = data.randomSplit(Array(0.8, 0.2), GraftPipelines.Seed)
    // bounded vocab for the demo query: the full 2^18 default spends its
    // time allocating vocabulary, not learning, on this corpus
    val model = GraftPipelines.script5(vocabSize = 8192).fit(train)
    model.transform(test)
      .groupBy(col("label"), col("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("label", "prediction")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_pos_dist"           -> (q50PosDist _),
    "q51_sentiment_pipeline" -> (q51SentimentPipeline _)
  )

  val oracles: Map[String, String] = Map(
    "q50_pos_dist" -> q50Sql
  )
}
