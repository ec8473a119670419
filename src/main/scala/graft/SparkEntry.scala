package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the engine's query modules; every entry with
  * an `oracleSql` twin is hash-checked against DuckDB on the same parquet
  * tables (column names and ORDER BY keys must match exactly).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q02AggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MlQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.StatsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.MlQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.SketchQueries.oracles ++
      graft.queries.StatsQueries.oracles
}
