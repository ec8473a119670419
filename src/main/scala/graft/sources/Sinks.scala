package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks beyond the TSV golden writer (CorpusReader.writeTsv).
  *
  * At 100 TB the sink IS the partitioning decision: hive-style
  * partition directories make downstream partition pruning free
  * (a reader filtering on the partition column touches only its
  * directories), and per-file row-group sizing keeps scans vectorized.
  */
object Sinks {

  /** Hive-partitioned parquet: one directory tree level per partition
    * column. Writers of 100 TB outputs partition by the columns their
    * READERS filter on — that choice, not the write itself, is what
    * buys the downstream pruning. */
  def writePartitioned(df: DataFrame, out: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(out)

  /** Plain parquet with a target in-memory partition count — the knob
    * for output file count/size (small-files problem vs giant files). */
  def writeSized(df: DataFrame, out: String, numFiles: Int,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(numFiles).write.mode(mode).parquet(out)
}
