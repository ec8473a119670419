package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion/egress (SURVEY.md §2.1).
  *
  * The reference walks local directories on the DRIVER and parallelizes
  * the collected strings (`loadFilesPartial.py:5-40`) — a non-starter
  * beyond a few GB. Here the read is a distributed `wholetext` scan:
  * every executor reads its own file split, labels derive from the file
  * path, and nothing funnels through the driver. At 100 TB this is the
  * difference between a working source and an OOM.
  */
object CorpusReader {

  /** S1/S3 `loadLabeled`: files under `path/pos` → label 1.0, `path/neg` → 0.0
    * (`loadFilesPartial.py:18,24`). `limitPerClass` mirrors the `nb`
    * parameter of the partial loader. */
  def loadLabeled(spark: SparkSession, path: String,
                  limitPerClass: Option[Int] = None): DataFrame = {
    def side(sub: String, label: Double): DataFrame = {
      val df = spark.read.option("wholetext", "true").text(s"$path/$sub")
        .withColumnRenamed("value", "review")
        .withColumn("label", lit(label))
      limitPerClass.fold(df)(df.limit)
    }
    side("pos", 1.0).unionByName(side("neg", 0.0))
  }

  /** S2 `loadUknown`: unlabeled docs, id = filename stem
    * (`loadFilesPartial.py:30-40`). */
  def loadUnknown(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumn("name",
        regexp_extract(input_file_name(), "([^/]+)\\.[^.]+$", 1))
      .withColumnRenamed("value", "review")

  /** S6 TSV prediction sink: `docid\tlabel` lines. Distributed write;
    * `single=true` coalesces to one golden file (small outputs only —
    * the reference's driver-side loop, `script3_ter.py:199-210`, made
    * single-file the only option). */
  def writeTsv(df: DataFrame, out: String, idCol: String = "name",
               predCol: String = "prediction", single: Boolean = false): Unit = {
    val sel = df.select(col(idCol).cast("string"), col(predCol).cast("string"))
    val w = if (single) sel.coalesce(1) else sel
    w.write.mode("overwrite").option("sep", "\t").csv(out)
  }
}
