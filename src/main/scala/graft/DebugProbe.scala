package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

object DebugProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"PROBE $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val toks = split(col("text"), " ")
    t("ngrams2_size")(docs.select(size(ngrams(toks, 2))))
    t("distinct_size")(docs.select(size(array_distinct(ngrams(toks, 2)))))
    t("dup2_only")(docs.select(dupNgramRatio(toks, 2)))
    t("dup3_only")(docs.select(dupNgramRatio(toks, 3)))
    t("alpha_symbol")(docs.select(alphaRatio(col("text")), symbolRatio(col("text"))))
    t("mean_len")(docs.select(meanTokenLen(toks)))
    spark.stop()
  }
}
