package graft

import java.nio.file.{Files, Path, Paths}
import graft.ml.GraftPipelines
import graft.sources.CorpusReader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.Random

/** Regenerates the committed regression fixtures under fixtures/:
  * a deterministic mini-corpus (FIXTURES.md §A1 shape) and the golden
  * predictions of the seeded script5 pipeline over it. GoldenSpec
  * asserts the live pipeline still reproduces the committed golden —
  * the cross-round drift guard the reference's classifications_*.txt
  * files couldn't be (theirs were unseeded; ours are pinned).
  *
  * Run: sbt "runMain graft.FixtureGen"
  */
object FixtureGen {

  val CorpusDir = "fixtures/corpus"
  val GoldenFile = "fixtures/golden_script5.tsv"

  /** Every scripted pipeline with a committed golden — one TSV per
    * variant, so the "script-equivalent pipelines" claim is pinned for
    * all of them, not just script5. */
  def goldenPipelines: Map[String, () => org.apache.spark.ml.Pipeline] = Map(
    "script1" -> (() => GraftPipelines.script1()),
    "script2" -> (() => GraftPipelines.script2()),
    "script4" -> (() => GraftPipelines.script4()),
    "script5" -> (() => GraftPipelines.script5()),
    "reglogit" -> (() => GraftPipelines.reglogit()))

  def goldenFileFor(name: String): String = s"fixtures/golden_$name.tsv"

  /** Deterministic corpus content — single source of truth, also used
    * by GoldenSpec to re-derive the corpus if needed. */
  def writeCorpus(root: Path): Unit = {
    val rnd = new Random(13)
    val posT = Seq("a WONDERFUL film!<br /><br />Loved every scene...",
      "Superb acting, great plot.<br /><br />would watch AGAIN!",
      "Excellent movie, truly amazing?!")
    val negT = Seq("an AWFUL mess...<br /><br />terrible pacing!",
      "Boring, dreadful plot.<br /><br />the worst film?!",
      "Hated it. Terrible acting...")
    val pos = root.resolve("train/pos"); val neg = root.resolve("train/neg")
    val tst = root.resolve("test")
    Files.createDirectories(pos); Files.createDirectories(neg); Files.createDirectories(tst)
    (0 until 30).foreach { i =>
      Files.writeString(pos.resolve(s"${i}_${7 + i % 3}.txt"),
        posT(i % 3) + s" take $i " + Seq.fill(5)(posT(rnd.nextInt(3))).mkString(" "))
      Files.writeString(neg.resolve(s"${i}_${1 + i % 3}.txt"),
        negT(i % 3) + s" take $i " + Seq.fill(5)(negT(rnd.nextInt(3))).mkString(" "))
    }
    (0 until 10).foreach { i =>
      val src = if (i % 2 == 0) posT else negT
      Files.writeString(tst.resolve(f"$i%05d.txt"),
        Seq.fill(4)(src(rnd.nextInt(3))).mkString(" "))
    }
  }

  /** Fit one seeded scripted pipeline on the corpus and return the
    * (name, prediction) golden rows, sorted. */
  def goldenRowsFor(spark: SparkSession, corpus: String,
                    pipeline: org.apache.spark.ml.Pipeline): Seq[(String, Double)] = {
    val clean = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("review", graft.functions.TextFunctions.cleanLower(col("review")))
    val train = clean(CorpusReader.loadLabeled(spark, s"$corpus/train"))
    val model = pipeline.fit(train)
    val scored = model.transform(clean(CorpusReader.loadUnknown(spark, s"$corpus/test")))
    scored.select("name", "prediction").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
  }

  /** script5 golden rows (kept for source compatibility). */
  def goldenRows(spark: SparkSession, corpus: String): Seq[(String, Double)] =
    goldenRowsFor(spark, corpus, GraftPipelines.script5())

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-fixtures")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Paths.get(CorpusDir)
    if (!Files.exists(root.resolve("train/pos"))) writeCorpus(root)
    Files.createDirectories(Paths.get("fixtures"))
    goldenPipelines.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      val rows = goldenRowsFor(spark, CorpusDir, mk())
      val tsv = rows.map { case (n, p) => s"$n\t$p" }.mkString("", "\n", "\n")
      Files.writeString(Paths.get(goldenFileFor(name)), tsv)
      println(s"wrote ${rows.size} golden rows to ${goldenFileFor(name)}")
    }
    spark.stop()
  }
}
