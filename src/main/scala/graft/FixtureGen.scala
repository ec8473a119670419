package graft

import java.nio.file.{Files, Path, Paths}
import graft.ml.GraftPipelines
import graft.sources.CorpusReader
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Fit-function form of the scripted variants: train → (test → scored).
    * Generalizes goldenPipelines so script3's two-phase fit (the χ²
    * selector's slice indices depend on the fitted vectors,
    * GraftPipelines.script3Fit) gets a committed golden too — the
    * reference commits `classifications_script3.txt` alongside the
    * single-pipeline scripts (`script3_ter.py:199-210`). */
  def goldenFitters: Map[String, DataFrame => DataFrame => DataFrame] =
    goldenPipelines.map { case (name, mk) =>
      name -> ((train: DataFrame) => {
        val model = mk().fit(train); (test: DataFrame) => model.transform(test)
      })
    } + ("script3" -> ((train: DataFrame) => {
      val (vecModel, downstream) = GraftPipelines.script3Fit(train)
      (test: DataFrame) => downstream.transform(vecModel.transform(test))
    }))

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

  /** Fit one seeded scripted variant on the corpus and return the
    * (name, prediction) golden rows, sorted. */
  def goldenRowsForFitter(spark: SparkSession, corpus: String,
                          fit: DataFrame => DataFrame => DataFrame): Seq[(String, Double)] = {
    val clean = (df: DataFrame) =>
      df.withColumn("review", graft.functions.TextFunctions.cleanLower(col("review")))
    val train = clean(CorpusReader.loadLabeled(spark, s"$corpus/train"))
    val scored = fit(train)(clean(CorpusReader.loadUnknown(spark, s"$corpus/test")))
    scored.select("name", "prediction").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
  }

  /** Pipeline overload (kept for source compatibility). */
  def goldenRowsFor(spark: SparkSession, corpus: String,
                    pipeline: org.apache.spark.ml.Pipeline): Seq[(String, Double)] =
    goldenRowsForFitter(spark, corpus,
      train => { val m = pipeline.fit(train); m.transform(_) })

  /** script5 golden rows (kept for source compatibility). */
  def goldenRows(spark: SparkSession, corpus: String): Seq[(String, Double)] =
    goldenRowsFor(spark, corpus, GraftPipelines.script5())

  // ------------------------------------------- distribution-level corpus

  /** Seeded ~2k-doc synthetic sentiment corpus for the distribution-level
    * fidelity check. The reference's recorded predicted label splits on
    * the full 25k IMDB test set are ≈balanced (neg fraction 0.393–0.509,
    * BASELINE.md "Predicted label split"); its goldens are not
    * row-reproducible (unseeded splits, hash drift), so fidelity is
    * asserted at this level: a balanced test set must score ≈balanced.
    * Docs are mostly-neutral token mixtures with a sentiment-bearing
    * minority plus cross-class noise, so classifiers are good but
    * imperfect — like the IMDB task itself.
    * Returns (train(review,label), test(name,review)) with the test set
    * balanced by construction (even index → pos-generated). */
  def syntheticCorpus(spark: SparkSession, nTrainPerClass: Int = 800,
                      nTest: Int = 400, seed: Long = 97L): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    val posW = Vector("wonderful", "superb", "great", "excellent", "amazing",
      "loved", "delightful", "masterful", "brilliant", "moving")
    val negW = Vector("awful", "terrible", "boring", "dreadful", "worst",
      "hated", "tedious", "clumsy", "lifeless", "grating")
    val neut = Vector("film", "movie", "scene", "plot", "actor", "story",
      "camera", "director", "screen", "script", "character", "dialogue",
      "music", "ending", "minute", "review", "watch", "time", "year", "cast")
    def doc(ownW: Vector[String], otherW: Vector[String]): String = {
      val n = 25 + rnd.nextInt(15)
      Seq.fill(n) {
        val r = rnd.nextDouble()
        if (r < 0.70) neut(rnd.nextInt(neut.size))
        else if (r < 0.94) ownW(rnd.nextInt(ownW.size))
        else otherW(rnd.nextInt(otherW.size)) // cross-class noise
      }.mkString(" ")
    }
    import spark.implicits._
    val train = ((0 until nTrainPerClass).map(_ => (doc(posW, negW), 1.0)) ++
      (0 until nTrainPerClass).map(_ => (doc(negW, posW), 0.0)))
      .toDF("review", "label")
    val test = (0 until nTest).map { i =>
      (f"t$i%05d", if (i % 2 == 0) doc(posW, negW) else doc(negW, posW))
    }.toDF("name", "review")
    (train, test)
  }

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
    goldenFitters.toSeq.sortBy(_._1).foreach { case (name, fit) =>
      val rows = goldenRowsForFitter(spark, CorpusDir, fit)
      val tsv = rows.map { case (n, p) => s"$n\t$p" }.mkString("", "\n", "\n")
      Files.writeString(Paths.get(goldenFileFor(name)), tsv)
      println(s"wrote ${rows.size} golden rows to ${goldenFileFor(name)}")
    }
    spark.stop()
  }
}
