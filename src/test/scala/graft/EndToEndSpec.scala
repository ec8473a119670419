package graft

import java.nio.file.{Files, Path}
import graft.ml.GraftPipelines
import graft.sources.CorpusReader
import org.apache.spark.sql.functions._

/** FIXTURES.md §A1 end-to-end: a reference-shaped mini-corpus on disk
  * (one doc per file, `<br /><br />` breaks, mixed case, punctuation
  * runs) through the full script1 pipeline to the TSV prediction sink —
  * the complete lifecycle a user of the reference runs, regenerated
  * goldens included (reference goldens are irreproducible, SURVEY §7.4).
  */
class EndToEndSpec extends SparkSpec {

  import spark.implicits._

  // single source of truth for the corpus shape — shared with the
  // committed golden fixtures (review caught an em-dash drift between
  // two copy-pasted generators)
  private def writeCorpus(root: Path): Unit = FixtureGen.writeCorpus(root)

  test("script5 end-to-end: corpus dirs -> train -> predict -> TSV golden") {
    val root = Files.createTempDirectory("graft-e2e")
    writeCorpus(root)

    val train = CorpusReader.loadLabeled(spark, s"$root/train")
      .withColumn("review", graft.functions.TextFunctions.cleanLower(col("review")))
    assert(train.count() == 60)

    val model = GraftPipelines.script5().fit(train)

    val unknown = CorpusReader.loadUnknown(spark, s"$root/test")
      .withColumn("review", graft.functions.TextFunctions.cleanLower(col("review")))
    val scored = model.transform(unknown)

    // the model must actually separate the two halves of the test set
    val acc = scored
      .withColumn("expected", when(col("name").cast("int") % 2 === 0, 1.0).otherwise(0.0))
      // alphabetDesc indexer: "1.0" -> 0.0, "0.0" -> 1.0; map back
      .withColumn("pred_label", when(col("prediction") === 0.0, 1.0).otherwise(0.0))
      .filter(col("expected") === col("pred_label")).count() / 10.0
    assert(acc >= 0.8, s"end-to-end accuracy $acc")

    // S6 sink: docid \t prediction, one row per test doc
    val out = root.resolve("preds").toString
    CorpusReader.writeTsv(scored, out, single = true)
    val lines = spark.read.option("sep", "\t")
      .schema("name STRING, prediction STRING").csv(out)
    assert(lines.count() == 10)
    assert(lines.filter(length(col("name")) === 5).count() == 10) // 00000-style ids

    // regenerated-golden determinism: a fresh fit + transform produces
    // the identical prediction set (seeded split, pinned indexer)
    val model2 = GraftPipelines.script5().fit(train)
    val scored2 = model2.transform(unknown)
    val a = scored.select("name", "prediction").as[(String, Double)].collect().sortBy(_._1)
    val b = scored2.select("name", "prediction").as[(String, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }
}
