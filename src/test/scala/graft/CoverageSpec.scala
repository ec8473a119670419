package graft

import java.nio.file.Files
import graft.ml.GraftPipelines
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** Closes the SURVEY.md §2 operators not already exercised elsewhere:
  * S5 (LibSVM source), T1 (plain ml Tokenizer), T6 (L2 normalizer),
  * F2 (top-k χ² selector), X1 (seeded split laws), and the P1-vs-P4
  * path-equivalence property from FIXTURES.md §A3. */
class CoverageSpec extends SparkSpec {

  import spark.implicits._

  test("S5: libsvm source reads (label, features) rows") {
    val dir = Files.createTempDirectory("graft-libsvm")
    val f = dir.resolve("sample.txt")
    Files.writeString(f, "1.0 1:0.5 3:0.25\n0.0 2:1.0\n1.0 1:0.1 2:0.2 3:0.3\n")
    val df = spark.read.format("libsvm").option("numFeatures", "3").load(f.toString)
    assert(df.columns.toSeq == Seq("label", "features"))
    assert(df.count() == 3)
    val v = df.orderBy(desc("label")).first().getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(v.size == 3)
  }

  test("T1: plain ml Tokenizer lowercases and splits on whitespace") {
    val df = Seq("Hi I heard about Spark").toDF("review")
    val out = GraftPipelines.simpleTokenizer("review", "words").transform(df)
      .select("words").first().getSeq[String](0)
    assert(out == Seq("hi", "i", "heard", "about", "spark"))
  }

  test("T6: L2 normalizer produces unit vectors") {
    val df = Seq(Tuple1(Vectors.dense(3.0, 4.0))).toDF("vec")
    val out = GraftPipelines.l2Normalizer("vec", "norm").transform(df)
      .select("norm").first().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(math.abs(out(0) - 0.6) < 1e-12 && math.abs(out(1) - 0.8) < 1e-12)
  }

  test("F2: top-k chi-squared selector keeps exactly k features") {
    val rows = (1 to 100).map { i =>
      val label = (i % 2).toDouble
      // feature 0 correlates with label; 1..3 are noise
      val f = Vectors.dense(label, (i % 3).toDouble, (i % 5).toDouble, (i % 7).toDouble)
      (label, f)
    }
    val df = rows.toDF("label", "features")
    val model = GraftPipelines
      .topKChiSqSelector("features", "label", "selected", k = 2).fit(df)
    assert(model.selectedFeatures.length == 2)
    assert(model.selectedFeatures.contains(0)) // the informative feature survives
    val out = model.transform(df).select("selected").first()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(out.size == 2)
  }

  test("X1: seeded randomSplit is deterministic, disjoint, and complete") {
    val data = Tables(spark, sf).documents.select("doc_id")
    val Array(a1, b1) = data.randomSplit(Array(0.8, 0.2), seed = 42)
    val Array(a2, b2) = data.randomSplit(Array(0.8, 0.2), seed = 42)
    assert(a1.collect().map(_.getLong(0)).sorted
      .sameElements(a2.collect().map(_.getLong(0)).sorted))
    assert(a1.count() + b1.count() == data.count())
    assert(a1.join(b1, "doc_id").count() == 0)
  }

  test("from_json parses event props into a typed struct") {
    val parsed = Tables(spark, sf).events
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .select(col("event_id"), col("p.k").as("k"))
    assert(parsed.filter(col("k").isNull).count() == 0)
    // spot-check against the string-path extraction
    val viaString = Tables(spark, sf).events
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
    assert(parsed.exceptAll(viaString).count() == 0)
  }

  test("P1-vs-P4 equivalence: clean-then-tokenize == tokenize-then-lower") {
    import graft.functions.TextFunctions._
    // on <br/>-free text, lowering before or after wordpunct tokenization
    // commutes (the regex classes are case-insensitive)
    val docs = Seq("Good Movie, LOVED it!", "An AWFUL plot...", "B-movie at BEST")
      .toDF("review")
    val a = docs.select(wordPunctTokens(lower(col("review"))).as("t"))
      .collect().map(_.getSeq[String](0))
    val b = docs.select(transform(wordPunctTokens(col("review")),
        t => lower(t)).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(a.toSeq.map(_.toList) == b.toSeq.map(_.toList))
  }
}
