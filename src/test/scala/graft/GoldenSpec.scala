package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Cross-round drift guard: the committed fixtures/golden_script5.tsv
  * must be exactly reproduced by the live pipeline over the committed
  * corpus. If Spark-version or engine changes alter behavior, this
  * fails loudly and the golden is consciously regenerated via
  * `sbt "runMain graft.FixtureGen"`. */
class GoldenSpec extends SparkSpec {

  test("script5 reproduces the committed golden predictions") {
    assume(Files.exists(Paths.get(FixtureGen.GoldenFile)),
      "fixtures not generated")
    val expected = Files.readAllLines(Paths.get(FixtureGen.GoldenFile)).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(n, p) = l.split("\t"); (n, p.toDouble) }.toSeq
    val actual = FixtureGen.goldenRows(spark, FixtureGen.CorpusDir)
    assert(actual == expected)
  }
}
