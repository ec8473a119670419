package graft

import graft.operators.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Pins the scale-safe global-order devices to their single-partition
  * window equivalents, and asserts the two catalog adopters (q146/q152)
  * really did leave the single-partition-window plan shape behind. */
class GlobalRankSpec extends SparkSpec {

  import spark.implicits._

  private def randomScores(n: Int, seed: Int) = {
    val rnd = new Random(seed)
    // duplicate keys on purpose: ties must resolve via the tiebreak
    (1 to n).map(i => (rnd.nextInt(40) / 7.0, i.toLong)).toDF("key", "id")
  }

  test("withRowNumber == row_number() over a global window") {
    val df = randomScores(500, 11)
    val expected = df
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("key"), col("id"))).cast("long"))
      .orderBy("id").collect()
    val got = GlobalRank.withRowNumber(
        df, Seq(col("key"), col("id")), "rk", numPartitions = 7)
      .orderBy("id").collect()
    assert(got.sameElements(expected))
  }

  test("withRowNumber handles desc keys and more partitions than rows") {
    val df = randomScores(5, 3)
    val expected = df
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("key").desc, col("id"))).cast("long"))
      .orderBy("id").collect()
    val got = GlobalRank.withRowNumber(
        df, Seq(col("key").desc, col("id")), "rk", numPartitions = 16)
      .orderBy("id").collect()
    assert(got.sameElements(expected))
  }

  test("topKBoundary is the k-th (key desc, id asc) pair exactly") {
    val df = randomScores(300, 7).repartition(5)
    val sorted = df.orderBy(col("key").desc, col("id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    for (k <- Seq(1, 2, 17, 299, 300))
      assert(GlobalRank.topKBoundary(df, k).contains(sorted(k - 1)), s"k=$k")
    assert(GlobalRank.topKBoundary(df, 301).isEmpty)
  }

  test("q146/q152/q88/q112/q119 plan no Window at all (global ranks and the skew-prone token window left the plan)") {
    for ((name, fn) <- Seq(
        "q146" -> graft.queries.TextQueries.q146DsirResample _,
        "q152" -> graft.queries.TextQueries.q152PerplexityBuckets _,
        "q88" -> graft.queries.TextQueries.q88InvertedIndex _,
        "q112" -> graft.queries.Relational.q112RfmSegments _,
        "q119" -> graft.queries.Relational.q119MadOutliers _)) {
      val plan = fn(spark, sf).queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty, s"$name still plans a WindowExec")
    }
  }
}
