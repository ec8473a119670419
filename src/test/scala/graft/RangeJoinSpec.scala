package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** RangeJoin: the binned equi-join must be EXACTLY the inequality join
  * it replaces, for every bin-edge alignment. */
class RangeJoinSpec extends SparkSpec {

  private def points(n: Int) = spark.range(n.toLong)
    .select(col("id").as("p_id"),
      (col("id") * 37 % 1000).as("p_ts")) // wraps: many per bin, ties

  private def intervals(n: Int) = spark.range(n.toLong)
    .select(col("id").as("i_id"),
      (col("id") * 101 % 900).as("s"))
    .withColumn("e", col("s") + (col("i_id") % 5) * 40 + 1) // len 1..161

  test("binned range join == naive inequality join, including edges") {
    val p = points(400)
    val i = intervals(120)
    for (bin <- Seq(7L, 40L, 64L, 1000L)) { // non-aligned through one-bin
      val fast = RangeJoin.pointInInterval(p, i,
        col("p_ts"), col("s"), col("e"), binWidth = bin)
        .select("i_id", "p_id")
      val naive = p.join(i, col("s") <= col("p_ts") && col("p_ts") < col("e"))
        .select("i_id", "p_id")
      assert(fast.exceptAll(naive).count() == 0, s"bin=$bin extra rows")
      assert(naive.exceptAll(fast).count() == 0, s"bin=$bin missing rows")
    }
  }

  test("end-exclusive: a point exactly at interval end never matches") {
    val p = spark.range(1).select(lit(0L).as("p_id"), lit(100L).as("p_ts"))
    val i = spark.range(1).select(lit(0L).as("i_id"),
      lit(50L).as("s"), lit(100L).as("e"))
    val out = RangeJoin.pointInInterval(p, i,
      col("p_ts"), col("s"), col("e"), binWidth = 50L)
    assert(out.count() == 0)
  }

  test("oversized interval fails loudly instead of exploding storage") {
    val p = points(10)
    val i = spark.range(1).select(lit(0L).as("i_id"),
      lit(0L).as("s"), lit(100000L).as("e"))
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(p, i, col("p_ts"), col("s"), col("e"),
        binWidth = 10L, maxBinsPerInterval = 64).count()
    }
    assert(ex.getMessage != null)
  }

  test("inverted interval (end <= start) fails loudly, not a descending sequence") {
    val p = points(10)
    val i = spark.range(1).select(lit(0L).as("i_id"),
      lit(500L).as("s"), lit(100L).as("e")) // end < start: corrupted row
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(p, i, col("p_ts"), col("s"), col("e"),
        binWidth = 10L).count()
    }
    assert(ex.getMessage != null)
  }

  test("reserved bin column name in the input is rejected up front") {
    val p = points(10).withColumn("__rangejoin_bin", lit(1L))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, intervals(5),
        col("p_ts"), col("s"), col("e"), binWidth = 10L)
    }
  }

  test("plan is a hash join on the bin key, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points(100), intervals(30),
      col("p_ts"), col("s"), col("e"), binWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
