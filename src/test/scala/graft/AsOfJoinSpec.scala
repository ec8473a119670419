package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left(rows: (Long, Long, Long)*) =
    rows.toDF("event_id", "user_id", "ts")
  private def right(rows: (Long, Long, Long)*) =
    rows.toDF("event_id", "user_id", "ts")

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOf(l, r, key = "user_id", ts = "ts",
        leftId = "event_id", rightId = "event_id")
      .select("event_id", "asof_id", "asof_ts")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap

  test("matches the latest strictly-prior right row per key") {
    val m = run(
      left((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L)),
      right((1L, 1L, 20L), (2L, 1L, 40L), (3L, 2L, 60L)))
    assert(m(100L) == (Some(2L), Some(40L))) // latest of the two priors
    assert(m(101L) == (None, None))          // nothing before ts=10
    assert(m(102L) == (None, None))          // right row is later, no match
  }

  test("equal timestamps do NOT match (strict), and keys never cross") {
    val m = run(
      left((100L, 1L, 30L), (101L, 2L, 30L)),
      right((1L, 1L, 30L), (2L, 2L, 25L)))
    assert(m(100L) == (None, None))          // same-ts right row excluded
    assert(m(101L) == (Some(2L), Some(25L))) // other user's row unaffected
  }

  test("among equal-ts right rows the largest rightId wins, deterministically") {
    val m = run(
      left((100L, 1L, 50L)),
      right((5L, 1L, 20L), (9L, 1L, 20L), (7L, 1L, 20L)))
    assert(m(100L) == (Some(9L), Some(20L)))
  }

  test("left payload columns survive and row count is exactly |left|") {
    val l = left((100L, 1L, 50L), (101L, 1L, 60L)).withColumn("payload", lit("x"))
    val out = AsOfJoin.asOf(l, right((1L, 1L, 55L)), "user_id", "ts",
      "event_id", "event_id")
    assert(out.count() == 2)
    assert(out.columns.toSet ==
      Set("event_id", "user_id", "ts", "payload", "asof_id", "asof_ts"))
    assert(out.filter(col("payload") =!= "x").count() == 0)
  }

  test("plan has no cartesian/broadcast-nested-loop join") {
    val l = left((100L, 1L, 50L))
    val plan = AsOfJoin.asOf(l, right((1L, 1L, 20L)), "user_id", "ts",
      "event_id", "event_id").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  private def runFwd(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asOfForward(l, r, key = "user_id", ts = "ts",
        leftId = "event_id", rightId = "event_id")
      .select("event_id", "asof_id", "asof_ts")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap

  test("forward: matches the earliest strictly-later right row") {
    val m = runFwd(
      left((100L, 1L, 10L), (101L, 1L, 50L), (102L, 2L, 50L)),
      right((1L, 1L, 20L), (2L, 1L, 40L), (3L, 2L, 30L)))
    assert(m(100L) == (Some(1L), Some(20L))) // nearest of the two laters
    assert(m(101L) == (None, None))          // nothing after ts=50
    assert(m(102L) == (None, None))          // right row is earlier
  }

  test("forward: equal ts excluded; equal-later-ts ties go to smallest id") {
    val m = runFwd(
      left((100L, 1L, 30L), (101L, 2L, 10L)),
      right((1L, 1L, 30L), (7L, 2L, 20L), (3L, 2L, 20L)))
    assert(m(100L) == (None, None))          // same-ts right row excluded
    assert(m(101L) == (Some(3L), Some(20L))) // smallest id at the instant
  }
}
