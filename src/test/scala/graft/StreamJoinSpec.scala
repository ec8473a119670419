package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import graft.typed.TypedOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]

    val q = EventStreams.purchaseAttribution(
        clicks.toDF().toDF("user_id", "ts"),
        purchases.toDF().toDF("user_id", "ts", "value"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()

    clicks.addData((1L, ts(10)), (1L, ts(50)), (2L, ts(20)))
    purchases.addData((1L, ts(60), 99.0))  // within 1h of both clicks of user 1
    purchases.addData((2L, ts(200), 50.0)) // click 3h earlier -> no match
    q.processAllAvailable()
    clicks.addData((9L, ts(600)))          // advance watermarks
    purchases.addData((9L, ts(600), 0.0))
    q.processAllAvailable()

    val rows = spark.table("attrib")
      .select("user_id", "click_ts").as[(Long, Timestamp)].collect()
    q.stop()
    val u1 = rows.filter(_._1 == 1L).map(_._2).toSet
    assert(u1 == Set(ts(10), ts(50)), s"got $u1") // both clicks attributed
    assert(!rows.exists(_._1 == 2L))              // stale click not joined
  }

  test("typed Dataset aggregation matches the relational result") {
    val os = TypedOps.orders(spark, sf)
    val typed = TypedOps.spendPerCustomer(os)
      .collect().map(c => c.custkey -> (c.orders, math.round(c.total * 100)))
      .toMap
    val relational = Tables(spark, sf).orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("t"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap
    assert(typed.keySet == relational.keySet)
    // counts must match exactly; sums to cent precision (double fold order)
    assert(typed.forall { case (k, (n, t)) =>
      relational(k)._1 == n && math.abs(relational(k)._2 - t) <= 1 })
  }

  test("typed Aggregator plans with map-side partial aggregation") {
    // the Aggregator must NOT shuffle full rows: the physical plan has a
    // partial spendagg phase before the exchange and only (key, buffer)
    // crosses it — the groupByKey+mapGroups formulation this replaced
    // shipped whole Order rows and aggregated only after the shuffle
    val plan = TypedOps.spendPerCustomer(TypedOps.orders(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_spendagg"),
      s"expected partial aggregation phase in plan:\n$plan")
    assert(!plan.contains("MapGroups"), "must not fall back to mapGroups")
    // cent-exact longs: identical result under any partitioning
    val a = TypedOps.spendPerCustomer(TypedOps.orders(spark, sf))
      .collect().map(c => c.custkey -> c.total).toMap
    val b = TypedOps.spendPerCustomer(
        TypedOps.orders(spark, sf).repartition(7))
      .collect().map(c => c.custkey -> c.total).toMap
    assert(a == b, "sum must be deterministic under repartitioning")
  }
}
