package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  /** Shared fixture, created once for whichever test runs first — each
    * test is standalone (review caught an inter-test dependency). */
  private lazy val bucketedTables: Unit = {
    val t = Tables(spark, sf)
    Bucketing.writeBucketed(
      t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
        .withColumnRenamed("l_orderkey", "orderkey"),
      "li_bucketed", "orderkey", buckets = 4)
    Bucketing.writeBucketed(
      t.orders.select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "orderkey"),
      "ord_bucketed", "orderkey", buckets = 4)
  }

  test("bucketed join on the bucket key plans no Exchange (co-located)") {
    val t = Tables(spark, sf)
    bucketedTables

    // at test scale the planner would broadcast the small side (also
    // shuffle-free, but not the property under test) — disable it so a
    // sort-merge join must be planned, as it would be fact-vs-fact
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "ord_bucketed", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      // both scans are bucketed on the join key -> no shuffle anywhere
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")

      // and it computes the right thing
      val expected = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key also skips the exchange") {
    bucketedTables
    val agg = spark.table("li_bucketed")
      .groupBy("orderkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free aggregation on bucket key:\n$plan")
  }

  test("approximate aggregates land within tolerance of exact") {
    val e = Tables(spark, sf).events
    val r = e.agg(
      countDistinct("user_id").as("exact"),
      approx_count_distinct("user_id", 0.02).as("approx")).first()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")

    val Array(q25, q50, q75) =
      e.stat.approxQuantile("value", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 <= q50 && q50 <= q75)
    assert(q50 > 0)
  }

  test("partitionBy layout prunes partitions at read time") {
    // the OTHER half of write-time layout next to bucketing: a table
    // partitioned by a low-cardinality column turns equality filters
    // into directory pruning — the scan never opens non-matching files
    val d = java.nio.file.Files
      .createTempDirectory("graft-partspec").toString
    Tables(spark, sf).events
      .withColumn("day", expr("ts_ns DIV 86400000000000"))
      .write.mode("overwrite").partitionBy("day").parquet(d)
    val back = spark.read.parquet(d)
    val days = back.select("day").distinct().count()
    assert(days > 1, "fixture needs multiple day partitions")
    // partition-dir values read back type-inferred (int32 here)
    val one = back.filter(col("day") === back.agg(
      min("day").cast("long")).first().getLong(0))
    val scan = one.queryExecution.executedPlan.toString
    // the day predicate must appear as a PARTITION filter (pruned
    // before IO), not a data filter evaluated per row
    assert(scan.contains("PartitionFilters") &&
      scan.split("PartitionFilters", 2)(1).takeWhile(_ != ']')
        .contains("day"),
      s"day filter not pushed to partition pruning:\n$scan")
    assert(one.count() > 0)
  }

  test("SQL surface answers the same query as the DataFrame catalog") {
    val viaSql = GraftSql.sql(spark, sf,
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaDf = Tables(spark, sf).lineitem
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSql.sameElements(viaDf))
  }
}
