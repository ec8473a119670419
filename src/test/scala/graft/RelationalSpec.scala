package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q01 scan/filter/project pushes filter and prunes columns") {
    val df = Relational.q01ScanFilterProject(spark, sf)
    assert(df.columns.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
    assert(df.count() > 0)
    // every surviving row satisfies the predicate
    assert(df.filter(col("l_quantity") <= 45).count() == 0)
    // the filter must reach the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"filter not pushed down:\n$plan")
  }

  test("q02 pricing summary groups are complete and disjoint") {
    val df = Relational.q02AggPricing(spark, sf).cache()
    val total = df.agg(sum("cnt")).first().getLong(0)
    val liCount = Tables(spark, sf).lineitem.count()
    assert(total == liCount)
  }

  test("q03 broadcast join plans a BroadcastHashJoin") {
    val df = Relational.q03JoinBroadcast(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(df.count() > 0)
  }

  test("q05/q06 semi+anti partition orders exactly") {
    val t = Tables(spark, sf)
    val semi = t.orders.join(t.lineitem,
      col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val anti = Relational.q06AntiJoin(spark, sf).count()
    assert(semi + anti == t.orders.count())
  }

  test("q09 top-k is ordered desc and bounded") {
    val rows = Relational.q09TopK(spark, sf).collect()
    assert(rows.length == 10)
    val bals = rows.map(_.getAs[Double]("c_acctbal"))
    assert(bals.sameElements(bals.sorted.reverse))
  }

  test("q10 rank never exceeds 3 and starts at 1 per user") {
    val df = Relational.q10WindowRank(spark, sf).cache()
    assert(df.agg(max("rn")).first().getLong(0) <= 3)
    assert(df.filter(col("rn") === 1).count() ==
      df.select("user_id").distinct().count())
  }

  test("q11 running sum final value equals user total") {
    val df = Relational.q11WindowRunning(spark, sf)
    val lastPerUser = df.groupBy("user_id")
      .agg(max("running_value").as("final"))
    val totals = Tables(spark, sf).events.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
    val joined = lastPerUser.join(totals, "user_id")
      .filter(abs(col("final") - col("total")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("q102 anomalies all exceed twice their type median") {
    val df = Relational.q102RateAnomaly(spark, sf).cache()
    // every reported hour violates the 2×-median bar by construction
    assert(df.filter(col("n") <= lit(2) * col("med")).count() == 0)
    // med is a count actually attained by some hour of that type
    assert(df.filter(col("med") <= 0).count() == 0)
    // the ratio restates n/med
    assert(df.filter(abs(col("ratio") * col("med") - col("n")) >
      lit(0.001) * col("med")).count() == 0)
  }

  test("q103 latency histogram counts each converting user once") {
    val df = Relational.q103ConversionLatency(spark, sf)
    val histTotal = df.agg(sum("n_users")).first().getLong(0)
    // independent ground truth: users with a purchase strictly after
    // their first view
    val ev = Tables(spark, sf).events
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("v_ts"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("ts_us") > col("v_ts"))
      .select("user_id").distinct().count()
    assert(histTotal == conv)
    assert(df.filter(col("delay_hours") < 0).count() == 0)
  }

  test("q104 equals the window-function formulation of the correlated avg") {
    val df = Relational.q104SmallQtyRevenue(spark, sf)
    val total = df.agg(sum("n_small")).first().getLong(0)
    // independent formulation: the same correlated aggregate as a
    // partition window instead of groupBy + join-back
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val alt = Tables(spark, sf).lineitem
      .withColumn("avg_qty",
        sum(col("l_quantity").cast("long")).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .count()
    assert(total == alt)
  }

  test("q105 equals Catalyst's own EXISTS / NOT EXISTS decorrelation") {
    val t = Tables(spark, sf)
    t.lineitem.createOrReplaceTempView("li_v")
    t.orders.createOrReplaceTempView("ord_v")
    val exists = spark.sql(
      """WITH j AS (
        |  SELECT l_orderkey, l_suppkey,
        |    datediff(l_shipdate, o_orderdate) > 60 AS late
        |  FROM li_v JOIN ord_v ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT l_suppkey, count(*) AS numwait FROM (
        |  SELECT DISTINCT j1.l_orderkey, j1.l_suppkey FROM j j1
        |  WHERE j1.late
        |    AND EXISTS (SELECT 1 FROM j j2
        |      WHERE j2.l_orderkey = j1.l_orderkey
        |        AND j2.l_suppkey <> j1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM j j3
        |      WHERE j3.l_orderkey = j1.l_orderkey
        |        AND j3.l_suppkey <> j1.l_suppkey AND j3.late))
        |GROUP BY l_suppkey""".stripMargin)
    val got = Relational.q105LoneLateSupplier(spark, sf)
      .select(col("s_suppkey").as("l_suppkey"), col("numwait").as("nw"))
    // the top-20 rows must carry exactly the counts the correlated
    // formulation assigns
    assert(got.join(exists, "l_suppkey")
      .filter(col("nw") =!= col("numwait")).count() == 0)
    assert(got.join(exists, Seq("l_suppkey"), "left_anti").count() == 0)
  }

  test("q112 quintile scores are 1..5 with balanced bucket sizes") {
    val df = Relational.q112RfmSegments(spark, sf).cache()
    val n = df.count()
    for (c <- Seq("r_score", "f_score", "m_score")) {
      assert(df.filter(col(c) < 1 || col(c) > 5).count() == 0)
      val sizes = df.groupBy(c).count()
        .collect().map(_.getLong(1))
      assert(sizes.length == 5)
      assert(sizes.forall(s => s >= n / 5 && s <= n / 5 + 1), s"$c: ${sizes.toSeq}")
    }
    // segment restates the three scores
    val bad = df.filter(col("segment") =!= concat(
      col("r_score").cast("string"), col("f_score").cast("string"),
      col("m_score").cast("string")))
    assert(bad.count() == 0)
  }

  test("q117 grouping sets: subtotals reconcile with the grand total") {
    val df = Relational.q117GroupingSets(spark, sf).cache()
    val total = df.filter(col("g_seg") === 1 && col("g_prio") === 1)
    assert(total.count() == 1)
    val n = total.first().getAs[Long]("n_orders")
    // each dimension's subtotals partition the same order set
    val bySeg = df.filter(col("g_seg") === 0 && col("g_prio") === 1)
      .agg(sum("n_orders")).first().getLong(0)
    val byPrio = df.filter(col("g_seg") === 1 && col("g_prio") === 0)
      .agg(sum("n_orders")).first().getLong(0)
    assert(bySeg == n && byPrio == n)
    // no (0,0) rows: the sets are one-dimensional + grand total only
    assert(df.filter(col("g_seg") === 0 && col("g_prio") === 0).count() == 0)
  }

  test("q116 star join: revenue ordered desc, all-ASIA nations positive") {
    val df = Relational.q116RegionRevenue(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0.0))
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("q119 outliers all exceed twice the MAD; ratio restates the bar") {
    val df = Relational.q119MadOutliers(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("mad_ratio") <= 2.0).count() == 0)
    assert(df.filter(col("deviation_cents") <= 0).count() == 0)
  }

  test("q120 cusum is zero at the last day and flags exactly one peak") {
    val df = Relational.q120Changepoint(spark, sf).cache()
    // S_D = D·N − D·N = 0 by construction
    val last = df.orderBy(col("day").desc).first()
    assert(last.getAs[Long]("cusum") == 0L)
    assert(df.filter(col("is_changepoint")).count() == 1)
    // the flagged day attains the max |cusum|
    val mx = df.agg(max(abs(col("cusum")))).first().getLong(0)
    val peak = df.filter(col("is_changepoint")).first()
    assert(math.abs(peak.getAs[Long]("cusum")) == mx)
  }

  test("q13 hourly rollup covers all events") {
    val df = Relational.q13HourlyRollup(spark, sf)
    val n = df.agg(sum("n_events")).first().getLong(0)
    assert(n == Tables(spark, sf).events.count())
  }

  test("q14 sessions: session count within [1, events] per user") {
    val df = Relational.q14Sessionize(spark, sf).cache()
    val n = df.agg(sum("n_events")).first().getLong(0)
    assert(n == Tables(spark, sf).events.count())
    // session indexes are 1..k contiguous per user
    val bad = df.groupBy("user_id")
      .agg(max("session_idx").as("mx"), count(lit(1)).as("k"))
      .filter(col("mx") =!= col("k"))
    assert(bad.count() == 0)
  }

  test("q107 tiers mine identical pairs (kernel vs forced join fallback)") {
    // sf0.01 is the smallest corpus where pairs actually clear the
    // support floor (the oracle's 50 rows); cap = 0 forces the
    // above-cap broadcast self-join tier that the normal catalog run
    // never exercises now that the kernel tier covers the test SFs
    val kernel = graft.queries.Relational
      .q107FrequentPairs(spark, sfMid).collect()
    val fallback = graft.queries.Relational
      .frequentPairsTiered(spark, sfMid, 0).collect()
    assert(kernel.nonEmpty)
    assert(kernel.sameElements(fallback))
  }
}
