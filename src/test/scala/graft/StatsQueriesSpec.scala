package graft

import graft.queries.StatsQueries
import org.apache.spark.sql.functions._

class StatsQueriesSpec extends SparkSpec {

  import spark.implicits._

  /** Injected events fixture with hand-computable runs / duplicates:
    * user 1: view@0m, view@1m, click@2m, view@3m   → runs V[0,1] C[2] V[3]
    * user 2: click@0m, click@25m (same value)      → duplicate inside 10m? no (25m) → both kept
    * user 3: buy@0m, buy@5m (same value)           → 5m gap: second suppressed
    * value cents distinguish duplicates: user1 events all differ.  */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stats-spec").toString
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    Seq(
      (10L, ts(0), 1L, "view", 1.00, "{}"),
      (11L, ts(1), 1L, "view", 2.00, "{}"),
      (12L, ts(2), 1L, "click", 3.00, "{}"),
      (13L, ts(3), 1L, "view", 4.00, "{}"),
      (20L, ts(0), 2L, "click", 5.00, "{}"),
      (21L, ts(25), 2L, "click", 5.00, "{}"),
      (30L, ts(0), 3L, "buy", 7.00, "{}"),
      (31L, ts(5), 3L, "buy", 7.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    Seq(
      (1L, "hi", 1, 9999.99, "a", "b"),
      (2L, "lo", 5, 100.00, "a", "b"),
      (3L, "mid", 3, 500.00, "a", "b"),
      (4L, "dominated", 2, 600.00, "a", "b"),
      (5L, "tie", 5, 100.00, "a", "b"),
      (6L, "big", 9, 9999.99, "a", "b"))
      .toDF("p_partkey", "p_name", "p_size", "p_retailprice",
        "p_brand", "p_type")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    d
  }

  test("q121: runs collapse exactly on the hand fixture") {
    val m = 60000000L // one minute in micros
    val got = StatsQueries.q121Scd2Runs(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 0L, 1 * m, 2L),
      (1L, "click", 2 * m, 2 * m, 1L),
      (1L, "view", 3 * m, 3 * m, 1L),
      (2L, "click", 0L, 25 * m, 2L),
      (3L, "buy", 0L, 5 * m, 2L)))
  }

  test("q121: runs partition the stream — n_events sums to the row count") {
    val df = StatsQueries.q121Scd2Runs(spark, sf)
    val total = df.agg(sum("n_events")).first().getLong(0)
    assert(total == Tables(spark, sf).events.count())
    // adjacent runs of one user never share an event_type
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us", "event_type")
    val adjacentSame = df
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev") === col("event_type")).count()
    assert(adjacentSame == 0)
  }

  test("q122: inside-window duplicate suppressed, outside-window kept") {
    val got = StatsQueries.q122DupSuppress(spark, dir)
      .select("event_id").as[Long].collect().toSeq
    // 31 (buy@5m, same user/type/cents as 30) is the only suppression
    assert(got == Seq(10L, 11L, 12L, 13L, 20L, 21L, 30L))
  }

  test("q123: skyline on the hand fixture keeps ties and kills dominated") {
    val got = StatsQueries.q123Skyline(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    // fronts: (100.00, size 5) ties → parts 2 and 5; (9999.99, size 9) → 6.
    // part 3 (500.00, 3) and 4 (600.00, 2) dominated by 2/5; part 1
    // (9999.99, 1) dominated by everything.
    assert(got == Seq((2L, 10000L, 5), (5L, 10000L, 5), (6L, 999999L, 9)))
  }

  test("q123: prefix-scan skyline == quadratic NOT EXISTS on real parts") {
    val p = Tables(spark, sf).part.select(
      col("p_partkey"), col("p_size"),
      round(col("p_retailprice") * 100).cast("long").as("price_cents"))
    val s = p.alias("s")
    val r = p.alias("r")
    val dominated = r.join(s,
      col("s.price_cents") <= col("r.price_cents") &&
        col("s.p_size") >= col("r.p_size") &&
        (col("s.price_cents") < col("r.price_cents") ||
          col("s.p_size") > col("r.p_size")), "left_semi")
    val brute = p.exceptAll(dominated)
      .select(col("p_partkey"), col("price_cents"), col("p_size"))
    val fast = StatsQueries.q123Skyline(spark, sf)
    assert(fast.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(fast).count() == 0)
    assert(fast.count() > 0)
  }

  test("q124: slope is exact on a constructed two-type trend") {
    val d = java.nio.file.Files.createTempDirectory("graft-trend-spec").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // type "up": counts 1,2,3 on days 0,1,2 → slope exactly 1.0
    // type "flat": 2,2 on days 0,1 → slope 0.0
    val rows =
      (0L until 1L).map(i => (100 + i, ts(0), 1L, "up", 1.0, "{}")) ++
        (0L until 2L).map(i => (110 + i, ts(1), 1L, "up", 1.0, "{}")) ++
        (0L until 3L).map(i => (120 + i, ts(2), 1L, "up", 1.0, "{}")) ++
        (0L until 2L).map(i => (200 + i, ts(0), 2L, "flat", 1.0, "{}")) ++
        (0L until 2L).map(i => (210 + i, ts(1), 2L, "flat", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StatsQueries.q124TrendSlope(spark, d)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("flat", 2L, 4L, 0.0), ("up", 3L, 6L, 1.0)))
  }

  test("q125: slope is exactly -1 on a constructed 1/r spectrum") {
    val d = java.nio.file.Files.createTempDirectory("graft-zipf-spec").toString
    // freq(r) = 12/r exactly at dense ranks 1..4 (12, 6, 4, 3):
    // ln f = ln 12 − ln r, a perfect power law → OLS slope −1 within
    // ~1e-15, which round(…, 4) pins to exactly −1.0.
    val words =
      Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
        Seq.fill(4)("c") ++ Seq.fill(3)("d")
    Seq((0L, words.mkString(" "), "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = StatsQueries.q125ZipfSlope(spark, d)
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((4L, -1.0)))
  }

  test("q127: growth curve ends at the true distinct-user count") {
    val df = StatsQueries.q127DistinctGrowth(spark, sf).cache()
    val rows = df.as[(Long, Long, Long)].collect().toSeq
    val totalUsers = Tables(spark, sf).events
      .select("user_id").distinct().count()
    assert(rows.last._3 == totalUsers)
    // cumulative = running sum of n_new, and is monotone non-decreasing
    assert(rows.map(_._2).sum == totalUsers)
    assert(rows.sliding(2).forall {
      case Seq(a, b) => b._3 >= a._3 && b._1 > a._1
      case _         => true
    })
  }

  test("q128: decay score matches hand arithmetic on a 3-event user") {
    val d = java.nio.file.Files.createTempDirectory("graft-decay-spec").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    // ages 0, 1, 10 → cents 100·1 + 100·2⁻¹ + 400·2⁻¹⁰ = 150.390625
    Seq(
      (1L, ts(10), 1L, "view", 1.00, "{}"),
      (2L, ts(9), 1L, "view", 1.00, "{}"),
      (3L, ts(0), 1L, "view", 4.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StatsQueries.q128DecayScore(spark, d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 150.3906)))
  }

  test("q129: skew audit totals and bounds hold on real tables") {
    val df = StatsQueries.q129KeySkew(spark, sf).cache()
    val byRel = df.as[(String, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(byRel.keySet == Set(
      "events.user_id", "lineitem.l_suppkey", "orders.o_custkey"))
    val ev = byRel("events.user_id")
    assert(ev._3 == Tables(spark, sf).events.count())
    assert(ev._2 == Tables(spark, sf).events
      .select("user_id").distinct().count())
    // p99 ≤ max; skew ratio = max/mean ≥ 1
    df.collect().foreach { r =>
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getDouble(5) >= 1.0)
    }
  }

  test("q130: centroid cosines are exact on a constructed 3-label space") {
    val d = java.nio.file.Files.createTempDirectory("graft-centr-spec").toString
    // centroids: label 0 → (1,0); label 1 → (0,1); label 2 → (0.6,0.8)
    Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.6f, 0.8f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = graft.queries.SimilarityQueries.q130CentroidSim(spark, d)
      .as[(Int, Int, Double)].collect().toSeq
    assert(got == Seq((0, 1, 0.0), (0, 2, 0.6), (1, 2, 0.8)))
  }

  test("q130: full matrix over real labels, all cosines in [-1, 1]") {
    val df = graft.queries.SimilarityQueries.q130CentroidSim(spark, sf).cache()
    val k = Tables(spark, sf).embeddings
      .select("label").distinct().count()
    assert(df.count() == k * (k - 1) / 2)
    assert(df.filter(abs(col("cos_sim")) > 1.0).count() == 0)
  }

  test("q131: point-in-time features exclude same-time and later data") {
    val d = java.nio.file.Files.createTempDirectory("graft-pit-spec").toString
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    Seq(
      (1L, ts(0), 1L, "view", 1.00, "{}"),
      (2L, ts(60), 1L, "view", 1.00, "{}"),
      (3L, ts(120), 1L, "purchase", 10.00, "{}"),
      (4L, ts(1800), 1L, "purchase", 5.00, "{}")) // 30 h: views aged out
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StatsQueries.q131PitFeatures(spark, d)
      .select("event_id", "n_views_24h", "spend_before_cents")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 2L, 0L), (4L, 0L, 1000L)))
  }

  test("q132: null and distinct counts are exact on an injected table") {
    val d = java.nio.file.Files.createTempDirectory("graft-prof-spec").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    Seq(
      (1L, Some(5L), "A", 10.0, ts(0), "1-URGENT"),
      (2L, Some(5L), "A", 20.0, ts(0), "1-URGENT"),
      (3L, None, "B", 20.0, ts(1), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = StatsQueries.q132Profile(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("o_custkey", 1L, 1L),
      ("o_orderdate", 0L, 2L),
      ("o_orderkey", 0L, 3L),
      ("o_orderpriority", 0L, 2L),
      ("o_orderstatus", 0L, 2L),
      ("o_totalprice", 0L, 2L)))
  }

  test("q133: clean testdata audits to zero orphans on every edge") {
    val df = StatsQueries.q133RiAudit(spark, sf).cache()
    assert(df.count() == 7)
    assert(df.filter(col("n_orphans") =!= 0L).count() == 0)
    val li = df.filter(col("fk_edge") === "lineitem->orders")
      .select("n_child_rows").as[Long].head()
    assert(li == Tables(spark, sf).lineitem.count())
  }

  test("q133: an injected orphan is counted") {
    val d = java.nio.file.Files.createTempDirectory("graft-ri-spec").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    Seq((0L, "r")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$d/region.parquet")
    Seq((0L, "n", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, "c", 0L, 0.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    Seq((1L, "s", 0L, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey",
      "s_acctbal").write.parquet(s"$d/supplier.parquet")
    Seq((1L, "p", "b", "t", 1, 1.0)).toDF("p_partkey", "p_name", "p_brand",
      "p_type", "p_size", "p_retailprice").write.parquet(s"$d/part.parquet")
    // order 20 references customer 99 — an orphan
    Seq((10L, 1L, "O", 1.0, ts(0), "1"), (20L, 99L, "O", 1.0, ts(0), "1"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    // lineitem 2 references order 99 — an orphan
    Seq((10L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(0)),
      (99L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(0)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val got = StatsQueries.q133RiAudit(spark, d)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("lineitem->orders") == ((1L, 2L)))
    assert(got("orders->customer") == ((1L, 2L)))
    assert(got("lineitem->part") == ((0L, 2L)))
    assert(got("nation->region") == ((0L, 1L)))
  }

  test("q134: session paths split on the 30-minute gap") {
    val got = StatsQueries.q134SessionPaths(spark, dir)
      .as[(String, Long)].collect().toSeq
    // fixture sessions: u1 view>view>click>view (gaps 1 min);
    // u2 click>click (25 min < 30); u3 buy>buy (5 min)
    assert(got == Seq(
      ("buy>buy", 1L),
      ("click>click", 1L),
      ("view>view>click>view", 1L)))
  }

  test("q136: chi-square contributions are exact on a constructed shift") {
    val d = java.nio.file.Files.createTempDirectory("graft-drift-spec").toString
    // 8 docs, mid = 4. Source a: 3 first / 1 second; source b: 1 / 3.
    // Margins: totals per half 4/4, per source 4/4 → e = 2 everywhere.
    // contrib per source = (3−2)²/2 + (1−2)²/2 = 1.0
    Seq(
      (0L, "x", "en", "a", 1L), (1L, "x", "en", "a", 1L),
      (2L, "x", "en", "a", 1L), (3L, "x", "en", "b", 1L),
      (4L, "x", "en", "a", 1L), (5L, "x", "en", "b", 1L),
      (6L, "x", "en", "b", 1L), (7L, "x", "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = StatsQueries.q136SourceDrift(spark, d)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 3L, 1L, 1.0), ("b", 1L, 3L, 1.0)))
  }

  test("q136: contributions are non-negative and margins add up on real docs") {
    val df = StatsQueries.q136SourceDrift(spark, sf).cache()
    assert(df.filter(col("chi2_contrib") < 0).count() == 0)
    val total = df.agg(sum(col("n_first") + col("n_second")))
      .first().getLong(0)
    assert(total == Tables(spark, sf).documents.count())
  }

  test("q137: nearest join picks the closer side, breaks ties backward") {
    val d = java.nio.file.Files.createTempDirectory("graft-near-spec").toString
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    Seq(
      (100L, ts(0), 1L, "purchase", 1.0, "{}"),
      (1L, ts(3), 1L, "view", 0.0, "{}"),
      (101L, ts(4), 1L, "purchase", 1.0, "{}"),
      (200L, ts(0), 2L, "purchase", 1.0, "{}"),
      (2L, ts(5), 2L, "view", 0.0, "{}"),
      (201L, ts(10), 2L, "purchase", 1.0, "{}"),
      (3L, ts(0), 3L, "view", 0.0, "{}"),
      (400L, ts(2), 4L, "purchase", 1.0, "{}"),
      (4L, ts(2), 4L, "view", 0.0, "{}"),
      (401L, ts(7), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val m = 60000000L
    val got = StatsQueries.q137NearestJoin(spark, d)
      .select("event_id", "nearest_purchase_id", "signed_gap_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 101L, 1 * m),   // forward purchase is closer (1 min vs 3)
      (2L, 200L, -5 * m),  // exact tie → earlier purchase wins
      (3L, -1L, 0L),       // no purchases at all
      (4L, 401L, 5 * m)))  // same-instant purchase excluded
  }

  test("q138: LTV curve accumulates exact cents per cohort age") {
    val d = java.nio.file.Files.createTempDirectory("graft-ltv-spec").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    Seq(
      (1L, ts(0), 1L, "purchase", 1.00, "{}"),
      (2L, ts(2), 1L, "purchase", 2.00, "{}"),
      (3L, ts(1), 2L, "purchase", 5.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StatsQueries.q138LtvCurve(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 1L, 100L),
      (0L, 2L, 1L, 300L),
      (1L, 0L, 1L, 500L)))
  }

  test("q139: DAU/WAU cover-explode matches the hand-computed windows") {
    val d = java.nio.file.Files.createTempDirectory("graft-wau-spec").toString
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(3), 1L, "view", 0.0, "{}"),
      (3L, ts(3), 2L, "view", 0.0, "{}"),
      (4L, ts(8), 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StatsQueries.q139ActiveUsers(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    // day 8's trailing week [2..8] still contains day-3 actives
    assert(got == Seq((0L, 1L, 1L), (3L, 2L, 2L), (8L, 1L, 3L)))
  }

  test("window-family plans: one user-keyed exchange plus the output sort") {
    // pins the scale claim in the scaladocs: q121/q131 do all their
    // window work behind a single hashpartitioning(user_id) exchange —
    // the only other exchange is the presentation sort's range partition
    for (q <- Seq(
        StatsQueries.q121Scd2Runs(spark, sf),
        StatsQueries.q131PitFeatures(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val rangeEx = "Exchange rangepartitioning".r.findAllIn(plan).length
      assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$plan")
      assert(rangeEx <= 1, s"expected <=1 range exchange:\n$plan")
    }
  }

  test("degenerate inputs: single-price skyline, tiny-vocab zipf, single runs") {
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-degen-$tag").toString
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

    // every part at ONE price: front = the max-size parts at that price
    val d1 = tmp("sky")
    Seq((1L, "a", 3, 100.0, "b", "t"), (2L, "a", 5, 100.0, "b", "t"),
      (3L, "a", 5, 100.0, "b", "t"))
      .toDF("p_partkey", "p_name", "p_size", "p_retailprice",
        "p_brand", "p_type")
      .write.parquet(s"$d1/part.parquet")
    assert(StatsQueries.q123Skyline(spark, d1)
      .select("p_partkey").as[Long].collect().toSeq == Seq(2L, 3L))

    // vocabulary smaller than the top-K budget: fit still runs (n_top=2)
    val d2 = tmp("zipf")
    Seq((0L, "a a a b", "en", "t", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d2/documents.parquet")
    val z = StatsQueries.q125ZipfSlope(spark, d2)
      .as[(Long, Double)].collect().head
    assert(z._1 == 2L && !z._2.isNaN)

    // one event per user: every run is a singleton, nothing suppressed
    val d3 = tmp("runs")
    Seq((1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(0), 2L, "buy", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d3/events.parquet")
    assert(StatsQueries.q121Scd2Runs(spark, d3).count() == 2)
    assert(StatsQueries.q122DupSuppress(spark, d3).count() == 2)
    // single active day: the trailing week equals the day itself
    assert(StatsQueries.q139ActiveUsers(spark, d3)
      .as[(Long, Long, Long)].collect().toSeq == Seq((0L, 2L, 2L)))
  }

  test("q140: a weekday spike is anomalous against its own dow median") {
    val d = java.nio.file.Files.createTempDirectory("graft-seas-spec").toString
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(day * 86400000L + i * 1000L)
    // three consecutive same-dow days (7 apart) with counts 2,2,9:
    // dow median = 2 → day 14 (count 9 > 2×2) flags; a different dow
    // with a single day (its own median) never flags
    val rows =
      (0L until 2L).map(i => (100 + i, ts(0, i), 1L, "view", 0.0, "{}")) ++
        (0L until 2L).map(i => (200 + i, ts(7, i), 1L, "view", 0.0, "{}")) ++
        (0L until 9L).map(i => (300 + i, ts(14, i), 1L, "view", 0.0, "{}")) ++
        (0L until 3L).map(i => (400 + i, ts(1, i), 1L, "view", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = StatsQueries.q140SeasonalAnomaly(spark, d)
      .select("day", "c", "dow_med", "is_anomaly")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, false), (1L, 3L, 3L, false),
      (7L, 2L, 2L, false), (14L, 9L, 2L, true)))
  }

  test("q126: salted distinct equals plain countDistinct on real events") {
    val got = StatsQueries.q126SaltedDistinct(spark, sf)
      .as[(String, Long)].collect().toMap
    val want = Tables(spark, sf).events
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
