package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.queries.SketchQueries

/** Sketches (HLL, bloom) and chunking: structural guarantees the oracle
  * hash-check can't express — HLL error bounds across cardinalities,
  * bloom's zero-false-negative invariant at adversarial load, chunk
  * reassembly. */
class SketchSpec extends SparkSpec {

  test("hllDistinct estimates within theoretical error across magnitudes") {
    // 1.04/sqrt(256) ≈ 6.5% standard error; assert 3σ ≈ 20%
    for (n <- Seq(50, 500, 5000)) {
      val df = spark.range(n.toLong).select(
        lit("g").as("g"), concat(lit("v"), col("id")).as("v"))
      val est = Sketches.hllDistinct(df, col("v"), Seq("g"))
        .select("hll_distinct").head().getDouble(0)
      assert(math.abs(est - n) / n < 0.20,
        s"n=$n est=$est err=${math.abs(est - n) / n}")
    }
  }

  test("hllDistinct is exactly insensitive to duplication and row order") {
    val base = spark.range(300).select(
      lit("g").as("g"), concat(lit("v"), col("id")).as("v"))
    val dup = base.union(base).union(base)
      .orderBy(md5(col("v"))) // shuffle the row order too
    val e1 = Sketches.hllDistinct(base, col("v"), Seq("g"))
      .select("hll_distinct").head().getDouble(0)
    val e2 = Sketches.hllDistinct(dup, col("v"), Seq("g"))
      .select("hll_distinct").head().getDouble(0)
    assert(e1 == e2) // bit-identical, not approximately equal
  }

  test("hllDistinctExact is bit-identical to hllDistinct joined with the exact count") {
    // the law that let q64 drop its checkpoint + exact branch + join
    // (r17): the fused register agg's count(*) over deduped pairs sums
    // to the exact distinct, and the registers themselves are the same
    // maxes. Duplicated, shuffled input exercises both the dedup and
    // the idempotence halves at once.
    val base = spark.range(500).select(
      (col("id") % 3).cast("string").as("g"),
      concat(lit("v"), (col("id") % 211)).as("v"))
    val messy = base.union(base).orderBy(md5(col("v")))
    val fused = Sketches.hllDistinctExact(messy, col("v"), Seq("g"))
      .orderBy("g").collect().toSeq
    val composed = Sketches.hllDistinct(messy, col("v"), Seq("g"))
      .join(messy.select(col("g"), col("v")).distinct()
        .groupBy("g").agg(count(lit(1)).as("exact_distinct")), Seq("g"))
      .select(col("g"), col("hll_distinct"), col("hll_buckets_used"),
        col("exact_distinct"))
      .orderBy("g").collect().toSeq
    assert(fused == composed)
    // null values: excluded from registers, counted once into exact —
    // the old count(*)-over-dedup contract, stated loudly
    val withNull = base.union(spark.range(1).select(
      lit("0").as("g"), lit(null).cast("string").as("v")))
    val r = Sketches.hllDistinctExact(withNull, col("v"), Seq("g"))
      .filter(col("g") === "0").head()
    val exactNonNull = base.filter(col("g") === "0")
      .select("v").distinct().count()
    assert(r.getAs[Long]("exact_distinct") == exactNonNull + 1)
  }

  test("bloom has zero false negatives and a sane false-positive rate") {
    val build = spark.range(500)
      .select((col("id") * 7).as("k")) // sparse keys: most probes miss
    val probe = spark.range(3500).select(col("id").as("k"))
    val f = Sketches.bloomBuild(build, col("k"))
    val marked = Sketches.bloomProbe(probe, col("k"), f)
      .withColumn("present", col("k") % 7 === 0)
    assert(marked.filter(col("present") && !col("bloom_pass")).count() == 0)
    val misses = marked.filter(!col("present"))
    val fp = marked.filter(!col("present") && col("bloom_pass")).count()
    // k=3, m=4096, n=500 → theoretical fp ≈ 0.1%; assert well under 5%
    assert(fp.toDouble / misses.count() < 0.05, s"fp=$fp")
  }

  test("bloom probe is a pure projection: no joins, no shuffle") {
    // Same contract as the count-min probe: the <= m-row position set
    // is collected once into a dense boolean literal, so the probe
    // plan must contain no join and no exchange at all.
    val build = spark.range(100).select(col("id").as("k"))
    val probe = spark.range(1000).select(col("id").as("k"))
    val plan = Sketches.bloomProbe(probe, col("k"),
      Sketches.bloomBuild(build, col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom probe plan joins:\n$plan")
    assert(!plan.contains("Exchange"), s"bloom probe plan shuffles:\n$plan")
  }

  test("q57 chunks reassemble to the original token stream") {
    val chunks = SketchQueries.q57DocChunk(spark, sf)
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    // stride-prefix of each chunk (all but the last, which keeps its
    // tail) concatenated in chunk order == the original token array
    val rebuilt = chunks
      .withColumn("toks", split(col("chunk_text"), " "))
      .withColumn("last",
        col("chunk_id") === max("chunk_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("keep", when(col("last"), col("toks"))
        .otherwise(slice(col("toks"), 1, SketchQueries.ChunkStride)))
      .groupBy("doc_id")
      .agg(flatten(sort_array(collect_list(
        struct(col("chunk_id"), col("keep"))))
        .getField("keep")).as("rebuilt"))
    val bad = rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("toks")).count()
    assert(bad == 0)
    // window law: every chunk but the last in its doc is exactly full
    val short = chunks
      .withColumn("last",
        col("chunk_id") === max("chunk_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(!col("last") && col("n_tokens") =!= SketchQueries.ChunkLen)
      .count()
    assert(short == 0)
  }

  test("q66 histogram quantiles land within two bins of the exact value") {
    val est = SketchQueries.q66QuantileSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = Tables(spark, sf).lineitem
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("p"))
      .collect()
      .flatMap { r =>
        val ps = r.getAs[scala.collection.Seq[Double]]("p")
        SketchQueries.HistQuantiles.zip(ps).map { case (q, v) =>
          (r.getString(0), q) -> v }
      }.toMap
    assert(est.keySet == exact.keySet)
    // ≤ 1 bin from the sketch itself, plus ≤ 1 more because the sketch
    // reads rank ⌊qn⌋+1 while `percentile` interpolates at (n−1)·q —
    // in a sparse tail those ranks can land in adjacent bins
    est.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) <= 2 * SketchQueries.HistWidth,
        s"$k: est $v vs exact ${exact(k)}")
    }
  }

  test("count-min never undercounts; overcount within the CMS bound") {
    // 2000 values, zipf-ish duplication via id/7; N = total updates
    val df = spark.range(6000).select((col("id") % 2000 / 7).cast("long")
      .cast("string").as("v"))
    val sketch = Sketches.countMinBuild(df, col("v"))
    val probes = df.distinct()
    val exact = df.groupBy("v").agg(count(lit(1)).as("n"))
    val out = Sketches.countMinProbe(probes, col("v"), sketch)
      .join(exact, "v").select(col("v"), col("cm_count"), col("n")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("cm_count") >= r.getAs[Long]("n"),
      s"undercount at ${r.getString(0)}"))
    // ε = e/w per update: mean overcount ≤ εN with room (3×)
    val eps = math.E / Sketches.CmWidth
    val meanOver = out.map(r => (r.getAs[Long]("cm_count") -
      r.getAs[Long]("n")).toDouble).sum / out.length
    assert(meanOver <= 3 * eps * 6000, s"meanOver=$meanOver")
  }

  test("count-min probe is a pure projection: no joins, build not re-run") {
    // Round-7 regression site: the probe used to issue d broadcast
    // joins against the UN-materialized build frame, re-running the
    // full build DAG once per hash row (4x at d=4 — q71's 32 s). Now
    // the <= d*w artifact is collected once and the probe plan must
    // contain no join and no exchange at all — the build input appears
    // nowhere in it.
    val df = spark.range(6000).select((col("id") % 97).cast("string").as("v"))
    val probed = Sketches.countMinProbe(df, col("v"),
      Sketches.countMinBuild(df, col("v")))
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe plan joins:\n$plan")
    assert(!plan.contains("Exchange"), s"probe plan shuffles:\n$plan")
  }

  test("empty build sides: cm_count 0 and bloom_pass false everywhere") {
    // the collected-literal probes must degrade cleanly when the build
    // frame is empty (all-zero counters / all-false bits), not crash
    // on the empty collect
    val empty = spark.range(0).select(col("id").cast("string").as("k"))
    val probes = spark.range(10).select(col("id").cast("string").as("k"))
    val cm = Sketches.countMinProbe(probes, col("k"),
      Sketches.countMinBuild(empty, col("k")))
    assert(cm.filter(col("cm_count") =!= 0L).isEmpty)
    val bl = Sketches.bloomProbe(probes, col("k"),
      Sketches.bloomBuild(empty, col("k")))
    assert(bl.filter(col("bloom_pass")).isEmpty)
  }

  test("caller columns named like old internals no longer collide") {
    // Before the __hll_ prefixing, grouping by a column named "bucket"
    // or "m" broke the sketch's internal groupBy/coalesce. Now the
    // reserved prefix is guarded and ordinary names pass through.
    val df = spark.range(200).select(
      (col("id") % 3).cast("string").as("bucket"), // old internal name
      (col("id") % 2).cast("string").as("m"),      // old internal name
      col("id").cast("string").as("v"))
    val out = Sketches.hllDistinct(df, col("v"), Seq("bucket", "m"))
    assert(out.count() == 6) // 3 x 2 groups survive intact
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(df.withColumnRenamed("bucket", "__hll_bucket"),
        col("v"), Seq("__hll_bucket"))
    }
  }

  test("NULL keys: cm_count = 0 and bloom_pass = false, never a crash") {
    val build = spark.range(50).select(col("id").cast("string").as("k"))
    val probes = spark.range(2).select(
      when(col("id") === 0, lit(null)).otherwise(lit("7"))
        .cast("string").as("k"))
    val cm = Sketches.countMinProbe(probes, col("k"),
      Sketches.countMinBuild(build, col("k")))
    assert(cm.filter(col("k").isNull).select("cm_count")
      .head().getLong(0) == 0L)
    val bl = Sketches.bloomProbe(probes, col("k"),
      Sketches.bloomBuild(build, col("k")))
    assert(!bl.filter(col("k").isNull).select("bloom_pass")
      .head().getBoolean(0))
    assert(bl.filter(col("k") === "7").select("bloom_pass")
      .head().getBoolean(0)) // non-null member still passes
  }

  test("q64/q65 run green on testdata with expected invariants") {
    val hll = SketchQueries.q64HllDistinct(spark, sf).collect()
    assert(hll.nonEmpty)
    hll.foreach { r =>
      val err = r.getAs[Double]("rel_err")
      assert(err < 0.20, s"rel_err=$err")
    }
    val bloom = SketchQueries.q65BloomSemijoin(spark, sf).head()
    assert(bloom.getAs[Long]("n_false_neg") == 0L)
    assert(bloom.getAs[Long]("n_pass") >= bloom.getAs[Long]("n_present"))
  }

  test("hll register max-merge of splits == direct sketch of the union, bit-identical") {
    // two overlapping splits (ids 0..399 and 200..599) sketched
    // separately, merged via register max — the estimate must equal a
    // direct hllDistinct over the union EXACTLY, not approximately
    val a = spark.range(0, 400).select(
      lit("s").as("scope"), concat(lit("v"), col("id")).as("v"))
    val b = spark.range(200, 600).select(
      lit("s").as("scope"), concat(lit("v"), col("id")).as("v"))
    val merged = Sketches.hllEstimateRegisters(
      Sketches.hllMergeRegisters(
        Sketches.hllRegisters(a, col("v"), Seq("scope"))
          .union(Sketches.hllRegisters(b, col("v"), Seq("scope"))),
        Seq("scope")),
      Seq("scope")).head()
    val direct = Sketches.hllDistinct(a.union(b), col("v"), Seq("scope")).head()
    assert(merged.getAs[Double]("hll_distinct") ==
      direct.getAs[Double]("hll_distinct"))
    assert(merged.getAs[Long]("hll_buckets_used") ==
      direct.getAs[Long]("hll_buckets_used"))
    // and the refactor seam: hllDistinct == estimate(registers)
    val viaSeam = Sketches.hllEstimateRegisters(
      Sketches.hllRegisters(a, col("v"), Seq("scope")), Seq("scope")).head()
    val directA = Sketches.hllDistinct(a, col("v"), Seq("scope")).head()
    assert(viaSeam.getAs[Double]("hll_distinct") ==
      directA.getAs[Double]("hll_distinct"))
  }

  test("q71: sketch gate passes a superset; output is the exact heavy-hitter set") {
    val t = graft.Tables(spark, sf).lineitem
    val got = SketchQueries.q71HeavyHitters(spark, sf).collect()
    val expected = t.groupBy("l_partkey")
      .agg(count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= SketchQueries.HhThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "testdata should contain heavy hitters at the threshold")
    assert(got.map(r => r.getAs[Long]("l_partkey") ->
      r.getAs[Long]("exact_count")).toMap == expected)
    // CMS never undercounts: the gate estimate dominates the exact count
    got.foreach(r => assert(
      r.getAs[Long]("cm_count") >= r.getAs[Long]("exact_count")))
  }

  test("count-min sum-merge of splits == direct build of the union, bit-identical") {
    import spark.implicits._
    val a = (1 to 200).map(i => s"k${i % 37}").toDF("k")
    val b = (1 to 300).map(i => s"k${i % 53}").toDF("k")
    val merged = Sketches.countMinMerge(
        Sketches.countMinBuild(a, col("k")),
        Sketches.countMinBuild(b, col("k")))
      .as[(Int, Long, Long)].collect().toSet
    val direct = Sketches.countMinBuild(a.union(b), col("k"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct && direct.nonEmpty)
  }

  test("persisted CMS artifact round-trips and probes identically") {
    import spark.implicits._
    val d = (1 to 500).map(i => s"tok${i % 61}").toDF("k")
    val path = java.nio.file.Files
      .createTempDirectory("graft-cms-spec").toString + "/sketch"
    Sketches.countMinWrite(Sketches.countMinBuild(d, col("k")), path)
    val probes = (0 until 61).map(i => s"tok$i").toDF("k")
    val viaArtifact = Sketches.countMinProbe(probes, col("k"),
        Sketches.countMinRead(spark, path))
      .as[(String, Long)].collect().toMap
    val direct = Sketches.countMinProbe(probes, col("k"),
        Sketches.countMinBuild(d, col("k")))
      .as[(String, Long)].collect().toMap
    assert(viaArtifact == direct && direct.nonEmpty)
  }

  test("q72 merged ALL estimate == direct global sketch on testdata") {
    val rows = SketchQueries.q72HllMerge(spark, sf).collect()
    assert(rows.map(_.getAs[String]("scope")).contains("ALL"))
    rows.foreach(r => assert(r.getAs[Double]("rel_err") < 0.20))
    val all = rows.find(_.getAs[String]("scope") == "ALL").get
    val direct = Sketches.hllDistinct(
      graft.Tables(spark, sf).lineitem.withColumn("scope", lit("ALL")),
      col("l_partkey"), Seq("scope")).head()
    assert(all.getAs[Double]("hll_distinct") ==
      direct.getAs[Double]("hll_distinct"))
  }
}
