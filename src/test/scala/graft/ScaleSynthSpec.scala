package graft

import org.apache.spark.sql.functions._

/** Pins the round-14 scale-tooling contracts: the replicated-lineitem
  * synthesis the crossover duel feeds to the q64/q72 cardinality
  * sketches (ScaleBench.synthesizeLineitem), and the per-query session
  * clone the streaming parity entries run on
  * (StreamStage.streamSession). */
class ScaleSynthSpec extends SparkSpec {

  test("synthesizeLineitem scales rows AND the distinct-key population") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-synth-li").toString
    ScaleBench.synthesizeLineitem(spark, sf, 3, s"$out/lineitem.parquet")
    val base = Tables(spark, sf).lineitem
    val syn = spark.read.parquet(s"$out/lineitem.parquet")
    val (bn, bo, bp) = (base.count(),
      base.select("l_orderkey").distinct().count(),
      base.select("l_partkey").distinct().count())
    // row count, distinct orderkeys AND distinct partkeys all scale by
    // the factor — replication without the key offsets would grow rows
    // while freezing every distinct-count answer at the base corpus's,
    // so the q64/q72 crossover rows would measure only scan cost
    assert(syn.count() == 3 * bn)
    assert(syn.select("l_orderkey").distinct().count() == 3 * bo)
    assert(syn.select("l_partkey").distinct().count() == 3 * bp)
    // copy 0 is the base verbatim (offsets are multiples of i)
    assert(syn.filter(col("l_orderkey") < 100000000L).count() == bn)
    // measures ride along untouched: total quantity scales exactly
    val bq = base.agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    val sq = syn.agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(sq - 3 * bq) < 1e-6)
  }

  test("synthesizeLineitem refuses base keys that exceed the per-copy offsets") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-synth-li-bad").toString
    import spark.implicits._
    Seq((100000000L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
        new java.sql.Timestamp(0L)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val e = intercept[IllegalArgumentException] {
      ScaleBench.synthesizeLineitem(spark, dir, 2, s"$dir/out.parquet")
    }
    assert(e.getMessage.contains("per-copy offsets"))
  }

  test("streamSession: isolated shuffle-partition override, shared context, caller untouched") {
    val ss = graft.streaming.StreamStage.streamSession(spark)
    assert(ss ne spark)
    assert(ss.sparkContext eq spark.sparkContext)
    assert(ss.conf.get("spark.sql.shuffle.partitions") ==
      graft.streaming.StreamStage.StreamShufflePartitions.toString)
    // the caller's session keeps its own setting (SparkSpec pins 4)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }
}
