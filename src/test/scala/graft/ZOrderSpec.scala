package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Morton interleave: must match the bit-twiddling reference exactly,
  * be a bijection on the quantized grid, produce the same values
  * through the generated SQL form, and deliver the locality property
  * (coarse Z-cells are tight rectangles) that justifies clustering. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def refMorton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  private lazy val grid16 =
    (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toDF("x", "y")

  test("mortonColumn == bit-twiddling reference; bijective on the grid") {
    val got = grid16
      .withColumn("z", ZOrder.mortonColumn(Seq(col("x"), col("y")), 4))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refMorton(x, y, 4), s"($x,$y)")
    }
    assert(got.map(_._3).distinct.length == 256) // bijection on 16x16
    assert(got.map(_._3).min == 0L && got.map(_._3).max == 255L)
  }

  test("generated SQL form computes the same key (engine portability)") {
    grid16.createOrReplaceTempView("zgrid")
    val viaSql = spark.sql(
      s"SELECT x, y, ${ZOrder.mortonSql(Seq("x", "y"), 4)} AS z FROM zgrid")
      .as[(Long, Long, Long)].collect().toSet
    val viaColumn = grid16
      .withColumn("z", ZOrder.mortonColumn(Seq(col("x"), col("y")), 4))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSql == viaColumn)
  }

  test("coarse Z-cells are tight rectangles in every dimension") {
    // 6-bit dims, cell = zkey DIV 16 (drops 2 low bits per dim): each
    // cell must span <= 4 consecutive values in BOTH x and y — the
    // row-group min/max tightness that makes Z-order layouts prunable
    val cells = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", ZOrder.mortonColumn(Seq(col("x"), col("y")), 6))
      .groupBy(expr("z DIV 16").as("cell"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(cells.length == 256) // 4096 points / 16 per cell
    cells.foreach { case (cell, dx, dy, n) =>
      assert(dx <= 3 && dy <= 3 && n == 16, s"cell=$cell")
    }
  }

  test("clusterBy range-partitions into disjoint sorted Z-ranges") {
    val df = Tables(spark, sf).lineitem.select(
      least(floor(col("l_quantity")), lit(63.0)).cast("long").as("qx"),
      least(floor(col("l_extendedprice") / 2048), lit(63.0)).cast("long").as("qy"))
      .withColumn("z", ZOrder.mortonColumn(Seq(col("qx"), col("qy")), 6))
    val parts = ZOrder.clusterBy(df, col("z"), 4)
      .select(spark_partition_id().as("pid"), col("z"))
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("pid")
      .as[(Int, Long, Long)].collect()
    assert(parts.length > 1)
    parts.sliding(2).foreach {
      case Array((_, _, hiA), (_, loB, _)) => assert(hiA <= loB)
      case _                               => ()
    }
  }
}
