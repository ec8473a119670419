package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (pareto front) over (minimize x, maximize y) — the
  * prefix-scan decomposition of the classic NOT EXISTS dominance query
  * (Börzsönyi et al. 2001, "The Skyline Operator", public).
  *
  * A point is on the front iff its y strictly beats the best y of every
  * strictly-smaller x, and it attains the best y at its own x. The
  * global prefix max over x decomposes two-level: per-x best (key-
  * partitioned agg) → per-bin best (tiny agg) → prefix max over bins
  * (a window over the ≤#bins-row frame — the only single-partition
  * step, O(bins)) → within-bin running max re-partitioned by bin. Every
  * stage after the first aggregation runs on already-aggregated frames,
  * so the shape survives any input row count.
  */
object Skyline {

  /** Front of `df` minimizing long column `x`, maximizing `y`.
    * Returns the distinct front coordinates as (x, y) — join back on
    * both columns to recover tied input rows. `binWidth` buckets x for
    * the two-level prefix scan; any positive value is correct, it only
    * shifts work between the bin merge (≤ range/binWidth rows) and the
    * within-bin windows. */
  def paretoFront2D(df: DataFrame, x: String, y: String,
                    binWidth: Long = 10000L): DataFrame = {
    // binWidth = 0 would NULL every __bin (the inner join then silently
    // returns an empty front); negative widths reverse bin order and
    // return wrong fronts — fail loudly instead
    require(binWidth > 0, s"paretoFront2D: binWidth must be > 0 (got $binWidth)")
    val perX = df.groupBy(col(x))
      .agg(max(col(y)).as("__best_y"))
      .withColumn("__bin", expr(s"$x DIV $binWidth"))
    val perBin = perX.groupBy("__bin").agg(max("__best_y").as("__bin_best"))
    // global window is SAFE here: perBin is the ≤(x-range/binWidth)-row
    // bin census, a bounded artifact, never the input relation
    val prefix = perBin.withColumn("__cheaper_bins_best",
      max("__bin_best").over(Window.orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select("__bin", "__cheaper_bins_best")
    val withinBin = Window.partitionBy("__bin").orderBy(x)
      .rowsBetween(Window.unboundedPreceding, -1)
    perX
      .join(broadcast(prefix), "__bin")
      .withColumn("__cheaper_in_bin_best", max("__best_y").over(withinBin))
      .withColumn("__cheaper_best",
        greatest(coalesce(col("__cheaper_bins_best"), lit(Long.MinValue)),
          coalesce(col("__cheaper_in_bin_best"), lit(Long.MinValue))))
      .filter(col("__best_y") > col("__cheaper_best"))
      .select(col(x), col("__best_y").as(y))
  }
}
