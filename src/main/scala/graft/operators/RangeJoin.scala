package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: match points `p` to intervals `[start, end)`
  * without an equality key.
  *
  * Spark plans a bare inequality join (`start <= p AND p < end`) as
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons, the
  * canonical 100 TB scale-killer. This operator restores an equi-join:
  * quantize the axis into fixed bins, explode each interval into the
  * bins it covers, hash-join points on their single containing bin, then
  * apply the exact range predicate. Each (interval, point) match pair
  * arises in EXACTLY one bin — the point's — so the join needs no
  * post-dedup shuffle (same argument as the LSH band join in Dedup).
  *
  * Cost model: interval side inflates by `ceil(len/bin)+1` rows; the
  * join is one shuffle on `_bin` (or a broadcast if the interval side is
  * small). Pick `binWidth` ≈ the typical interval length so the
  * inflation factor stays ~2 and each bin's population stays bounded —
  * at 100 TB the bin key partitions uniformly when the axis is time and
  * events arrive continuously. A pathological bin (flash-crowd second)
  * is an AQE skew-join case, same remedy as any hot key.
  */
object RangeJoin {

  /** @param points    frame carrying `ptCol` (long axis, e.g. epoch-ns)
    * @param intervals frame carrying `startCol`/`endCol` (end EXCLUSIVE)
    * @param binWidth  axis quantum, same unit as the columns
    * @param maxBinsPerInterval hard guard: an interval longer than
    *   `binWidth × maxBinsPerInterval` means the caller mis-sized the
    *   bins (the explode would amplify storage); fail loudly, at plan
    *   time on literals and at run time on data. */
  /** Internal bin key; prefixed so it cannot shadow a caller column. */
  private val BinCol = "__rangejoin_bin"

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: Column, startCol: Column, endCol: Column,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 64): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains(BinCol) && !intervals.columns.contains(BinCol),
      s"rangeJoin: '$BinCol' is reserved for the operator's bin key")
    val firstBin = floorDiv(startCol, binWidth)
    // end is exclusive: an interval ending exactly on a bin edge does
    // not reach into that bin
    val lastBin = floorDiv(endCol - 1, binWidth)
    // Both bad-data shapes fail loudly here rather than downstream:
    // an oversize interval would silently amplify storage, and an
    // empty/inverted interval (end <= start, so lastBin < firstBin)
    // would make sequence() emit a DESCENDING bin list — spurious rows
    // at best, a confusing "too long sequence" error at worst.
    val guarded = when(lastBin - firstBin >= maxBinsPerInterval,
      raise_error(concat(lit(s"rangeJoin: interval spans > $maxBinsPerInterval bins; "),
        lit("raise binWidth or split the interval"))))
      .when(lastBin < firstBin,
        raise_error(lit("rangeJoin: empty or inverted interval (end <= start); " +
          "end is exclusive — filter such rows before joining")))
      .otherwise(lastBin)
    val exploded = intervals.withColumn(BinCol,
      explode(sequence(firstBin, guarded)))
    val binned = points.withColumn(BinCol, floorDiv(ptCol, binWidth))
    binned.join(exploded,
      binned(BinCol) === exploded(BinCol) &&
        startCol <= ptCol && ptCol < endCol)
      .drop(BinCol)
  }

  /** Interval × interval overlap join: match `[lStart, lEnd)` to
    * `[rStart, rEnd)` when they overlap (`lStart < rEnd && rStart < lEnd`).
    *
    * Same bin-equi-join rescue as `pointInInterval` — a bare overlap
    * predicate plans as BroadcastNestedLoopJoin. Both sides explode into
    * their covered bins and hash-join on the bin key. An overlapping pair
    * shares every bin of the overlap region, so a naive bin join emits
    * duplicates; instead each pair is CLAIMED by exactly one bin — the one
    * containing `max(lStart, rStart)`. That point lies inside both
    * intervals whenever they overlap, so both sides' bin lists contain its
    * bin, and no other bin passes the claim predicate. One shuffle, no
    * post-dedup — the argument mirrors the LSH band join in Dedup.
    *
    * Cost model: each side inflates by `ceil(len/bin)+1`; bounded by the
    * same `maxBinsPerInterval` guard as pointInInterval. Pick binWidth ≈
    * the typical interval length. Skewed bins (flash-crowd windows) are an
    * AQE skew-join case like any hot key.
    *
    * Column-name contract: the two inputs must have DISJOINT column
    * names (enforced below). The caller's `lStart`/`rEnd`/… Column
    * objects are embedded unqualified in the join condition, so a name
    * present on both sides (e.g. both carrying `start`) would make the
    * predicate ambiguous at analysis time — rename one side first. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: Column, lEnd: Column,
                      rStart: Column, rEnd: Column,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 64): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!left.columns.contains(BinCol) && !right.columns.contains(BinCol),
      s"intervalOverlap: '$BinCol' is reserved for the operator's bin key")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlap: inputs share column names ${shared.mkString(", ")} — " +
        "the start/end predicates would be ambiguous; rename one side")
    def explodeBins(df: DataFrame, start: Column, end: Column): DataFrame = {
      val firstBin = floorDiv(start, binWidth)
      val lastBin = floorDiv(end - 1, binWidth)
      val guarded = when(lastBin - firstBin >= maxBinsPerInterval,
        raise_error(lit(s"intervalOverlap: interval spans > $maxBinsPerInterval bins; " +
          "raise binWidth or split the interval")))
        .when(lastBin < firstBin,
          raise_error(lit("intervalOverlap: empty or inverted interval (end <= start); " +
            "end is exclusive — filter such rows before joining")))
        .otherwise(lastBin)
      df.withColumn(BinCol, explode(sequence(firstBin, guarded)))
    }
    val l = explodeBins(left, lStart, lEnd)
    val r = explodeBins(right, rStart, rEnd)
    l.join(r,
      l(BinCol) === r(BinCol) &&
        lStart < rEnd && rStart < lEnd &&
        l(BinCol) === floorDiv(greatest(lStart, rStart), binWidth))
      .drop(BinCol)
  }

  /** Long floor-division as a Column. Must stay in INTEGRAL division:
    * epoch-ns values (~1.7e18) exceed 2^53, where a double `/` loses
    * ulps. `div` truncates toward zero; axis values here are epoch
    * offsets ≥ 0 so truncation == floor. */
  private def floorDiv(c: Column, d: Long): Column =
    call_function("div", c, lit(d))
}
