package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, lit,
  monotonically_increasing_id, spark_partition_id}

/** Scale-safe replacements for the two global-total-order steps a
  * single-partition `Window.orderBy(...)` would otherwise pay — the one
  * plan shape in the catalog that cannot survive a 100× corpus (every
  * row funnels through ONE task's sort buffer).
  *
  * Two devices, both exact (not approximations):
  *
  *  1. [[withRowNumber]] — the classic distributed total-order rank:
  *     range-repartition on the sort key (each partition receives a
  *     contiguous key range), sort within partitions, then attach
  *     `partition offset + local record number` entirely inside
  *     Catalyst: `monotonically_increasing_id()`'s low 33 bits ARE the
  *     record number within each sorted partition, and the offsets come
  *     from one tiny `groupBy(spark_partition_id()).count()` job (≤ P
  *     rows to the driver, broadcast back as a P-row join). Every task
  *     sorts only its ~1/P slice; no task ever buffers the relation,
  *     and — unlike an RDD `zipWithIndex` — no row ever leaves Tungsten
  *     (the rank is a codegen'd projection over the sorted exchange).
  *     Equivalent to `row_number() OVER (ORDER BY ...)` whenever the
  *     sort key is a total order (callers append a unique tiebreak
  *     column).
  *
  *  2. [[topKBoundary]] — when only "is this row in the global top k?"
  *     is needed (selection, not ranking), a full sort is overkill:
  *     a `treeAggregate` of per-partition bounded heaps (≤ k entries
  *     each) reduces to the k-th order statistic on the driver, and
  *     membership becomes a broadcast-free comparison against that
  *     boundary literal. O(n) scan, O(k) state, zero shuffles of data
  *     rows.
  *
  * Both run on deterministic inputs only: ranks depend solely on the
  * key's total order, never on partition boundaries (RangePartitioner's
  * sampled split points move rows between partitions but cannot reorder
  * the concatenated key sequence).
  */
object GlobalRank {

  /** Exact `row_number() OVER (ORDER BY sortExprs)` (1-based) without a
    * single-partition window. `sortExprs` must form a total order (give
    * a unique tiebreak) or ranks among ties follow the range-partition
    * sort, like the window form's own tie behavior.
    *
    * The sorted+numbered relation is eagerly localCheckpoint'ed before
    * the count probe. This is correctness, not caching:
    * `RangePartitioner` samples split points with a seed derived from
    * the RDD id, so two separate jobs over the same range-exchange PLAN
    * can land rows in different partitions — offsets measured by the
    * probe job would then disagree with the pids the consumer sees
    * (measured: duplicate/gapped ranks at 15k rows × 4 partitions; the
    * old RDD `zipWithIndex` was immune only because its count and map
    * jobs shared one RDD instance, i.e. one shuffle dependency). The
    * checkpoint freezes partition contents the way zipWithIndex's
    * shared shuffle files did, at the same I/O order (one
    * materialization of the sorted run), without leaving Tungsten.
    */
  def withRowNumber(df: DataFrame, sortExprs: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // monotonically_increasing_id = (pid << 33) | record-number, where
    // the record number follows iterator order — here, the sorted order
    val sorted = df.repartitionByRange(p, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .withColumn("_gr_pid", spark_partition_id())
      .withColumn("_gr_mid", monotonically_increasing_id())
      .localCheckpoint() // freeze pids/mids — see scaladoc
    // ≤ P (pid, count) rows — the only data that touches the driver
    val counts = sorted.groupBy("_gr_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val o = acc; acc += c; (pid, o)
    }.toSeq
    val offDf = spark.createDataFrame(offsets).toDF("_gr_pid", "_gr_off")
    sorted.join(broadcast(offDf), "_gr_pid")
      .withColumn(out, col("_gr_off") +
        col("_gr_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("_gr_pid", "_gr_mid", "_gr_off")
  }

  /** The k-th largest (key, tie) pair under (key DESC, tie ASC) — the
    * exact boundary of the global top-k set. Returns None when the
    * relation has fewer than k rows (then everything is in the top k).
    *
    * `df` must have exactly two columns: a numeric key castable to
    * double and a long tiebreak, in that order. Each partition keeps a
    * bounded min-heap of k candidates; `treeAggregate` merges heaps
    * pairwise so the driver receives one ≤ k-entry heap, not one per
    * partition.
    */
  def topKBoundary(df: DataFrame, k: Int): Option[(Double, Long)] = {
    import org.apache.spark.sql.functions.col
    require(k > 0, s"topKBoundary: k must be positive, got $k")
    val pairs = df.select(
      col(df.columns(0)).cast("double"), col(df.columns(1)).cast("long"))
      .rdd.map(r => (r.getDouble(0), r.getLong(1)))
    // ordering: "better" = higher key, then lower tie; the heap evicts
    // the WORST of the kept k, so it is a min-heap under this ordering
    val better: ((Double, Long), (Double, Long)) => Boolean = {
      case ((k1, t1), (k2, t2)) => k1 > k2 || (k1 == k2 && t1 < t2)
    }
    val ord = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int =
        if (better(a, b)) 1 else if (better(b, a)) -1 else 0
    }
    def push(h: scala.collection.mutable.PriorityQueue[(Double, Long)],
        e: (Double, Long)) = {
      if (h.size < k) h.enqueue(e)
      else if (better(e, h.head)) { h.dequeue(); h.enqueue(e) }
      h
    }
    val empty = scala.collection.mutable.PriorityQueue
      .empty[(Double, Long)](ord.reverse) // head = worst kept
    val top = pairs.treeAggregate(empty)(push, { (a, b) =>
      b.foreach(push(a, _)); a
    })
    if (top.size < k) None else Some(top.head)
  }
}
