package graft.typed

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.Tables

/** Typed Dataset[T] surface — for the places compile-time row types pay
  * for themselves (business logic over a stable schema). The encoders
  * are product encoders: fields deserialize straight out of Tungsten
  * rows, and typed `filter`/`map` lambdas run on JVM objects only where
  * used; relational stages stay in the untyped planner.
  *
  * (The engine default remains DataFrame: typed lambdas are opaque to
  * Catalyst — no pushdown through a `filter(f: T => Boolean)` — so
  * typed ops belong AFTER the pruned scan, not before.)
  */
object TypedOps {

  final case class Order(o_orderkey: Long, o_custkey: Long,
                         o_orderstatus: String, o_totalprice: Double)
  final case class CustomerSpend(custkey: Long, orders: Long, total: Double)

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    // column-pruned scan FIRST, then the typed view
    Tables(spark, dir).orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
  }

  /** Accumulator for [[SpendAgg]]: order count + cent-exact total.
    * Money sums in scaled longs (cents), not doubles — long addition is
    * associative and commutative, so the merge order Spark picks (which
    * varies with partitioning) can never change the result. */
  final case class SpendBuf(n: Long, cents: Long)

  /** Typed `Aggregator` for per-customer spend — the groupByKey+
    * mapGroups formulation this replaces shuffled FULL ROWS with no
    * partial aggregation and summed doubles in iteration order (an
    * order-dependent result). An Aggregator gets planned as a hash
    * aggregate with a map-side partial_spendagg(...) phase (asserted in
    * CoverageSpec), so only (key, count, cents) crosses the shuffle. */
  object SpendAgg extends Aggregator[Order, SpendBuf, CustomerSpend] {
    def zero: SpendBuf = SpendBuf(0L, 0L)
    def reduce(b: SpendBuf, o: Order): SpendBuf =
      SpendBuf(b.n + 1, b.cents + math.round(o.o_totalprice * 100))
    def merge(a: SpendBuf, b: SpendBuf): SpendBuf =
      SpendBuf(a.n + b.n, a.cents + b.cents)
    def finish(b: SpendBuf): CustomerSpend =
      CustomerSpend(0L, b.n, b.cents / 100.0) // custkey filled by caller
    def bufferEncoder: Encoder[SpendBuf] = Encoders.product[SpendBuf]
    def outputEncoder: Encoder[CustomerSpend] = Encoders.product[CustomerSpend]
  }

  /** Per-customer order count + total spend, as a typed aggregation
    * with map-side partial aggregation and a deterministic cent-exact
    * sum. */
  def spendPerCustomer(os: Dataset[Order]): Dataset[CustomerSpend] = {
    import os.sparkSession.implicits._
    os.groupByKey(_.o_custkey)
      .agg(SpendAgg.toColumn.name("spend"))
      .map { case (key, s) => CustomerSpend(key, s.orders, s.total) }
  }
}
