package graft.typed

import org.apache.spark.sql.{Dataset, SparkSession}
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

  /** Typed groupByKey + mapGroups aggregation — the Dataset analogue of
    * the reference's per-key reduce loops; business logic in plain
    * Scala, distribution by the engine. */
  def spendPerCustomer(os: Dataset[Order]): Dataset[CustomerSpend] = {
    import os.sparkSession.implicits._
    os.groupByKey(_.o_custkey)
      .mapGroups { (key, rows) =>
        var n = 0L; var sum = 0.0
        rows.foreach { o => n += 1; sum += o.o_totalprice }
        CustomerSpend(key, n, sum)
      }
  }
}
