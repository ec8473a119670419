package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4's classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`,
  * so a library registering custom Catalyst expressions needs one
  * object compiled into the `org.apache.spark.sql` package to reach
  * them — the conventional extension-point shim, kept to these two
  * one-line forwarders. */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Partition-local pass over a DataFrame's InternalRows, schema
    * preserved — the zero-copy form of `mapPartitions` for operators
    * whose per-partition logic only reads a few fixed columns and
    * passes rows through (e.g. Similarity's map-side bucket cap). The
    * Dataset.mapPartitions route would deserialize every row to
    * external objects and back (for LSH rows that is a 64-double array
    * per row); this one touches primitives in place.
    *
    * Contract for `f`: iterator rows may be REUSED by the engine —
    * read fields of the current row only, never buffer row references
    * (remember primitives instead). The result must be row-for-row a
    * subset/transform with the SAME schema. */
  def mapPartitionsInternal(df: DataFrame,
      f: Iterator[org.apache.spark.sql.catalyst.InternalRow] =>
        Iterator[org.apache.spark.sql.catalyst.InternalRow]): DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd.mapPartitions(f, preservesPartitioning = true),
      df.schema)
  }

  /** Split a sort Column (`c.desc` / `c.asc` / bare) into its value
    * column and direction. Spark 4 Columns carry a ColumnNode, not a
    * catalyst Expression — `expression(c)` would wrap the SortOrder in
    * a lazy ColumnNodeExpression, so the direction must be read off
    * the node itself. Bare columns sort ascending, as in a window. */
  def sortKey(c: Column): (Column, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      (new Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Ascending)
    case _ => (c, true)
  }
}
