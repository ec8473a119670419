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
}
