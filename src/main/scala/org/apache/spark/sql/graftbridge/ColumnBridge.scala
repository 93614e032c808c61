package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made `ExpressionUtils` (and the Column(expr) constructor)
  * `private[sql]` in the Spark-Connect refactor; libraries shipping custom
  * expressions access it from an `org.apache.spark.sql` subpackage — the
  * same approach Spark-native connector libraries use. Only these two
  * one-line forwarders live here; all real code stays in `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
