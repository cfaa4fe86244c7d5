package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters, needed to expose custom Catalyst expressions as user-facing
  * Columns (the supported extension seam in classic Spark 4). */
object ColumnBridge {
  def column(e: Expression): Column      = ExpressionUtils.column(e)
  def expression(c: Column): Expression  = ExpressionUtils.expression(c)
}
