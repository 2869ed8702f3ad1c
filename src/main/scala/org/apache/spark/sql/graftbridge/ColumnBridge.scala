package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridges the `private[sql]` Column ↔ Expression converters (Spark 4's
  * Column is a ColumnNode wrapper) for graft's custom Catalyst expressions.
  * Lives in the org.apache.spark.sql namespace solely to cross the
  * `private[sql]` boundary — the standard pattern for Spark extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
