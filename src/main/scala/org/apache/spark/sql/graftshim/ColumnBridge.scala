package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column <-> Expression converters so
  * graft's custom Catalyst expressions (graft.functions) can surface
  * as ordinary [[Column]]s. Lives under org.apache.spark.sql.* solely
  * for access; the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
