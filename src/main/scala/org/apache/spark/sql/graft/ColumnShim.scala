package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst Expressions and the public Column
  * API. Spark 4 made Column construction session-internal
  * (`private[sql] ExpressionUtils`); extensions conventionally shim it
  * from inside the `org.apache.spark.sql` namespace, which is what
  * this object does — nothing else from the internals is touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
