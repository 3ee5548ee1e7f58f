package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column ↔ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft can register
  * custom Catalyst expressions/aggregates as Columns. Lives in the
  * org.apache.spark.sql package purely for access; contains no logic.
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
