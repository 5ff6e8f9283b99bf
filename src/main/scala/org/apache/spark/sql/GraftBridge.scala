package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge: Column <-> catalyst Expression (the constructors
  * are private[sql] in Spark 4; this is the standard extension-point pattern,
  * cf. the public examples collected in SNIPPETS.md).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
