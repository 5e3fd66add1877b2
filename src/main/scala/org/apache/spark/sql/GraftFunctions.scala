package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ⇄ Column bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the supported
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]` — so this one-file shim sits in the `sql` package, the
  * standard pattern for Spark-native libraries that ship their own
  * expressions (the alternative, SparkSessionExtensions.injectFunction,
  * requires controlling session construction, which a library cannot assume).
  */
object GraftFunctions {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
