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
  *
  * VERSION PIN: `classic.ExpressionUtils` is Spark 4.1.x-internal (matching
  * build.sbt's provided 4.1.2 jars). On a Spark upgrade, re-check
  * `org.apache.spark.sql.classic.ExpressionUtils.{column, expression}`
  * first; if moved/removed, fall back to registering each expression via
  * `SparkSessionExtensions.injectFunction` (public, stable) and routing
  * these two calls through `Column(functionName, args)` — the shim is the
  * only file in the repo that touches a non-public Spark API.
  */
object GraftFunctions {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
