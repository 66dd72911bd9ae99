package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 moved these conversions behind
  * `private[sql]` (`classic.ExpressionUtils`), so libraries providing
  * native Catalyst expressions expose them through a small shim inside
  * the `org.apache.spark.sql` package hierarchy — the standard pattern
  * of Spark extension libraries (the alternative, registering through
  * SparkSessionExtensions, couples the library to session construction
  * which this library deliberately leaves to its host).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
