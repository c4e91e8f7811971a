package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Spark internals (Column <-> Expression).
  * Lives under `org.apache.spark.sql` solely to satisfy package-private
  * access — the same pattern used by open-source Spark connector libraries.
  */
object GraftSqlInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
