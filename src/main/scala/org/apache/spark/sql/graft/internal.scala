package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Minimal bridge to `private[sql]` Spark internals (Column <-> Expression,
  * InternalRow-based DataFrame creation). Lives under
  * `org.apache.spark.sql` solely to satisfy package-private access — the
  * same pattern used by open-source Spark connector libraries.
  */
object GraftSqlInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from InternalRow RDD without the external-Row conversion. */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** InternalRow RDD of a DataFrame (Tungsten rows, no conversion). */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Clone with copied session state (conf, UDFs, temp views) — the
    * concrete method is on classic.SparkSession in Spark 4. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** True when recomputing the plan reproduces the same rows in the same
    * partition-internal order: narrow Project/Filter chains over leaves
    * (file scans, local/cached relations). Shuffles, joins, aggregates,
    * generators etc. have fetch-order-dependent output and return false. */
  def isOrderStable(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
    def stable(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: SubqueryAlias => p.children.forall(stable)
      case _ => false
    }
    stable(df.queryExecution.optimizedPlan)
  }
}
