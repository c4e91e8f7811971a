package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference order (a) of the build rules):
  * tag both sides, union, and take a running `last(..., ignoreNulls)` over
  * a single `(keys, time)` window. One shuffle on the key columns, no
  * range-join explosion, works at any key cardinality — the idiomatic
  * distributed as-of shape (vs. a per-key sort-merge in a custom physical
  * operator, which is only worth it when both sides are huge AND
  * pre-bucketed).
  */
object AsOf {

  /** For each left row, attach the latest right row with the same `keys`
    * and `right.timeCol <= left.timeCol`. Right payload columns come back
    * as `asof_<name>` (null when no prior right row exists). */
  def joinLastPrior(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val tagged =
      left.select(lCols.map(col) :+ lit(1).as("_side"): _*)
        .unionByName(
          right.select(
            (keys.map(col) ++ Seq(col(timeCol)) ++ rightPayload.map(col)
              :+ lit(0).as("_side")): _*),
          allowMissingColumns = true)
    // Right rows sort before left rows at equal time (side 0 < 1), so a
    // right row at exactly t is visible to a left row at t (<= semantics).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = rightPayload.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    withAsof.where(col("_side") === 1)
      .select(lCols.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }
}
