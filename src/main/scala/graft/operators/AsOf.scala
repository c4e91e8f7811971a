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
      left.select(lCols.toSeq.map(col) :+ lit(1).as("_side"): _*)
        .unionByName(
          right.select(
            (keys.map(col) ++ Seq(col(timeCol)) ++ rightPayload.map(col)
              :+ lit(0).as("_side")): _*),
          allowMissingColumns = true)
    // Right rows sort before left rows at equal time (side 0 < 1), so a
    // right row at exactly t is visible to a left row at t (<= semantics).
    // The payload tiebreaker makes the pick among right rows with an
    // identical (keys, time) deterministic across partitionings.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(timeCol).asc, col("_side").asc) ++
        rightPayload.headOption.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = rightPayload.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    withAsof.where(col("_side") === 1)
      .select(lCols.toSeq.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }

  /** Forward as-of: for each left row, attach the EARLIEST right row with
    * the same `keys` and `right.timeCol > left.timeCol` (strictly after —
    * the "next attribution" direction; a right row at exactly t is NOT
    * visible to a left row at t). Right payload columns come back as
    * `next_<name>` (null when no later right row exists).
    *
    * Mirror of [[joinLastPrior]]: one union, one shuffle on the keys, one
    * `first(..., ignoreNulls)` over a FOLLOWING frame. Right rows sort
    * before left rows at equal time (side 0 < 1), so an equal-time right
    * row falls outside the left row's following frame — that ordering IS
    * the strict-> semantics. The payload tiebreaker pins the pick among
    * right rows sharing an identical (keys, time) to the smallest payload
    * value, deterministic across partitionings. */
  def joinFirstAfter(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val tagged =
      left.select(lCols.toSeq.map(col) :+ lit(1).as("_side"): _*)
        .unionByName(
          right.select(
            (keys.map(col) ++ Seq(col(timeCol)) ++ rightPayload.map(col)
              :+ lit(0).as("_side")): _*),
          allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(timeCol).asc, col("_side").asc) ++
        rightPayload.headOption.map(c => col(c).asc_nulls_last): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withNext = rightPayload.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"next_$c",
        first(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    withNext.where(col("_side") === 1)
      .select(lCols.toSeq.map(col) ++ rightPayload.map(c => col(s"next_$c")): _*)
  }

  /** For each left row, attach the right row with the same `keys` NEAREST
    * in time (either direction); ties go to the prior row. `timeCol` must
    * be numeric (e.g. epoch nanos) so deltas are exact integers. With
    * `tolerance`, matches farther than it are nulled out.
    *
    * Same composition shape as [[joinLastPrior]]: one union, one shuffle
    * on the keys, two window passes (preceding `last` for the prior
    * candidate, following `first` for the next candidate) sharing the
    * exchange — no range-join explosion at any key cardinality. */
  def joinNearest(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String,
      rightPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns
    val rCols = keys.map(col) ++ Seq(col(timeCol)) ++ rightPayload.map(col)
    val tagged = left.select(lCols.toSeq.map(col) :+ lit(1).as("_side"): _*)
      .unionByName(right.select(rCols :+ lit(0).as("_side"): _*),
        allowMissingColumns = true)
    // Prior pass: right rows sort before left at equal time (<= visible).
    // Next pass: right rows sort after left at equal time (>= visible).
    // Payload tiebreakers pin the pick among right rows sharing an exact
    // (keys, time): prior takes the max tiebreak, next the min.
    val wPrior = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(timeCol).asc, col("_side").asc) ++
        rightPayload.headOption.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(timeCol).asc, col("_side").desc) ++
        rightPayload.headOption.map(c => col(c).asc_nulls_last): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def priorOf(c: String): Column =
      last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(wPrior)
    def nextOf(c: String): Column =
      first(when(col("_side") === 0, col(c)), ignoreNulls = true).over(wNext)
    val withCands = rightPayload.foldLeft(
      tagged.withColumn("_p_ts", priorOf(timeCol)).withColumn("_n_ts", nextOf(timeCol))
    ) { (df, c) =>
      df.withColumn(s"_p_$c", priorOf(c)).withColumn(s"_n_$c", nextOf(c))
    }
    val dP = col(timeCol) - col("_p_ts")
    val dN = col("_n_ts") - col(timeCol)
    val useNext = col("_p_ts").isNull || (col("_n_ts").isNotNull && dN < dP)
    val delta = when(useNext, dN).otherwise(dP)
    val within = tolerance.map(t => delta <= t).getOrElse(lit(true))
    withCands.where(col("_side") === 1)
      .select(lCols.toSeq.map(col) ++
        rightPayload.map(c =>
          when(within, when(useNext, col(s"_n_$c")).otherwise(col(s"_p_$c")))
            .as(s"nearest_$c")) :+
        when(within, delta).as("nearest_delta"): _*)
  }
}
