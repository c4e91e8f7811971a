package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (band) join: pair left rows with right rows whose time falls in
  * a half-open window relative to the left row's time.
  *
  * The reference engine has no joins at all (SURVEY.md §2.5); this is one of
  * the relational operators the Spark rebuild adds over topic/event data.
  *
  * A naive `l JOIN r ON rt BETWEEN lt+lower AND lt+upper` plans as a
  * broadcast-nested-loop (O(|L|·|R|)) because there is no equality key. The
  * scalable shape buckets both sides by the window LENGTH: a half-open
  * window of length `w = upper - lower` intersects at most two width-`w`
  * buckets, so the left side explodes to ≤ 2 (keys, bucket) rows, the join
  * is a plain equi-join on (keys, bucket) — hash-partitioned, AQE-skew
  * eligible, no quadratic blow-up — and the exact predicate filters the
  * boundary spill. Cost scales with matches, not |L|·|R|.
  */
object RangeJoin {

  /** Rows `(l, r)` with `r[rightTime] ∈ [ l[leftTime]+lower, l[leftTime]+upper )`.
    * Times must be non-negative longs in a common unit (integer bucketing
    * floor-divides; `lower` may be negative for look-back windows as long
    * as `leftTime + lower >= 0`). Columns of both inputs are kept; name
    * collisions beyond `keys` must be resolved by the caller. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String,
      lower: Long, upper: Long): DataFrame = {
    require(upper > lower, s"empty window [$lower, $upper)")
    val w = upper - lower
    // prefixed internal names so caller columns can't collide (withColumn
    // silently REPLACES an existing column of the same name)
    val bkt = "__graft_ij_bkt"
    val st = "__graft_ij_start"
    require(!left.columns.contains(bkt) && !left.columns.contains(st) &&
      !right.columns.contains(bkt), s"reserved column name $bkt/$st in input")
    // integer `div`, not double division: μs/ns epoch values exceed the
    // 2^53 range where doubles stay exact
    // [start, start + w) touches bucket(start) and, unless start is
    // bucket-aligned, bucket(start)+1 — emit both, dedup, filter exact.
    val l = left.withColumn(st, col(leftTime) + lit(lower))
      .withColumn(bkt, explode(array_distinct(array(
        expr(s"$st div $w"), expr(s"($st + ${w - 1}) div $w")))))
      .drop(st)
    val r = right.withColumn(bkt, expr(s"$rightTime div $w"))
    l.join(r, keys :+ bkt)
      .where(col(rightTime) >= col(leftTime) + lower &&
        col(rightTime) < col(leftTime) + upper)
      .drop(bkt)
  }
}
