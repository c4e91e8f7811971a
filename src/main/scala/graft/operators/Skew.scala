package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (hot topics, stop-shingle LSH buckets). AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting is for the shapes AQE
  * can't split (e.g. aggregation-after-join fan-outs, bucket joins).
  */
object Skew {

  /** Salted equi-join: the (large, skewed) left side gets a random salt in
    * [0, saltFactor); the (smaller) right side is exploded `saltFactor`
    * ways so every (key, salt) pair matches. Key cardinality of the
    * shuffle rises by `saltFactor`, splitting each hot key across that
    * many reducers. Right side grows `saltFactor`× — use for dimension-ish
    * right sides, not fact-fact joins. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val l = left.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
