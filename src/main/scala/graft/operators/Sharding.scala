package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data sharding operators: deterministic splits and token-budget
  * packing — the steps between "clean corpus" and "training shards" in a
  * 100 TB pipeline. All arithmetic is integer/modular so shard assignment
  * is reproducible across engines and runs (never `rand()`: a re-run or a
  * retried task must land every document in the same shard).
  */
object Sharding {

  /** Knuth's multiplicative-hash constant (2^32 / φ). */
  val HashMul = 2654435761L

  /** Deterministic train/val/test assignment by modular hash of the id:
    * `(id · HashMul) mod 100` bucketed by the cumulative percentages.
    * Content-stable (same id → same split, independent of row order,
    * partitioning, or cluster size) and skew-free for dense or sparse ids.
    * One narrow projection — no shuffle. */
  def hashSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must fit in [0,100]")
    val h = pmod(col(idCol).cast("long") * HashMul, lit(100L))
    df.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified (per-stratum-rate) sampling: keep a row iff
    * `(id · HashMul) mod 1000 < rateMilli` — the mixture-weighting step of
    * a training pipeline (up/down-sample sources), with the same
    * content-stability contract as [[hashSplit]]: same id → same decision
    * on any cluster, any run, any row order. `rateMilli` is a per-row
    * Column (typically derived from the stratum column), in thousandths.
    * One narrow filter — no shuffle, no rand(). */
  def stratifiedSample(df: DataFrame, idCol: String,
      rateMilli: org.apache.spark.sql.Column): DataFrame =
    df.where(pmod(col(idCol).cast("long") * HashMul, lit(1000L)) < rateMilli)

  /** Token-budget pack manifest: documents in ascending `idCol` order are
    * assigned to consecutive packs of ~`budget` tokens — the
    * sequence-packing shard plan for pretraining data. A document's pack
    * is where its FIRST token lands (`(cumulative_before) div budget`), so
    * packs are contiguous id ranges and the assignment is a pure prefix-sum
    * — one window over a single global ordering. At 100 TB, pre-partition
    * by a coarse id range and run the window per range with per-range base
    * offsets (the same two-phase prefix-sum `appendDF` uses for offsets).
    * Output: (id, n_tokens, pack_id, pack_pos = offset of the document's
    * first token inside its pack). */
  def packManifest(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_incl", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("cum_incl") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        expr(s"start_tok DIV $budget").as("pack_id"),
        (col("start_tok") % budget).as("pack_pos"))
  }
}
