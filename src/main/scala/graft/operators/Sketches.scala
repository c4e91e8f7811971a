package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Deterministic distinct-count / set-overlap sketches (KMV — k minimum
  * values; Bar-Yossef et al. 2002, Beyer et al. SIGMOD 2007).
  *
  * Unlike HLL-style sketches, KMV over a DETERMINISTIC hash is exactly
  * reproducible by any engine: the sketch is literally "the k smallest
  * distinct hash values", so the DuckDB oracle recomputes sketch AND
  * estimate bit-for-bit — approximation with an exact correctness gate.
  *
  * Scale: the [[graft.functions.BottomK]] aggregate carries a ≤ k-element
  * buffer with map-side partial aggregation — one k-long array per group
  * per map partition crosses the wire, versus COUNT(DISTINCT)'s shuffle of
  * every distinct value. At 100 TB that is the difference between a
  * metadata-sized exchange and a data-sized one; the exact counts computed
  * alongside in these operators exist for the oracle gate, a production
  * caller drops them.
  *
  * Relation to `rel_kmv_distinct` (SparkEntry): that query is the GLOBAL
  * single-sketch form, planned as distinct + TakeOrdered (fine for one
  * group). This object is the grouped/mergeable form — per-group sketches
  * in one aggregation, plus the union-sketch pairwise-Jaccard estimator
  * neither form had.
  */
object Sketches {
  /** 2⁶³ as an exact double — the value range of [[positiveHash]]. */
  val KmvRange: Double = 9.223372036854775808e18

  /** FNV-1a-64 of a binary column, top bit cleared: uniform on [0, 2⁶³) —
    * keeping the sign bit out lets both engines order and divide in plain
    * signed BIGINT arithmetic. */
  def positiveHash(c: Column): Column =
    GraftFunctions.fnv1a64(c).bitwiseAND(lit(Long.MaxValue))

  /** KMV estimate from a bottom-k array: (k-1)·R / kth-min when the sketch
    * is full, else the buffer size itself (exact below k). Multiply THEN
    * divide, in double — the same two IEEE ops [[kmvEstimateSql]] emits. */
  def kmvEstimate(bk: Column, k: Int): Column =
    when(size(bk) === k,
      floor(lit((k - 1).toDouble * KmvRange) / element_at(bk, k).cast("double"))
        .cast("long"))
      .otherwise(size(bk).cast("long"))

  /** DuckDB twin of [[kmvEstimate]] over (kth-min, buffer-size) columns. */
  def kmvEstimateSql(kth: String, kUsed: String, k: Int): String =
    s"CASE WHEN $kUsed = $k THEN CAST(floor(${(k - 1).toDouble * KmvRange} / " +
      s"CAST($kth AS DOUBLE)) AS BIGINT) ELSE $kUsed END"

  /** Per-group distinct-count sketch over `itemCol` (string items):
    * (group, n_exact, k_used, est_distinct). `n_exact` counts distinct
    * HASHES (identical in the oracle; 63-bit collisions are negligible and
    * engine-identical anyway). */
  def kmvDistinct(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame = {
    val hashed = df.select(col(groupCol),
      positiveHash(encode(col(itemCol), "UTF-8")).as("h"))
    hashed.groupBy(col(groupCol))
      .agg(GraftFunctions.bottom_k(col("h"), k).as("bk"),
        countDistinct(col("h")).as("n_exact"))
      .select(col(groupCol), col("n_exact"),
        size(col("bk")).cast("long").as("k_used"),
        kmvEstimate(col("bk"), k).as("est_distinct"))
  }

  /** Pairwise Jaccard estimates between every pair of groups' item sets,
    * via the KMV union trick: bottom-k of the UNION's hashes, fraction of
    * sketch members present in both sides. Emits the exact Jaccard too
    * (hash-distinct; for the oracle gate). Columns:
    * (g1, g2, n_union, n_inter, k_used, inter_in_sketch, jac_est, jac_exact).
    *
    * Shape: distinct-(group,item) → per-(pair,hash) membership flags (two
    * equi-joins against the pair list — never a theta join), one bottom-k
    * aggregate per pair, one equi-join back for the flags. The exact
    * branch shares the membership aggregate. */
  def kmvPairJaccard(df: DataFrame, groupCol: String, itemCol: String,
      k: Int): DataFrame = {
    val m = df.select(col(groupCol).as("g"), col(itemCol).as("item")).distinct()
      .withColumn("h", positiveHash(encode(col("item"), "UTF-8")))
    val groups = m.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("g1"))
      .crossJoin(groups.select(col("g").as("g2")))
      .where(col("g1") < col("g2"))
    val mp1 = pairs.join(m, col("g") === col("g1"))
      .select(col("g1"), col("g2"), col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
    val mp2 = pairs.join(m, col("g") === col("g2"))
      .select(col("g1"), col("g2"), col("h"), lit(0L).as("in_a"), lit(1L).as("in_b"))
    val u = mp1.unionByName(mp2).groupBy("g1", "g2", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val sk = u.groupBy("g1", "g2")
      .agg(GraftFunctions.bottom_k(col("h"), k).as("bk"),
        count(lit(1)).as("n_union"),
        sum(col("in_a") * col("in_b")).as("n_inter"))
    val flags = sk.select(col("g1"), col("g2"), explode(col("bk")).as("h"))
      .join(u, Seq("g1", "g2", "h"))
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("inter_in_sketch"))
    sk.drop("bk").join(flags, Seq("g1", "g2"))
      .select(col("g1"), col("g2"), col("n_union"), col("n_inter"),
        col("k_used"), col("inter_in_sketch"),
        TextOps.q6(col("inter_in_sketch").cast("double") / col("k_used"))
          .as("jac_est"),
        TextOps.q6(col("n_inter").cast("double") / col("n_union"))
          .as("jac_exact"))
  }
}
