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

  /** Count-Min frequency sketch cells (Cormode & Muthukrishnan 2005) as a
    * COMPOSED aggregation — no custom aggregate needed: `d`
    * pairwise-independent hash rows × `w` counters, built by exploding
    * each item into its d (row, cell) coordinates and ONE groupBy whose
    * map-side combine collapses the corpus to ≤ d·w cells. The sketch
    * state crossing the wire is metadata-sized at any corpus size; the
    * estimate (see [[countMinEstimates]]) only ever OVER-counts
    * (est ≥ exact; P[est > exact + εN] ≤ δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
    * Hashes are the deterministic (a·x + b) mod P family over the
    * positive FNV hash, so an oracle rebuilds counters and estimates
    * bit-for-bit. Output: (j, cell, cnt). */
  def countMinCells(items: DataFrame, itemCol: String,
      d: Int, w: Int): DataFrame = {
    items.select(explode(array(cmCoords(col(itemCol), d, w): _*)).as("jc"))
      .select(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** The d (row, cell) coordinates of one item — shared by build and
    * probe so they can never disagree. */
  private def cmCoords(item: Column, d: Int, w: Int): Seq[Column] = {
    val h = positiveHash(encode(item, "UTF-8")) % lit(TextOps.P)
    TextOps.hashCoeffs(d).zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j.toLong).as("j"),
        ((h * a + b) % TextOps.P % w).as("cell"))
    }
  }

  /** Point-query the sketch for each distinct item of `queries`: the
    * estimate is min over the item's d cells. `cells` is ≤ d·w rows, so
    * the lookup join broadcasts the SKETCH, never the corpus. Output:
    * (item, est). */
  def countMinEstimates(cells: DataFrame, queries: DataFrame,
      itemCol: String, d: Int, w: Int): DataFrame = {
    val probes = queries.select(col(itemCol).as("item")).distinct()
      .select(col("item"), explode(array(cmCoords(col("item"), d, w): _*)).as("jc"))
      .select(col("item"), col("jc.j").as("j"), col("jc.cell").as("cell"))
    probes.join(broadcast(cells), Seq("j", "cell"))
      .groupBy("item").agg(min(col("cnt")).as("est"))
  }

  /** HyperLogLog register table (Flajolet et al. 2007) over the
    * deterministic positive hash: bucket = h mod 2^p, rho = rank of the
    * leading one in the remaining 63−p bits (64−p − bit length; 64−p for
    * an all-zero remainder). Registers MAX-merge, so the aggregation is
    * ORDER-INDEPENDENT — one ≤ 2^p-row table per group after map-side
    * combine, exactly reproducible cross-engine (the KMV argument).
    * Output: (group, bucket, rho). */
  def hllRegisters(df: DataFrame, groupCol: String, itemCol: String,
      p: Int): DataFrame = {
    val m = 1L << p
    val h = positiveHash(encode(col(itemCol), "UTF-8"))
    val rest = shiftright(h, p) // top 63-p bits (integer shift, never `/`)
    df.select(col(groupCol).as("g"), (h % m).as("bucket"),
        when(rest === 0L, lit((64 - p).toLong))
          .otherwise(lit((64 - p).toLong) - length(bin(rest)).cast("long"))
          .as("r"))
      .groupBy("g", "bucket").agg(max(col("r")).as("rho"))
  }

  /** Raw HLL estimate per group, INTEGER-EXACT denominator: registers
    * are capped at rho ≤ 40 (implementations cap register width anyway;
    * terms below 2^−40 are noise) so Σ2^−M rescales to the exact long
    * Σ2^(40−M) + (m − m_used)·2^40 — order-independent by integer
    * addition, never a float-summation last-ulp that merge order could
    * flip (a naive double Σ of mixed-magnitude dyadics is NOT exact).
    * One double division of exact integers lands under the q6 contract.
    * Raw estimator only — the small-range linear-counting correction
    * needs ln(), which the integer-exactness discipline avoids; the
    * exact distinct count rides alongside as the oracle gate. Output:
    * (group, m_used, n_exact, raw_est). */
  /** α_m·m²·2^40 — [[hllEstimate]]'s numerator constant, exposed so the
    * oracle SQL is GENERATED from the same value, never hand-copied. */
  def hllNumConst(p: Int): Double = {
    val m = (1L << p).toDouble
    (0.7213 / (1.0 + 1.079 / m)) * m * m * 1099511627776.0
  }

  def hllEstimate(df: DataFrame, groupCol: String, itemCol: String,
      p: Int): DataFrame = {
    val num = hllNumConst(p)
    val regs = hllRegisters(df, groupCol, itemCol, p)
    val exact = df.select(col(groupCol).as("g"),
        positiveHash(encode(col(itemCol), "UTF-8")).as("h"))
      .groupBy("g").agg(countDistinct(col("h")).as("n_exact"))
    regs.groupBy("g")
      .agg(count(lit(1)).as("m_used"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - least(rho, 40) AS INT))"))
          .as("snum"))
      .join(exact, Seq("g"))
      .select(col("g"), col("m_used"), col("n_exact"),
        TextOps.q6(lit(num) /
          (col("snum") + (lit((1L << p)) - col("m_used")) * lit(1099511627776L))
            .cast("double")).as("raw_est"))
  }

  /** The k Bloom-filter bit positions of a positive 63-bit hash, by
    * double hashing (Kirsch & Mitzenmacher 2006 — two hash values
    * simulate k independent ones with no asymptotic FPR loss):
    * `pos_i = (h mod m + i·h2) mod m` with
    * `h2 = ((h div m) mod (m/2))·2 + 1` — h2 is forced ODD so it is
    * coprime with the power-of-two m and the k probe positions never
    * coincide (an even h2 would silently halve the effective k). All
    * operands non-negative, so div/mod agree across engines; `m` must be
    * a power of two (the div is an exact shift, and fill-ratio doubles
    * divide exactly by 2^log2m downstream). [[bloomPositionsSql]] is the
    * generated twin. */
  def bloomPositions(h: Column, m: Int, k: Int): Column = {
    require(m >= 4 && (m & (m - 1)) == 0, "m must be a power of two")
    require(k >= 1)
    val log2m = java.lang.Integer.numberOfTrailingZeros(m)
    val h1 = h % m
    val h2 = (shiftright(h, log2m) % (m / 2)) * lit(2L) + lit(1L)
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % m): _*)
  }

  /** DuckDB twin of [[bloomPositions]] over a non-negative BIGINT
    * expression `h`: a k-element list literal of the same arithmetic
    * (`//` floors = Spark's shift for non-negative operands). */
  def bloomPositionsSql(h: String, m: Int, k: Int): String = {
    val h1 = s"(($h) % $m)"
    val h2 = s"(((($h) // $m) % ${m / 2}) * 2 + 1)"
    (0 until k).map(i => s"(($h1 + $i * $h2) % $m)").mkString("[", ", ", "]")
  }

  /** The Swamidass-Baldi Bloom cardinality estimate
    * n̂ = −(m/k)·ln(1 − X/m) as ONE expression string valid in both Spark
    * SQL and DuckDB (`div` is `"DIV"` for Spark, `"//"` for DuckDB — the
    * only token the dialects disagree on; operands are non-negative so
    * truncate = floor). ln is quantized to integer micronats before the
    * single integer division; a saturated filter (X = m) yields NULL. */
  def bloomEstSql(bits: String, m: Int, k: Int, div: String): String =
    s"CASE WHEN $bits < $m THEN " +
      s"((-(CAST(floor(ln(CAST($m - $bits AS DOUBLE) / $m.0) * 1000000 + 0.5)" +
      s" AS BIGINT))) * $m) $div ${k.toLong * 1000000L} END"

  /** Bloom set-operations audit between two item sets (split by the
    * boolean `flagCol`: true = A, false = B): the union of two Bloom
    * filters over the same (m, k) is their bitwise OR — the property
    * that makes Bloom state MERGEABLE across shards/streams with no
    * precision loss — and |A∩B| falls out of inclusion-exclusion over
    * the three cardinality estimates ([[bloomEstSql]]; clamped at 0).
    * Exact counts ride alongside as the oracle gate.
    *
    * Plan: one hash-distinct with membership flags (map-side combined),
    * one ≤ m-row position aggregation, two 1-row sides crossJoined. At
    * 100 TB per-shard filters OR together at m bits each; this audit
    * prices the merged filter without re-reading any shard. */
  def bloomSetOps(df: DataFrame, flagCol: String, itemCol: String, m: Int,
      k: Int): DataFrame = {
    val h = df.select(col(flagCol).as("fa"),
        positiveHash(encode(col(itemCol), "UTF-8")).as("h"))
      .groupBy("h")
      .agg(max(when(col("fa"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("fa"), 0L).otherwise(1L)).as("in_b"))
    val hx = h.agg(sum(col("in_a")).as("n_exact_a"),
      sum(col("in_b")).as("n_exact_b"),
      count(lit(1)).as("n_exact_union"),
      sum(col("in_a") * col("in_b")).as("n_exact_inter"))
    val bits = h
      .select(explode(bloomPositions(col("h"), m, k)).as("pos"),
        col("in_a"), col("in_b"))
      .groupBy("pos").agg(max("in_a").as("pa"), max("in_b").as("pb"))
      .agg(sum(col("pa")).as("bits_a"), sum(col("pb")).as("bits_b"),
        count(lit(1)).as("bits_union"))
    bits.crossJoin(hx) // two 1-row sides
      .withColumn("est_a", expr(bloomEstSql("bits_a", m, k, "DIV")))
      .withColumn("est_b", expr(bloomEstSql("bits_b", m, k, "DIV")))
      .withColumn("est_union", expr(bloomEstSql("bits_union", m, k, "DIV")))
      // NULL must propagate explicitly: greatest() SKIPS nulls, so a
      // saturated filter (est_* NULL by design) would otherwise read as a
      // confident 0 intersection — and DuckDB's greatest NULL handling is
      // version-dependent, so the twin could diverge exactly there.
      .withColumn("est_inter",
        when(col("est_a").isNull || col("est_b").isNull ||
          col("est_union").isNull, lit(null).cast("long"))
        .otherwise(
          greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))))
      .select(col("bits_a"), col("bits_b"), col("bits_union"),
        col("n_exact_a"), col("n_exact_b"), col("n_exact_union"),
        col("n_exact_inter"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"))
  }

  /** One-row Bloom-filter audit over the distinct items of `itemCol`:
    * build the m-bit filter (as the SET of distinct bit positions — the
    * aggregation collapses to ≤ m rows after map-side combine, never a
    * data-sized exchange), report the exact fill, the classic
    * cardinality estimate n̂ = −(m/k)·ln(1 − X/m) (Swamidass & Baldi
    * 2007) and the fill-based FPR estimate (X/m)^k, with the exact
    * distinct count alongside as the oracle gate. Float discipline: the
    * fill ratios divide by a power of two (exact), ln is quantized to
    * integer micronats before the ONE integer division, and the FPR
    * power is an explicit multiplication chain — every step replayable
    * bit-for-bit by the SQL twin. A saturated filter (every bit set) has
    * no finite estimate; `est_distinct` is NULL there by construction.
    *
    * At 100 TB this is the shape of a streaming-dedup admission gate's
    * health check: the filter state is m bits however large the corpus,
    * and this report prices its current false-positive cost. */
  def bloomFillReport(df: DataFrame, itemCol: String, m: Int,
      k: Int): DataFrame = {
    val hashes = df
      .select(positiveHash(encode(col(itemCol), "UTF-8")).as("h")).distinct()
    val bits = hashes
      .select(explode(bloomPositions(col("h"), m, k)).as("pos"))
      .agg(countDistinct(col("pos")).as("bits_set"))
    val n = hashes.agg(count(lit(1)).as("n_exact"))
    bits.crossJoin(n) // two 1-row sides
      .withColumn("fill_micro", expr(s"(1000000 * bits_set) DIV $m"))
      .withColumn("lnq", when(col("bits_set") < m,
        floor(log((lit(m.toLong) - col("bits_set")).cast("double") /
          lit(m.toDouble)) * lit(1e6) + lit(0.5)).cast("long")))
      .withColumn("est_distinct",
        expr(s"((-lnq) * $m) DIV ${k.toLong * 1000000L}"))
      .withColumn("fpr_micro", expr("CAST(floor(" +
        TextOps.powChainSql(s"(CAST(bits_set AS DOUBLE) / $m.0)", k) +
        " * 1000000 + 0.5) AS BIGINT)"))
      .select(lit(m.toLong).as("m_bits"), lit(k.toLong).as("k_hashes"),
        col("bits_set"), col("fill_micro"), col("n_exact"),
        col("est_distinct"), col("fpr_micro"))
  }
}
