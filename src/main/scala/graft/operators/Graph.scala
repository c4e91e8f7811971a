package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations.
  *
  * The reference stores opaque log entries and has no graph surface
  * (SURVEY.md §2.5); this family covers the graph passes a training-data
  * pipeline runs over interaction/link data — PageRank for source-quality
  * weighting (the original web-corpus quality prior) and degree profiles
  * for connectivity triage. [[Dedup.connectedComponents]] is the third
  * member, kept with the dedup family because its consumer is cluster
  * labelling.
  *
  * All arithmetic is EXACT INTEGER (micro-units + floor division on
  * non-negative operands), so a DuckDB oracle reproduces every iteration
  * bit-for-bit — no floating-point drift across engines, which is what
  * makes an iterative fixpoint oracle-checkable at all.
  */
object Graph {

  /** PageRank in exact integer micro-units.
    *
    * Per iteration, every node sends `rank DIV out_degree` along each
    * out-edge and new ranks are
    * `base + (dampNum · Σ contribs) DIV dampDen` with
    * `base = ((dampDen − dampNum) · unit) DIV dampDen` — the standard
    * damped update, floored to integers. All operands are non-negative, so
    * Spark's `DIV` (truncate toward zero) and DuckDB's `//` (floor) agree
    * on every intermediate value (NOTES.md "integer division" invariant).
    *
    * Scale shape: one hash join (edges ⋈ ranks on `src` — the big side is
    * edges; ranks is one row per node) plus one map-side-combining
    * aggregation on `dst` per iteration. Out-degrees are computed once.
    * At 100 TB, pre-`repartition` edges by `src` so every iteration's join
    * reuses the same exchange, and localCheckpoint ranks every few rounds
    * to keep the plan flat; with the default small `iterations` the linear
    * lineage is fine as a single job. Nodes with no in-edges settle at
    * `base`; dangling nodes (no out-edges) simply contribute nothing —
    * callers wanting the redistribute-dangling-mass variant can add a
    * sink edge per dangling node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, unit: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampDen > dampNum)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = (dampDen - dampNum) * unit / dampDen
    var ranks = nodes.withColumn("rank", lit(unit))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("rank DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(s, 0L)) DIV $dampDen"))
            .as("rank"))
    }
    ranks
  }

  /** The DuckDB twin of [[pageRank]]: unrolled CTE per iteration, floor
    * division `//` on the same non-negative integers. `edgesCte` must
    * define a relation `e(src, dst)`. */
  def pageRankSql(edgesCte: String, iterations: Int = 5,
      unit: Long = 1000000L, dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val base = (dampDen - dampNum) * unit / dampDen
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST($base + ($dampNum * COALESCE(c.s, 0)) // $dampDen AS BIGINT) AS rank
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |           JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |n AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |r0 AS (SELECT node, CAST($unit AS BIGINT) AS rank FROM n),
       |$iters
       |SELECT node, rank FROM r$iterations ORDER BY node""".stripMargin
  }

  /** Per-node degree profile of a directed edge relation: out-degree,
    * in-degree, and distinct neighbor count — the one-pass connectivity
    * triage (hub detection, skew audit before a graph join). Three
    * map-side-combining aggregations on 8-byte keys, union'd; never wider
    * than the edge list. */
  def degreeProfile(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"), countDistinct(col("dst")).as("out_nbrs"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_nbrs"), lit(0L)).as("out_nbrs"))
  }
}
