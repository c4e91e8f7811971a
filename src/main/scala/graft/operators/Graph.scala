package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Undirected edge list as distinct directed (src, dst) in BOTH
    * orientations, emitted by one explode so the upstream plan is
    * evaluated ONCE (a `union(select(a,b), select(b,a))` evaluates it
    * twice — 2× a whole co-occurrence projection before any checkpoint
    * can cut the lineage). */
  def symmetrize(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .distinct()

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

  /** Item co-occurrence projection of a bipartite (user, item) relation:
    * unordered item pairs sharing at least `minShared` distinct users —
    * the classic "users who touched A also touched B" similarity graph
    * (and the input to [[triangleCounts]] community structure).
    *
    * Plan shape: distinct (user, item), then a self-equi-join on user and
    * a pair aggregation with map-side combine. Fan-out per user is
    * items² — the standard co-occurrence hazard — so `maxUserDegree`
    * drops power users (same playbook as stop-shingles in
    * [[Dedup.ngramJaccardPairs]]: a user touching everything carries no
    * similarity signal and dominates the join); every surviving join
    * bucket is ≤ maxUserDegree rows per side at any corpus scale. */
  def cooccurrence(rel: DataFrame, userCol: String, itemCol: String,
      minShared: Long = 2L, maxUserDegree: Int = 1000): DataFrame = {
    // ONE aggregation replaces the classic self-join: collect_set(u → its)
    // is both the distinct and the degree cap (power users carry no
    // similarity signal and dominate the fan-out), and the sorted array
    // generates each a<b pair exactly once INSIDE the explode stage — the
    // Σ deg² pair rows never cross a join, and the pair aggregation's
    // map-side combine collapses them before the only pair-keyed shuffle.
    // Semantics are identical to the self-join formulation (the DuckDB
    // twin replays that one verbatim); the plan is one shuffle shorter
    // and join-free. Per-user state is ≤ maxUserDegree items at any
    // corpus scale, so the 100 TB shape is the same two exchanges.
    val items = rel.select(col(userCol).as("u"), col(itemCol).as("it"))
      .groupBy("u").agg(sort_array(collect_set(col("it"))).as("its"))
      .where(size(col("its")) <= maxUserDegree)
    items.select(explode(expr(
        "flatten(transform(its, (x, i) -> " +
          "transform(slice(its, i + 2, size(its) - i - 1), " +
          "y -> struct(x AS item_a, y AS item_b))))")).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("co_users"))
      .where(col("co_users") >= minShared)
  }

  /** Adamic–Adar link prediction over a bipartite (user, item) relation:
    * for each user pair sharing ≥ `minCommon` items, the classic
    * score Σ_{shared item} 1 / ln(degree(item)) — rare shared items count
    * more than popular ones (Adamic & Adar 2003, "Friends and neighbors
    * on the Web"). Scores are exact integers: each item contributes
    * floor(1e6 / ln(deg) + 0.5) micro-units, rounded PER TERM before the
    * sum so both engines add identical integers (the millinat playbook).
    *
    * Plan shape: a cheap per-item `count_distinct` FIRST drops hub items
    * (> maxItemDegree — and unlike the ad-hoc caps elsewhere, dropping
    * high-degree hubs here is the operator's own semantics: a hub's
    * 1/ln(deg) weight is negligible similarity signal), THEN the surviving
    * items collect their user sets — so no executor ever materializes a
    * hub's unbounded user set, and the per-item aggregation state really
    * is ≤ maxItemDegree users at any corpus scale. The join and the
    * collect_set reuse the degree aggregation's `it` partitioning (one
    * extra exchange vs the single-pass shape, bought for bounded state);
    * pairs generate inside the explode stage, one pair-keyed aggregation
    * with map-side combine. */
  def adamicAdar(rel: DataFrame, userCol: String, itemCol: String,
      maxItemDegree: Int = 50, minCommon: Long = 2L): DataFrame = {
    val base = rel.select(col(userCol).as("u"), col(itemCol).as("it"))
    val deg = base.groupBy("it")
      .agg(count_distinct(col("u")).as("deg"))
      .where(col("deg").between(2, maxItemDegree))
      .withColumn("w",
        floor(lit(1000000.0) / log(col("deg").cast("double")) + lit(0.5))
          .cast("long"))
    val byItem = base.join(deg, "it")
      .groupBy(col("it"), col("w"))
      .agg(sort_array(collect_set(col("u"))).as("us"))
    byItem.select(col("w"), explode(expr(
        "flatten(transform(us, (x, i) -> " +
          "transform(slice(us, i + 2, size(us) - i - 1), " +
          "y -> struct(x AS ua, y AS ub))))")).as("p"))
      .groupBy(col("p.ua").as("user_a"), col("p.ub").as("user_b"))
      .agg(count(lit(1)).as("n_common"), sum(col("w")).as("aa_micro"))
      .where(col("n_common") >= minCommon)
  }

  /** HITS hubs-and-authorities (Kleinberg 1999) over a bipartite directed
    * relation `user → item`, in exact integer micro-units: per iteration,
    * authority(item) = Σ hub(user) over in-edges and hub(user) =
    * Σ authority(item) over out-edges, each side L1-normalized to `unit`
    * total via `(raw · unit) DIV Σ raw` — all operands non-negative, so
    * Spark `DIV` and DuckDB `//` agree term by term (the pageRank
    * discipline). Returns `(node, kind 'hub'|'auth', score_micro)`.
    *
    * Scale shape: per iteration one edges⋈scores equi-join + one
    * map-side-combining aggregation per side, plus a 1-row total
    * broadcast-crossed in (the only global). Overflow bound: after the
    * first normalization every Σ raw ≤ unit², so `raw · unit` needs
    * unit³ ≤ 2⁶³ — fine at unit = 1e6; the FIRST pass needs
    * unit² · n_users ≤ 2⁶³ (n_users ≤ ~9e6 at the default unit — seed
    * with a smaller unit for larger node sets). */
  def hits(rel: DataFrame, userCol: String, itemCol: String,
      iterations: Int = 4, unit: Long = 1000000L): DataFrame = {
    require(iterations >= 1)
    // the [[labelPropagation]]/[[kCorePrune]] discipline: the edge set is
    // joined twice per iteration and iterations nest, and each normalized
    // side is referenced TWICE by `normalize` (the 1-row total aggregate
    // + the broadcast-crossed rescale) and again by the next iteration —
    // without per-iteration truncation the final plan holds up to
    // 2^(2·iterations) copies of the base subtree (measured: 30 s at
    // sf0.1 on an input adamicAdar handles in ~1 s). localCheckpoint
    // changes evaluation only, never values, so the integer contract with
    // the DuckDB twin (whose CTEs are AS MATERIALIZED for the same
    // reason) is untouched.
    val e = rel.select(col(userCol).as("u"), col(itemCol).as("it"))
      .distinct().localCheckpoint()
    def normalize(scores: DataFrame, key: String): DataFrame = {
      // materialize the pre-normalization scores once: both the total and
      // the rescale read them, and the next iteration reads the result
      val s = scores.localCheckpoint()
      val tot = s.agg(sum(col("raw")).as("tot"))
      s.crossJoin(broadcast(tot))
        .select(col(key), expr(s"(raw * $unit) DIV tot").as("score"))
    }
    var hubs = e.select(col("u")).distinct().withColumn("score", lit(unit))
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      auths = normalize(
        e.join(hubs, Seq("u"))
          .groupBy("it").agg(sum(col("score")).as("raw")), "it")
      hubs = normalize(
        e.join(auths, Seq("it"))
          .groupBy("u").agg(sum(col("score")).as("raw")), "u")
    }
    hubs.select(col("u").as("node"), lit("hub").as("kind"),
        col("score").as("score_micro"))
      .unionAll(auths.select(col("it").as("node"), lit("auth").as("kind"),
        col("score").as("score_micro")))
  }

  /** The DuckDB twin of [[hits]]: unrolled CTEs, floor division on the
    * same non-negative integers. `edgesCte` must define `e(u, it)`
    * (already distinct). Every stage is `AS MATERIALIZED` — each level is
    * referenced several times (normalizer total + next level + final
    * select), and DuckDB's default CTE inlining would re-evaluate the
    * whole chain per reference: exponential in `iterations`. This is
    * DuckDB-only syntax, which is fine — oracles never run on Spark. */
  def hitsSql(edgesCte: String, iterations: Int = 4,
      unit: Long = 1000000L): String = {
    val iters = (1 to iterations).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.it, SUM(h.score) AS raw
         |  FROM e JOIN h${i - 1} h ON e.u = h.u GROUP BY e.it),
         |a$i AS MATERIALIZED (SELECT it,
         |  CAST((raw * $unit) // (SELECT SUM(raw) FROM ar$i) AS BIGINT) AS score
         |  FROM ar$i),
         |hr$i AS MATERIALIZED (SELECT e.u, SUM(a.score) AS raw
         |  FROM e JOIN a$i a ON e.it = a.it GROUP BY e.u),
         |h$i AS MATERIALIZED (SELECT u,
         |  CAST((raw * $unit) // (SELECT SUM(raw) FROM hr$i) AS BIGINT) AS score
         |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |h0 AS MATERIALIZED (SELECT DISTINCT u, CAST($unit AS BIGINT) AS score FROM e),
       |$iters
       |SELECT u AS node, 'hub' AS kind, score AS score_micro FROM h$iterations
       |UNION ALL
       |SELECT it, 'auth', score FROM a$iterations
       |ORDER BY kind, node""".stripMargin
  }

  /** Link-prediction battery over a bipartite (user, item) relation: for
    * each user pair sharing ≥ `minCommon` distinct non-hub items, the
    * three classic unweighted scores side by side — common neighbors,
    * Jaccard (in exact micro-units, `(common · 1e6) DIV union`), and
    * preferential attachment (`deg_a · deg_b`) — the feature row a ranking
    * model consumes (Liben-Nowell & Kleinberg 2003). Complements
    * [[adamicAdar]], which weights the SAME pairs by item rarity.
    *
    * Degrees (and therefore Jaccard's union) are computed over the
    * hub-filtered relation, so the three scores describe one consistent
    * graph. Plan shape is [[adamicAdar]]'s: cheap per-item degree first
    * (hub items dropped BEFORE any user set materializes — bounded state),
    * pairs generated inside the explode, one pair-keyed aggregation, then
    * two joins to the compact per-user degree table. */
  def linkPredict(rel: DataFrame, userCol: String, itemCol: String,
      maxItemDegree: Int = 50, minCommon: Long = 2L): DataFrame = {
    val base = rel.select(col(userCol).as("u"), col(itemCol).as("it"))
    val deg = base.groupBy("it")
      .agg(count_distinct(col("u")).as("deg"))
      .where(col("deg").between(2, maxItemDegree))
    val kept = base.join(deg.select("it"), "it").distinct()
    val udeg = kept.groupBy("u").agg(count(lit(1)).as("udeg"))
    val byItem = kept.groupBy("it")
      .agg(sort_array(collect_set(col("u"))).as("us"))
    byItem.select(explode(expr(
        "flatten(transform(us, (x, i) -> " +
          "transform(slice(us, i + 2, size(us) - i - 1), " +
          "y -> struct(x AS ua, y AS ub))))")).as("p"))
      .groupBy(col("p.ua").as("user_a"), col("p.ub").as("user_b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
      .join(udeg.select(col("u").as("user_a"), col("udeg").as("deg_a")), Seq("user_a"))
      .join(udeg.select(col("u").as("user_b"), col("udeg").as("deg_b")), Seq("user_b"))
      .select(col("user_a"), col("user_b"), col("n_common"),
        col("deg_a"), col("deg_b"),
        expr("(n_common * 1000000) DIV (deg_a + deg_b - n_common)")
          .as("jaccard_micro"),
        (col("deg_a") * col("deg_b")).as("pref_attach"))
  }

  /** Per-node triangle counts over an undirected edge list (pairs in
    * either orientation; duplicates collapse). Edges are canonicalized
    * a < b, and triangles enumerate as the 2-path join (a−b)(b−c) closed
    * by (a−c) — each triangle found exactly once since a < b < c. Both
    * joins are equi-joins; the 2-path fan-out is Σ deg², so at 100 TB
    * orient by (degree, id) instead of raw id (the standard
    * degeneracy-ordering bound) — same plan, different orientation key;
    * raw-id orientation is kept here because the oracle twin replays it
    * verbatim. Nodes in no triangle are absent (count 0 by definition). */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    val abc = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      // closure test as a semi-join keeps (a,b,c) rows without widening
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"), "left_semi")
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    abc.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Synchronous min-label propagation over an undirected edge list —
    * the cheap community/cluster labelling pass (HashMin): every node
    * starts labelled with its own id and each round takes the minimum of
    * its own label and its neighbours' labels. After `iterations` rounds
    * a node carries the smallest id within `iterations` hops, so labels
    * approximate communities (and converge to connected components as
    * rounds grow — [[Dedup.connectedComponents]] is the run-to-fixpoint
    * sibling used for dedup clustering; this bounded-round form is the
    * one a 100 TB pipeline schedules, cost = `iterations` × one join +
    * one agg).
    *
    * Plan shape per round: edges ⋈ labels (equi-join on the neighbour
    * end, shuffle keyed by node id) then a min-aggregation with map-side
    * combine. Labels are ids (integers) throughout — no floats, so the
    * DuckDB twin replays every round bit-for-bit. At scale, pre-partition
    * the symmetrized edge list by `src` once so all rounds reuse one
    * exchange. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1)
    // same persist-the-edge-list move as [[kCorePrune]]: each round joins
    // the symmetrized edges again and rounds nest, so an expensive
    // upstream would be recomputed per round without the one-time
    // materialization
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iterations) {
      val nbrMin = e
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("label")).as("nbr"))
      labels = labels.join(nbrMin, Seq("node"))
        .select(col("node"), least(col("label"), col("nbr")).as("label"))
      // truncate lineage between rounds (labels feeds round r+1 twice:
      // the neighbour join and the merge join) — one node-count-sized
      // materialization per round beats the nested-plan stage blowup
      if (i < iterations) labels = labels.localCheckpoint()
    }
    labels
  }

  /** Bounded-round k-core pruning over an undirected edge list: each
    * round recomputes degrees on the surviving subgraph and drops nodes
    * with degree < k (plus their edges). Run to fixpoint this yields the
    * exact k-core; the bounded-round form is the scheduled-pipeline
    * variant ([[labelPropagation]]'s relationship to connected
    * components) — each round is one map-side-combined degree agg plus
    * two semi-joins, integer-only so the DuckDB twin unrolls the same
    * rounds. Returns surviving (node, degree) on the post-prune
    * subgraph. */
  def kCorePrune(edges: DataFrame, aCol: String, bCol: String,
      k: Long, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && k >= 1)
    // materialize the symmetrized edge set ONCE (eager localCheckpoint,
    // not cache: truncates lineage, no LRU churn) so an expensive
    // upstream (e.g. a co-occurrence projection) is never recomputed
    var e = symmetrize(edges, aCol, bCol).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("src")
      // checkpoint EVERY round: round r's plan references round r-1's
      // THREE times (degree agg + two semi-joins), so without truncation
      // the stage count grows 3^rounds — measured 15 s → ~2 s on the
      // co-occurrence fixture. The surviving edge set only shrinks, so
      // the materialization is at most the first round's edges.
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** Bounded-round k-truss peeling over an undirected edge list: each
    * round computes per-EDGE triangle support on the surviving subgraph
    * (the canonical a<b<c closure of [[triangleCounts]], each triangle
    * crediting its three edges) and drops edges supported by fewer than
    * k−2 triangles. Run to fixpoint this is the exact k-truss (Cohen
    * 2008) — the edge-grained dense-community core that k-core's
    * node-degree peel overcounts; the bounded-round form is the
    * scheduled-pipeline variant ([[kCorePrune]]'s relationship to the
    * exact core). Integer-only, so the SQL twin unrolls identical rounds.
    *
    * Plan shape per round: one 2-path equi-join + one semi-join closure +
    * one map-side-combined support aggregation + one edge semi-join —
    * the same Σ deg² fan-out bound as [[triangleCounts]] (orient by
    * degree at extreme scale). localCheckpoint per round: round r's plan
    * references round r−1's edge set four times. Returns the surviving
    * canonical (a, b) edges. */
  def kTrussPrune(edges: DataFrame, aCol: String, bCol: String,
      k: Long, rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && k >= 3, "need rounds >= 1 and k >= 3")
    var e = edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"),
          "left_semi")
        .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      val keep = tri.select(explode(array(
          struct(col("x").as("a"), col("y").as("b")),
          struct(col("y").as("a"), col("z").as("b")),
          struct(col("x").as("a"), col("z").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
        .where(col("support") >= k - 2)
        .select("a", "b")
      // an edge in no triangle has no support row -> dropped by the
      // semi-join, which is exactly the support-0 < k-2 rule
      e = e.join(keep, Seq("a", "b"), "left_semi").localCheckpoint()
    }
    e.select(col("a"), col("b"))
  }

  /** The DuckDB twin of [[kTrussPrune]]: unrolled peel rounds. `edgesCte`
    * must define `e0(a, b)` as the canonical a<b distinct edge list. */
  def kTrussSql(edgesCte: String, k: Long, rounds: Int): String = {
    val rcte = (1 to rounds).map { r =>
      s"""t$r AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e${r - 1} e1 JOIN e${r - 1} e2 ON e1.b = e2.a
         |  WHERE EXISTS (SELECT 1 FROM e${r - 1} e3
         |    WHERE e3.a = e1.a AND e3.b = e2.b)),
         |s$r AS (SELECT a, b FROM (
         |  SELECT x AS a, y AS b FROM t$r
         |  UNION ALL SELECT y, z FROM t$r
         |  UNION ALL SELECT x, z FROM t$r)
         |  GROUP BY a, b HAVING count(*) >= ${k - 2}),
         |e$r AS (SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN s$r s ON e.a = s.a AND e.b = s.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |$rcte
       |SELECT a, b FROM e$rounds ORDER BY a, b""".stripMargin
  }

  /** Bounded-round multi-source BFS over an undirected edge list: every
    * node satisfying `seed` starts at distance 0 and each round extends
    * the frontier one hop, so after `rounds` rounds the output holds
    * (node, dist) for every node within `rounds` hops of a seed —
    * unreached nodes are absent. This is the reachability/labelling pass
    * a pipeline runs from a trusted seed set (e.g. "how far is every item
    * from a curated anchor set").
    *
    * Plan shape per round: one semi-join (edges ⋈ frontier on `src`) to
    * advance, one anti-join against the visited set to drop re-visits —
    * both equi-joins keyed on node ids, map-side-combinable, and the
    * frontier/visited tables only ever hold (id, small-int) rows. The
    * visited set is localCheckpoint'd per round (each round references it
    * twice: frontier filter + anti-join, and rounds nest). Distances are
    * integers, so a DuckDB twin unrolls the same rounds bit-for-bit. */
  def bfsLayers(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    var dist = e.select(col("src").as("node")).distinct()
      .where(seed).withColumn("dist", lit(0L)).localCheckpoint()
    for (r <- 1 to rounds) {
      val frontier = dist.where(col("dist") === (r - 1).toLong)
        .select(col("node").as("src"))
      val reached = e.join(frontier, Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
      dist = dist.unionAll(reached).localCheckpoint()
    }
    dist
  }

  /** The DuckDB twin of [[bfsLayers]]: unrolled frontier CTEs. `edgesCte`
    * must end with a SYMMETRIZED relation `e(src, dst)`; `seedWhere` is a
    * predicate over `node`. */
  def bfsLayersSql(edgesCte: String, seedWhere: String, rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""f$i AS (SELECT DISTINCT e.dst AS node FROM e
         |  JOIN d${i - 1} p ON e.src = p.node AND p.dist = ${i - 1}
         |  WHERE e.dst NOT IN (SELECT node FROM d${i - 1})),
         |d$i AS (SELECT node, dist FROM d${i - 1}
         |  UNION ALL SELECT node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |n AS (SELECT DISTINCT src AS node FROM e),
       |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM n WHERE $seedWhere),
       |$rs
       |SELECT node, dist FROM d$rounds ORDER BY node""".stripMargin
  }

  /** Sampled Brandes betweenness over an undirected edge list, truncated
    * at `rounds` hops — the two standard approximations composed:
    * Brandes-pivot root SAMPLING (`seed` picks the roots) and k-BOUNDED
    * paths (`rounds` caps the BFS depth), the shapes that make
    * betweenness tractable on a corpus-scale graph where exact Brandes'
    * O(V·E) is out of reach.
    *
    * Forward pass: multi-source BFS keyed by (root, node) accumulating
    * INTEGER shortest-path counts σ (bfsLayers with multiplicities — one
    * frontier equi-join + one keyed σ-sum + one visited anti-join per
    * level). Backward pass (Brandes' dependency accumulation): per level
    * d from the deepest in, δ(v) = Σ over shortest-path-DAG successors w
    * of (σ(v) · (unit + δ(w))) DIV σ(w), in integer micro-units with
    * truncating division — all operands non-negative, so Spark's `DIV`
    * and DuckDB's `//` agree on every intermediate and the twin replays
    * every level bit-for-bit (the pageRank/bfsLayers oracle argument;
    * truncation loses < 1 micro-unit per DAG edge vs real-valued
    * Brandes). The DAG needs no materialization: level-(d+1) membership
    * IS the successor test, so each backward level is one equi-join with
    * edges + one equi-join with the deeper level on (root, dst) + one
    * keyed sum. State is only ever (root, node, two longs); no
    * all-pairs, no global windows. Output: (node, btw_micro) summed over
    * roots with v ≠ root, for every node within `rounds` hops of a
    * root. */
  def brandesBetweenness(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, rounds: Int, unit: Long = 1000000L): DataFrame = {
    require(rounds >= 1)
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val roots = e.select(col("src").as("node")).distinct().where(seed)
      .select(col("node").as("root"), col("node"), lit(1L).as("sigma"))
      .localCheckpoint()
    var levels = Vector(roots)
    // visited is only ever a union of ALREADY-checkpointed level frames, so
    // its lineage stays one union deep without a barrier of its own —
    // checkpointing it spent an eager Spark job per round for nothing
    // (r14; measured on graph_betweenness)
    var visited = roots.select("root", "node")
    for (_ <- 1 to rounds) {
      val f = levels.last.select(col("root"), col("node").as("src"), col("sigma"))
      val next = e.join(f, Seq("src"))
        .select(col("root"), col("dst").as("node"), col("sigma"))
        .join(visited, Seq("root", "node"), "left_anti")
        .groupBy("root", "node").agg(sum("sigma").as("sigma"))
        .localCheckpoint()
      levels = levels :+ next
      visited = visited.unionAll(next.select("root", "node"))
    }
    var deeper = levels(rounds).withColumn("delta", lit(0L))
    var acc = deeper.select(col("root"), col("node"), col("delta"))
    for (d <- (rounds - 1) to 0 by -1) {
      val cur = levels(d)
      val dw = deeper.select(col("root"), col("node").as("dst"),
        col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      val contrib = cur.select(col("root"), col("node").as("src"), col("sigma"))
        .join(e, Seq("src"))
        .join(dw, Seq("root", "dst"))
        .select(col("root"), col("src").as("node"),
          expr(s"(sigma * ($unit + delta_w)) DIV sigma_w").as("c"))
        .groupBy("root", "node").agg(sum("c").as("delta"))
      deeper = cur.join(contrib, Seq("root", "node"), "left")
        .select(col("root"), col("node"), col("sigma"),
          coalesce(col("delta"), lit(0L)).as("delta"))
        .localCheckpoint()
      acc = acc.unionAll(deeper.select(col("root"), col("node"), col("delta")))
    }
    acc.where(col("node") =!= col("root"))
      .groupBy("node").agg(sum("delta").as("btw_micro"))
  }

  /** The DuckDB twin of [[brandesBetweenness]]: unrolled forward levels
    * (σ-counting BFS with NOT EXISTS visited guards) + unrolled backward
    * dependency levels with the same `//` accumulation. `edgesCte` must
    * end with a SYMMETRIZED relation `e(src, dst)`; `seedWhere` is a
    * predicate over `node`. */
  def brandesBetweennessSql(edgesCte: String, seedWhere: String,
      rounds: Int, unit: Long = 1000000L): String = {
    val fwd = (1 to rounds).map { i =>
      s"""l$i AS (SELECT f.root, e.dst AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
         |  FROM l${i - 1} f JOIN e ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v
         |    WHERE v.root = f.root AND v.node = e.dst)
         |  GROUP BY 1, 2),
         |v$i AS (SELECT root, node FROM v${i - 1}
         |  UNION ALL SELECT root, node FROM l$i)""".stripMargin
    }.mkString(",\n")
    val bwd = ((rounds - 1) to 0 by -1).map { d =>
      s"""d$d AS (SELECT c.root, c.node, c.sigma, COALESCE(x.delta, 0) AS delta
         |  FROM l$d c LEFT JOIN (
         |    SELECT c2.root, c2.node,
         |      CAST(SUM((c2.sigma * ($unit + w.delta)) // w.sigma) AS BIGINT) AS delta
         |    FROM l$d c2 JOIN e ON e.src = c2.node
         |    JOIN d${d + 1} w ON w.root = c2.root AND w.node = e.dst
         |    GROUP BY 1, 2) x ON x.root = c.root AND x.node = c.node)""".stripMargin
    }.mkString(",\n")
    val accAll = (0 to rounds)
      .map(d => s"SELECT root, node, delta FROM d$d").mkString("\n  UNION ALL ")
    s"""WITH $edgesCte,
       |n AS (SELECT DISTINCT src AS node FROM e),
       |l0 AS (SELECT node AS root, node, CAST(1 AS BIGINT) AS sigma
       |  FROM n WHERE $seedWhere),
       |v0 AS (SELECT root, node FROM l0),
       |$fwd,
       |d$rounds AS (SELECT root, node, sigma, CAST(0 AS BIGINT) AS delta FROM l$rounds),
       |$bwd,
       |a AS ($accAll)
       |SELECT node, CAST(SUM(delta) AS BIGINT) AS btw_micro
       |FROM a WHERE node <> root GROUP BY node ORDER BY node""".stripMargin
  }

  /** Personalized PageRank in exact integer micro-units: same damped
    * update as [[pageRank]], but the teleport mass returns ONLY to the
    * seed set (`seed`, a predicate over `node`) — non-seed nodes get rank
    * exclusively through in-links, so ranks measure proximity to the
    * seeds (the "related items" / trust-propagation primitive). Identical
    * per-iteration plan shape to pageRank; all operands non-negative
    * integers, so the DuckDB twin replays every iteration. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seed: Column, iterations: Int = 4, unit: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampDen > dampNum)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val base = (dampDen - dampNum) * unit / dampDen
    val restart = when(seed, lit(base)).otherwise(lit(0L))
    var ranks = nodes.withColumn("rank",
      when(seed, lit(unit)).otherwise(lit(0L)))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.select(col("node").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("rank DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (restart + expr(s"($dampNum * coalesce(s, 0L)) DIV $dampDen"))
            .as("rank"))
    }
    ranks
  }

  /** The DuckDB twin of [[personalizedPageRank]]. `edgesCte` must define
    * `e(src, dst)`; `seedWhere` is a predicate over the qualified node
    * column `n.node` (it is evaluated in scopes where a bare `node` is
    * ambiguous). */
  def personalizedPageRankSql(edgesCte: String, seedWhere: String,
      iterations: Int = 4, unit: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val base = (dampDen - dampNum) * unit / dampDen
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |    CAST(CASE WHEN $seedWhere THEN $base ELSE 0 END
         |      + ($dampNum * COALESCE(c.s, 0)) // $dampDen AS BIGINT) AS rank
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
       |r0 AS (SELECT n.node,
       |  CAST(CASE WHEN $seedWhere THEN $unit ELSE 0 END AS BIGINT) AS rank
       |  FROM n),
       |$iters
       |SELECT node, rank FROM r$iterations ORDER BY node""".stripMargin
  }

  /** Exact-integer modularity report of a community labelling over an
    * undirected graph. For canonical edges (a < b, distinct) with
    * m = |E|, community internal-edge count e_c, and degree sum d_c, the
    * per-community modularity contribution is
    * `q_c = e_c/m − (d_c/2m)²`; this emits the integer numerator
    * `4m²·q_c = 4·m·e_c − d_c²` (plus the raw counts), so the quality of
    * a clustering (label-prop communities, dedup clusters) is
    * oracle-checkable with zero floats. Plan: two node-keyed equi-joins
    * (edge endpoints → labels) + two map-side-combined aggregations —
    * never wider than the edge list. */
  def modularityReport(edges: DataFrame, aCol: String, bCol: String,
      labels: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct().localCheckpoint()
    val m = canon.agg(count(lit(1)).as("m"))
    val la = labels.select(col("node").as("a"), col("label").as("la"))
    val lb = labels.select(col("node").as("b"), col("label").as("lb"))
    val eIn = canon.join(la, Seq("a")).join(lb, Seq("b"))
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
    val degs = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    degs.join(labels, Seq("node"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_sum"))
      .join(eIn, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"), col("m"),
        (lit(4L) * col("m") * coalesce(col("e_in"), lit(0L)) -
          col("d_sum") * col("d_sum")).as("q_num_x4m2"))
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

  /** Sampled truncated HARMONIC centrality (Boldi & Vigna 2014 — the
    * closeness variant that is well-defined on disconnected graphs):
    * h(v) = Σ over sampled roots r ≠ v of 1/d(r, v), distances truncated
    * at `rounds` hops, in exact integer micro-units (`unit DIV dist` —
    * non-negative, so both engines floor identically). Where betweenness
    * finds CONNECTOR nodes, harmonic finds nodes CLOSE TO EVERYTHING —
    * the "centrality of reach" triage for picking curriculum anchors.
    *
    * Plan shape: the Brandes forward pass without σ — per level one
    * frontier equi-join + one (root, node) anti-join dedup; state is only
    * (root, node, dist). Roots are a seed sample, so the keyed state is
    * |roots|-bounded per node, never all-pairs. Output:
    * (node, reached, harm_micro) for nodes within `rounds` hops of ≥ 1
    * root (root self-distances excluded). */
  def harmonicCentrality(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, rounds: Int, unit: Long = 1000000L): DataFrame = {
    require(rounds >= 1)
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val roots = e.select(col("src").as("node")).distinct().where(seed)
      .select(col("node").as("root"), col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = roots
    var visited = roots
    for (r <- 1 to rounds) {
      val f = frontier.select(col("root"), col("node").as("src"))
      val next = e.join(f, Seq("src"))
        .select(col("root"), col("dst").as("node")).distinct()
        .join(visited.select("root", "node"), Seq("root", "node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
        .localCheckpoint()
      frontier = next
      // union of already-checkpointed frames: lineage is one union deep,
      // so a per-round barrier here only spent an eager job (r14)
      visited = visited.unionAll(next)
    }
    visited.where(col("dist") > 0L)
      .groupBy("node")
      .agg(count(lit(1)).as("reached"),
        sum(expr(s"$unit DIV dist")).as("harm_micro"))
  }

  /** The DuckDB twin of [[harmonicCentrality]]: unrolled root-keyed BFS
    * levels with NOT EXISTS visited guards. `edgesCte` must end with a
    * SYMMETRIZED relation `e(src, dst)`; `seedWhere` is a predicate over
    * `node`. */
  def harmonicCentralitySql(edgesCte: String, seedWhere: String,
      rounds: Int, unit: Long = 1000000L): String = {
    val rs = (1 to rounds).map { i =>
      s"""f$i AS (SELECT DISTINCT p.root, e.dst AS node FROM e
         |  JOIN f${i - 1} p ON e.src = p.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v
         |    WHERE v.root = p.root AND v.node = e.dst)),
         |v$i AS (SELECT root, node, dist FROM v${i - 1}
         |  UNION ALL SELECT root, node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |n AS (SELECT DISTINCT src AS node FROM e),
       |f0 AS (SELECT node AS root, node FROM n WHERE $seedWhere),
       |v0 AS (SELECT root, node, CAST(0 AS BIGINT) AS dist FROM f0),
       |$rs
       |SELECT node, CAST(count(*) AS BIGINT) AS reached,
       |  CAST(SUM($unit // dist) AS BIGINT) AS harm_micro
       |FROM v$rounds WHERE dist > 0 GROUP BY node ORDER BY node""".stripMargin
  }

  /** Hop plot / reach curve (Palmer et al. KDD 2002's ANF question asked
    * exactly on a seed sample): for each sampled root, the cumulative
    * count of nodes within `hop` ≤ d for d = 0..`rounds` — the raw data
    * behind effective-diameter and neighborhood-growth estimates. Shares
    * [[harmonicCentrality]]'s BFS machinery (per level one frontier
    * equi-join + one (root, node) anti-join dedup; state (root, node,
    * dist) is |roots|-bounded per node, never all-pairs); the cumulative
    * step is a per-root window over ≤ rounds+1 rows, never the corpus.
    * Integer-only, so [[reachCurveSql]] unrolls identical levels.
    * Output: (root, hop, n_within) including hop 0 (the root itself).
    * The hop grid is SPARSE by design: a hop whose frontier adds no new
    * nodes emits no row (the curve has no plateau rows) — a consumer
    * joining on a dense 0..rounds grid must forward-fill n_within from
    * the prior emitted hop, not read missing hops as zero
    * ([[effectiveDiameter]] already consumes it this way). */
  def reachCurve(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val roots = e.select(col("src").as("node")).distinct().where(seed)
      .select(col("node").as("root"), col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = roots
    var visited = roots
    for (r <- 1 to rounds) {
      val f = frontier.select(col("root"), col("node").as("src"))
      val next = e.join(f, Seq("src"))
        .select(col("root"), col("dst").as("node")).distinct()
        .join(visited.select("root", "node"), Seq("root", "node"), "left_anti")
        .withColumn("dist", lit(r.toLong))
        .localCheckpoint()
      frontier = next
      // union of already-checkpointed frames: lineage is one union deep,
      // so a per-round barrier here only spent an eager job (r14)
      visited = visited.unionAll(next)
    }
    // per-(root, dist) counts, then the cumulative reach per root: the
    // window partitions by root over ≤ rounds+1 rows — bounded, never a
    // global window (the sort key set is the hop index)
    visited.groupBy(col("root"), col("dist").as("hop"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_within", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("root")
          .orderBy("hop")))
      .select(col("root"), col("hop"), col("n_within"))
  }

  /** DuckDB twin of [[reachCurve]]: unrolled root-keyed BFS levels (the
    * [[harmonicCentralitySql]] CTE family) + a per-root cumulative window.
    * `edgesCte` must end with a SYMMETRIZED relation `e(src, dst)`. */
  def reachCurveSql(edgesCte: String, seedWhere: String,
      rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""f$i AS (SELECT DISTINCT p.root, e.dst AS node FROM e
         |  JOIN f${i - 1} p ON e.src = p.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} v
         |    WHERE v.root = p.root AND v.node = e.dst)),
         |v$i AS (SELECT root, node, dist FROM v${i - 1}
         |  UNION ALL SELECT root, node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |n AS (SELECT DISTINCT src AS node FROM e),
       |f0 AS (SELECT node AS root, node FROM n WHERE $seedWhere),
       |v0 AS (SELECT root, node, CAST(0 AS BIGINT) AS dist FROM f0),
       |$rs,
       |pc AS (SELECT root, dist AS hop, CAST(count(*) AS BIGINT) AS c
       |  FROM v$rounds GROUP BY 1, 2)
       |SELECT root, hop,
       |  CAST(SUM(c) OVER (PARTITION BY root ORDER BY hop) AS BIGINT)
       |    AS n_within
       |FROM pc ORDER BY root, hop""".stripMargin
  }

  /** Wedge census + 4-cycle counts (the quadrilateral sibling of
    * [[triangleCounts]]): for every unordered endpoint pair (a, c) the
    * number of 2-paths a–m–c (`wedges`), the 4-cycles through that pair
    * C(wedges, 2) — each 4-cycle has two diagonal pairs, so the graph
    * total is Σ C(w,2)/2 (always even; integer division exact) — and the
    * graph total alongside (1-row broadcast). Bipartite-ish co-visit
    * structure shows up as 4-cycles where triangles are absent, which is
    * why both censuses matter for community triage.
    *
    * Plan: ONE equi-join of the symmetrized edge list on the middle node
    * (Σ deg² fan-out, the [[triangleCounts]] bound — orient by degree at
    * extreme scale), one map-side-combined (a, c) aggregation, one 1-row
    * total. Integer-only; the twin unrolls identically. Output:
    * (a, c, wedges, c4_pair, c4_total). */
  def fourCycles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val left = e.select(col("src").as("a"), col("dst").as("m"))
    val right = e.select(col("src").as("m"), col("dst").as("c"))
    val wc = left.join(right, Seq("m")).where(col("a") < col("c"))
      .groupBy("a", "c").agg(count(lit(1)).as("wedges"))
      .withColumn("c4_pair", expr("wedges * (wedges - 1) DIV 2"))
    val tot = wc.agg(sum(col("c4_pair")).as("s"))
      .select(expr("s DIV 2").as("c4_total"))
    wc.crossJoin(broadcast(tot)) // 1-row side
      .select(col("a"), col("c"), col("wedges"), col("c4_pair"),
        col("c4_total"))
  }

  /** DuckDB twin of [[fourCycles]]. `edgesCte` must end with a
    * SYMMETRIZED relation `e(src, dst)`. */
  def fourCyclesSql(edgesCte: String): String =
    s"""WITH $edgesCte,
       |w AS (SELECT l.src AS a, r.dst AS c FROM e l
       |  JOIN e r ON r.src = l.dst WHERE l.src < r.dst),
       |wc AS (SELECT a, c, CAST(count(*) AS BIGINT) AS wedges
       |  FROM w GROUP BY 1, 2),
       |wp AS (SELECT a, c, wedges,
       |    CAST(wedges * (wedges - 1) // 2 AS BIGINT) AS c4_pair FROM wc),
       |t AS (SELECT CAST(SUM(c4_pair) // 2 AS BIGINT) AS c4_total FROM wp)
       |SELECT a, c, wedges, c4_pair, c4_total FROM wp CROSS JOIN t""".stripMargin

  /** Conductance per community (the standard community-QUALITY audit for
    * a labelling such as [[labelPropagation]]'s):
    * φ(S) = cut(S) / min(vol(S), vol(V∖S)) — crossing edges over the
    * smaller side's degree volume, in integer micros (exact longs, one
    * integer division; NULL when a community swallows the whole volume).
    * `labels` is (node, label). Plan: one degree aggregate, two
    * label-attach equi-joins on the edge endpoints, per-label
    * map-side-combined aggregates, a 1-row total broadcast — linear in
    * edges. Output: (community, n_nodes, vol, cut, phi_micro). */
  def conductance(edges: DataFrame, aCol: String, bCol: String,
      labels: DataFrame): DataFrame = {
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val vol = labels.join(deg, Seq("node")).groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("vol"))
    val tot = vol.agg(sum(col("vol")).as("voltot"))
    val la = labels.select(col("node").as("src"), col("label").as("la"))
    val lb = labels.select(col("node").as("dst"), col("label").as("lb"))
    // each undirected crossing edge has exactly ONE symmetrized copy with
    // src inside S, so the per-label count IS the cut — no halving
    val cut = e.join(la, Seq("src")).join(lb, Seq("dst"))
      .where(col("la") =!= col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("cut"))
    vol.join(cut, Seq("label"), "left")
      .withColumn("cut", coalesce(col("cut"), lit(0L)))
      .crossJoin(broadcast(tot)) // 1-row side
      .select(col("label").as("community"), col("n_nodes"), col("vol"),
        col("cut"),
        expr("CASE WHEN least(vol, voltot - vol) > 0 THEN " +
          "(1000000 * cut) DIV least(vol, voltot - vol) END").as("phi_micro"))
  }

  /** Degree-correlation curve knn(k) (Pastor-Satorras et al. 2001 — the
    * disaggregated view whose single-number summary is
    * [[degreeProfile]]-fed assortativity): for each degree class k, the
    * mean over degree-k nodes of their mean neighbor degree. Rising
    * knn(k) = assortative (hubs link hubs), falling = disassortative.
    * Integer micro discipline: per node `1e6·Σ nbr_deg DIV deg` (exact,
    * non-negative), per class one more integer mean — both engines
    * replay bit-for-bit. Plan: one degree aggregate, one equi-join of
    * the edge list onto it, two map-side-combined aggregations — linear
    * in edges at any scale. Output: (deg, n_nodes, knn_micro). */
  def knnDegree(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val perNode = e
      .join(deg.select(col("src").as("dst"), col("deg").as("nd")), Seq("dst"))
      .groupBy("src").agg(sum(col("nd")).as("snd"))
      .join(deg, Seq("src"))
      .select(col("deg"), expr("(1000000 * snd) DIV deg").as("mnd_micro"))
    perNode.groupBy("deg")
      .agg(count(lit(1)).as("n_nodes"), sum(col("mnd_micro")).as("sm"))
      .select(col("deg"), col("n_nodes"),
        expr("sm DIV n_nodes").as("knn_micro"))
  }

  /** DuckDB twin of [[knnDegree]]. `edgesCte` must end with a
    * SYMMETRIZED relation `e(src, dst)`. */
  def knnDegreeSql(edgesCte: String): String =
    s"""WITH $edgesCte,
       |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |pn AS (SELECT e.src, CAST((1000000 * SUM(d2.deg)) // MAX(d1.deg)
       |      AS BIGINT) AS mnd_micro, MAX(d1.deg) AS deg
       |  FROM e JOIN dg d1 ON d1.src = e.src JOIN dg d2 ON d2.src = e.dst
       |  GROUP BY e.src)
       |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(mnd_micro) // count(*) AS BIGINT) AS knn_micro
       |FROM pn GROUP BY deg ORDER BY deg""".stripMargin

  /** Truncated eccentricity and 90%-effective diameter per sampled root,
    * derived from [[reachCurve]] (the classic hop-plot reading: the
    * smallest hop covering ≥ `permille`/1000 of everything the root ever
    * reaches within `rounds`). `ecc_hop` is the truncated eccentricity —
    * a LOWER bound on the true one when the frontier is still growing at
    * the last round. Integer-only; the twin is [[effectiveDiameterSql]].
    * Output: (root, reached, ecc_hop, eff_hop). */
  def effectiveDiameter(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, rounds: Int, permille: Int = 900): DataFrame = {
    val rc = reachCurve(edges, aCol, bCol, seed, rounds)
    val tot = rc.groupBy("root")
      .agg(max("n_within").as("reached"), max("hop").as("ecc_hop"))
    val eff = rc.join(tot, Seq("root"))
      .where(col("n_within") * 1000 >= col("reached") * permille)
      .groupBy("root").agg(min("hop").as("eff_hop"))
    tot.join(eff, Seq("root"))
      .select(col("root"), col("reached"), col("ecc_hop"), col("eff_hop"))
  }

  /** DuckDB twin of [[effectiveDiameter]]: [[reachCurveSql]] as a CTE +
    * the same max/threshold-min reading. */
  def effectiveDiameterSql(edgesCte: String, seedWhere: String, rounds: Int,
      permille: Int = 900): String = {
    s"""WITH rc AS (${reachCurveSql(edgesCte, seedWhere, rounds)}),
       |t AS (SELECT root, max(n_within) AS reached, max(hop) AS ecc_hop
       |  FROM rc GROUP BY root),
       |e AS (SELECT rc.root, min(hop) AS eff_hop FROM rc
       |  JOIN t ON t.root = rc.root
       |  WHERE rc.n_within * 1000 >= t.reached * $permille
       |  GROUP BY rc.root)
       |SELECT t.root, reached, ecc_hop, eff_hop FROM t
       |JOIN e ON e.root = t.root ORDER BY t.root""".stripMargin
  }

  /** Deterministic random walks (the node2vec/DeepWalk corpus-generation
    * primitive): from each seed node, `steps` uniform-neighbor steps where
    * step t of walk w picks neighbor index
    * `fnv1a64(w || ':' || t) mod degree` — a hash-driven choice, so the
    * walk corpus is exactly reproducible by any engine (no RNG state,
    * the same argument as the MinHash permutations). Walks feed
    * skip-gram-style embedding training; this emits the walk corpus
    * itself: (walk_id, step, node).
    *
    * Plan shape: adjacency indexed once by a PER-NODE row_number window
    * (partitioned by src — bounded by max degree, never global) +
    * max-index degrees; each step is two equi-joins (current position ⋈
    * degree on node, then ⋈ adjacency on (node, idx)). State per step is
    * one row per live walk. Symmetrized edges mean degree ≥ 1 — walks
    * never hit a dead end. */
  def randomWalks(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, steps: Int): DataFrame = {
    require(steps >= 1)
    import org.apache.spark.sql.expressions.Window
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val adj = e.withColumn("idx",
        row_number().over(Window.partitionBy("src").orderBy("dst"))
          .cast("long"))
      .localCheckpoint()
    val deg = adj.groupBy("src").agg(max(col("idx")).as("deg"))
    val start = e.select(col("src").as("node")).distinct().where(seed)
      .select(col("node").as("walk_id"), lit(0L).as("step"), col("node"))
    var cur = start
    var acc = start
    for (t <- 1 to steps) {
      val c = cur.select(col("walk_id"), col("node").as("src"))
      val pick = c.join(deg, Seq("src"))
        .select(col("walk_id"), col("src"),
          (Sketches.positiveHash(encode(concat(
            col("walk_id").cast("string"), lit(s":$t")), "UTF-8"))
            % col("deg") + 1L).as("idx"))
      cur = pick.join(adj, Seq("src", "idx"))
        .select(col("walk_id"), lit(t.toLong).as("step"),
          col("dst").as("node"))
        .localCheckpoint()
      acc = acc.unionAll(cur)
    }
    acc
  }

  /** The DuckDB twin of [[randomWalks]]: the same indexed adjacency
    * (row_number per src ordered by dst) and unrolled hash-pick steps.
    * `edgesCte` must end with a SYMMETRIZED `e(src, dst)`; `seedWhere` is
    * a predicate over `node`; `posHashSql` renders the 63-bit positive
    * FNV-1a-64 of a VARCHAR SQL expression (supplied by the caller so the
    * hash definition lives in exactly one place per oracle). */
  def randomWalksSql(edgesCte: String, seedWhere: String, steps: Int,
      posHashSql: String => String): String =
    s"""WITH ${randomWalksCtes(edgesCte, seedWhere, steps, posHashSql)}
       |SELECT walk_id, step, node FROM wk ORDER BY walk_id, step""".stripMargin

  /** The [[randomWalksSql]] CTE chain alone, ending in the walk corpus
    * `wk(walk_id, step, node)` — shared by the corpus dump oracle and any
    * downstream consumer (skip-gram pair oracles) so the walk definition
    * can never drift between them. */
  def randomWalksCtes(edgesCte: String, seedWhere: String, steps: Int,
      posHashSql: String => String): String = {
    val ws = (1 to steps).map { t =>
      s"""p$t AS (SELECT c.walk_id, c.node AS src,
         |    ${posHashSql(s"CAST(c.walk_id AS VARCHAR) || ':$t'")}
         |      % d.deg + 1 AS idx
         |  FROM w${t - 1} c JOIN deg d ON d.src = c.node),
         |w$t AS (SELECT p.walk_id, CAST($t AS BIGINT) AS step, a.dst AS node
         |  FROM p$t p JOIN adj a ON a.src = p.src AND a.idx = p.idx)""".stripMargin
    }.mkString(",\n")
    val accAll = (0 to steps)
      .map(t => s"SELECT walk_id, step, node FROM w$t").mkString("\n  UNION ALL ")
    s"""$edgesCte,
       |adj AS (SELECT src, dst, CAST(row_number() OVER (
       |    PARTITION BY src ORDER BY dst) AS BIGINT) AS idx FROM e),
       |deg AS (SELECT src, CAST(max(idx) AS BIGINT) AS deg FROM adj GROUP BY src),
       |n AS (SELECT DISTINCT src AS node FROM e),
       |w0 AS (SELECT node AS walk_id, CAST(0 AS BIGINT) AS step, node FROM n
       |  WHERE $seedWhere),
       |$ws,
       |wk AS ($accAll)""".stripMargin
  }

  /** Skip-gram (center, context) pair corpus from a walk corpus — the
    * DeepWalk/node2vec step between walk generation and embedding
    * training (Perozzi et al. KDD 2014): within each walk, every ordered
    * pair of positions at step distance 1..`window` (self-pairs dropped)
    * becomes a training pair.
    *
    * Plan shape: ONE shuffle (groupBy walk_id) collects each walk into a
    * (steps+1)-element array, and pairs are generated array-locally with
    * indexed higher-order functions — no self-join of the corpus, no
    * quadratic blowup (each walk emits ≤ 2·window·steps pairs).
    * `collect_list` order is nondeterministic; the sort_array on
    * (step, node) restores it. */
  def walkSkipgramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1)
    walks.groupBy("walk_id")
      .agg(sort_array(collect_list(struct(col("step"), col("node")))).as("sq"))
      .select(explode(expr(
        s"""filter(flatten(transform(sq, (a, i) -> transform(sq, (b, j) ->
           |  IF(i <> j AND abs(i - j) <= $window AND a.node <> b.node,
           |     struct(a.node AS center, b.node AS context), NULL)))),
           |  x -> x IS NOT NULL)""".stripMargin)).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
  }

  /** node2vec SECOND-ORDER biased walks (Grover & Leskovec KDD 2016):
    * where [[randomWalks]] picks neighbors uniformly, each step here
    * weighs candidate `dst` by its relation to the PREVIOUS node —
    * `wReturn` when dst = prev (the 1/p return bias), `wCommon` when
    * (prev, dst) is an edge (BFS-ish stay-local), `wOut` otherwise
    * (DFS-ish explore; the 1/q bias). Integer weights, and the pick is
    * hash-driven over the cumulative-weight ladder in dst order —
    * bit-reproducible in any engine, same argument as [[randomWalks]].
    * Step 1 seeds prev = cur, so every candidate is a (prev, dst) edge
    * neighbor and the first hop is uniform — the node2vec convention.
    *
    * Plan shape per step: one equi-join onto the adjacency + one
    * left-join edge-existence probe against (prev, dst), then TWO
    * windows partitioned per walk (all candidates of a walk-step share
    * one cur, so partitions are degree-bounded, never global). State per
    * step is one (walk_id, prev, cur) row per live walk. */
  def node2vecWalks(edges: DataFrame, aCol: String, bCol: String,
      seed: Column, steps: Int, wReturn: Long = 3L, wCommon: Long = 6L,
      wOut: Long = 2L): DataFrame = {
    require(steps >= 1 && wReturn > 0 && wCommon > 0 && wOut > 0)
    import org.apache.spark.sql.expressions.Window
    val e = symmetrize(edges, aCol, bCol).localCheckpoint()
    val start = e.select(col("src").as("node")).distinct().where(seed)
      .select(col("node").as("walk_id"), col("node").as("prev"),
        col("node").as("cur"))
    var state = start
    var acc = start.select(col("walk_id"), lit(0L).as("step"),
      col("cur").as("node"))
    for (t <- 1 to steps) {
      val cand = state
        .join(e.select(col("src").as("cur"), col("dst")), "cur")
        .join(e.select(col("src").as("prev"), col("dst"),
          lit(1L).as("_pe")), Seq("prev", "dst"), "left")
        .select(col("walk_id"), col("prev"), col("cur"), col("dst"),
          when(col("dst") === col("prev"), lit(wReturn))
            .when(col("_pe").isNotNull, lit(wCommon))
            .otherwise(lit(wOut)).as("wgt"))
      val ladder = Window.partitionBy("walk_id").orderBy("dst")
      val whole = Window.partitionBy("walk_id")
      val picked = cand
        .withColumn("cum", sum(col("wgt")).over(ladder))
        .withColumn("tot", sum(col("wgt")).over(whole))
        .withColumn("r", Sketches.positiveHash(encode(concat(
          col("walk_id").cast("string"), lit(s":$t")), "UTF-8")) % col("tot"))
        .where(col("cum") - col("wgt") <= col("r") && col("r") < col("cum"))
        .select(col("walk_id"), col("cur").as("prev"), col("dst").as("cur"))
        .localCheckpoint()
      state = picked
      acc = acc.unionAll(picked.select(col("walk_id"),
        lit(t.toLong).as("step"), col("cur").as("node")))
    }
    acc
  }

  /** The DuckDB twin of [[node2vecWalks]]: unrolled per-step candidate →
    * cumulative-ladder → hash-pick CTEs over the same symmetrized
    * `e(src, dst)`. */
  def node2vecWalksSql(edgesCte: String, seedWhere: String, steps: Int,
      posHashSql: String => String, wReturn: Long = 3L, wCommon: Long = 6L,
      wOut: Long = 2L): String = {
    val sts = (1 to steps).map { t =>
      val r = s"${posHashSql(s"CAST(walk_id AS VARCHAR) || ':$t'")} % tot"
      s"""c$t AS (SELECT w.walk_id, w.cur, a.dst,
         |    CASE WHEN a.dst = w.prev THEN $wReturn
         |         WHEN pe.src IS NOT NULL THEN $wCommon
         |         ELSE $wOut END AS wgt
         |  FROM s${t - 1} w JOIN e a ON a.src = w.cur
         |  LEFT JOIN e pe ON pe.src = w.prev AND pe.dst = a.dst),
         |k$t AS (SELECT walk_id, cur, dst, wgt,
         |    CAST(SUM(wgt) OVER (PARTITION BY walk_id ORDER BY dst)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(wgt) OVER (PARTITION BY walk_id) AS BIGINT) AS tot
         |  FROM c$t),
         |s$t AS (SELECT walk_id, cur AS prev, dst AS cur FROM k$t
         |  WHERE cum - wgt <= $r AND $r < cum)""".stripMargin
    }.mkString(",\n")
    val accAll = (s"SELECT walk_id, CAST(0 AS BIGINT) AS step, cur AS node FROM s0" +:
      (1 to steps).map(t =>
        s"SELECT walk_id, CAST($t AS BIGINT) AS step, cur AS node FROM s$t"))
      .mkString("\n  UNION ALL ")
    s"""WITH $edgesCte,
       |n AS (SELECT DISTINCT src AS node FROM e),
       |s0 AS (SELECT node AS walk_id, node AS prev, node AS cur FROM n
       |  WHERE $seedWhere),
       |$sts,
       |wkk AS ($accAll)
       |SELECT walk_id, step, node FROM wkk ORDER BY walk_id, step""".stripMargin
  }
}
