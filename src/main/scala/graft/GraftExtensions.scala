package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, Fnv1a64, MinHashSignature, PqCode, ProjectionDot, ShingleCodes, ShingleOverlap, Sq8Recon, WinnowFingerprints}

/** Session-extensions entry point: registers graft's native codegen'd
  * expressions as SQL functions at session build time, so a cluster can
  * enable the whole function surface with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver-side
  * `register()` call needed. (The imperative path,
  * [[graft.functions.GraftFunctions.register]], stays for notebook use.)
  *
  * This is extension preference path (b) of the build rules: native
  * expressions with `doGenCode`, injected through the public
  * `SparkSessionExtensions` API — no fork, no private internals.
  */
object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.graft.GraftSqlInternal

  /** `walrus_log(path[, topic[, namespace]])` — the log as a table-valued
    * function: a FROM-clause surface for ad-hoc SQL over any log root
    * (the DDL table path, log_sql_table, needs a catalog entry first).
    * Resolves to the V2 source's plan, so topic/column pruning reach the
    * vectorized reader exactly as on the DataFrame path. An empty-string
    * topic means "all topics" (so the namespace can be addressed
    * positionally without a filter). */
  private[graft] def walrusLogPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.nonEmpty && exprs.size <= 3,
      "walrus_log expects (path[, topic[, namespace]])")
    def str(i: Int, what: String): String = {
      val e = exprs(i)
      require(e.foldable && e.eval() != null,
        s"walrus_log: $what must be a constant string")
      String.valueOf(e.eval())
    }
    val spark = SparkSession.active
    var reader = spark.read.format("walruslog").option("path", str(0, "path"))
    if (exprs.size == 3) reader = reader.option("namespace", str(2, "namespace"))
    val base = reader.load()
    val topicFilter = if (exprs.size >= 2) Some(str(1, "topic")).filter(_.nonEmpty) else None
    val df = topicFilter.fold(base)(t => base.where(col("topic") === t))
    GraftSqlInternal.analyzedPlan(df)
  }

  /** `walrus_topics(path)` — the STATE surface (D4) as a table: one row
    * per topic with entry count, byte size, and segment accounting, read
    * from the log's driver-side catalog (metadata only, no data scan).
    *
    * SNAPSHOT-AT-PLAN semantics, by design: the catalog is materialized
    * into a LocalRelation when the SQL is analyzed, exactly like the
    * reference's STATE command returns a point-in-time JSON document
    * (controller/mod.rs:189-195) — a reused/cached plan keeps showing the
    * state from planning time; re-issue the query for fresh metadata. */
  private[graft] def walrusTopicsPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "walrus_topics expects (path)")
    require(exprs.head.foldable && exprs.head.eval() != null,
      "walrus_topics: path must be a constant string")
    val spark = SparkSession.active
    val log = new graft.log.WalrusLog(spark, String.valueOf(exprs.head.eval()))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val counts = log.entryCounts // one metadata pass, not one per topic
    val rows = log.topicNames.sorted.map { t =>
      val (curSeg, lastSealed) = log.segmentState(t)
      Row(t, counts.getOrElse(t, 0L), log.topicSize(t), curSeg, lastSealed)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("topic", StringType),
        StructField("entries", LongType), StructField("bytes", LongType),
        StructField("current_segment", LongType),
        StructField("last_sealed", LongType))))
    GraftSqlInternal.analyzedPlan(df)
  }

  /** `walrus_groups(path)` — consumer-group DESCRIBE as a table: one row
    * per persisted (group, topic) cursor with committed offset, topic end
    * offset, and lag. Same SNAPSHOT-AT-PLAN semantics as
    * [[walrusTopicsPlan]] (point-in-time document; re-issue for fresh
    * state). Metadata only — reads the cursor file, never data. */
  private[graft] def walrusGroupsPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "walrus_groups expects (path)")
    require(exprs.head.foldable && exprs.head.eval() != null,
      "walrus_groups: path must be a constant string")
    val spark = SparkSession.active
    val log = new graft.log.WalrusLog(spark, String.valueOf(exprs.head.eval()))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = log.consumerCursors.map { case (g, t, committed) =>
      val end = log.totalAppended(t)
      Row(g, t, committed, end, end - committed)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("grp", StringType),
        StructField("topic", StringType),
        StructField("committed", LongType),
        StructField("end_offset", LongType),
        StructField("lag_entries", LongType))))
    GraftSqlInternal.analyzedPlan(df)
  }

  /** `walrus_members(path, group, n_members)` — the per-MEMBER half of
    * Kafka's DESCRIBE GROUPS (topics play the partition role): the group's
    * cursor-bearing topics are dealt to `n_members` consumers with the
    * deterministic range assignor (the rebalance queries' assignment), one
    * row per (member, topic) with that cursor's committed/end/lag. Same
    * snapshot-at-plan, metadata-only semantics as [[walrusGroupsPlan]]. */
  private[graft] def walrusMembersPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 3, "walrus_members expects (path, group, n_members)")
    require(exprs.forall(e => e.foldable && e.eval() != null),
      "walrus_members: arguments must be constants")
    val spark = SparkSession.active
    val log = new graft.log.WalrusLog(spark, String.valueOf(exprs(0).eval()))
    val grp = String.valueOf(exprs(1).eval())
    val nMembers = String.valueOf(exprs(2).eval()).toInt
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cursors = log.consumerCursors.collect { case (g, t, c) if g == grp => (t, c) }
    val owner = graft.log.ConsumerAssignment.range(cursors.map(_._1), nMembers).toMap
    val rows = cursors.map { case (t, committed) =>
      val end = log.totalAppended(t)
      Row(s"member-${owner(t)}", t, committed, end, end - committed)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("member", StringType),
        StructField("topic", StringType),
        StructField("committed", LongType),
        StructField("end_offset", LongType),
        StructField("lag_entries", LongType))))
    GraftSqlInternal.analyzedPlan(df)
  }

  /** `walrus_commits(path)` — the commit log as a table (the Delta
    * `DESCRIBE HISTORY` analogue): one row per tracked commit with its
    * instant, aggregate row/byte footprint, epoch tag, and lifecycle
    * flags. Same snapshot-at-plan, metadata-only semantics as the other
    * admin TVFs. */
  private[graft] def walrusCommitsPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "walrus_commits expects (path)")
    require(exprs.head.foldable && exprs.head.eval() != null,
      "walrus_commits: path must be a constant string")
    val spark = SparkSession.active
    val log = new graft.log.WalrusLog(spark, String.valueOf(exprs.head.eval()))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = log.commitHistory.map {
      case (id, tsMs, nTopics, nRows, bytes, tag, nReplaces, vac, repl) =>
        Row(id, tsMs, nTopics.toLong, nRows, bytes, tag.orNull,
          nReplaces.toLong, vac, repl)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("commit_id", LongType),
        StructField("ts_ms", LongType),
        StructField("n_topics", LongType),
        StructField("n_rows", LongType),
        StructField("bytes", LongType),
        StructField("tag", StringType),
        StructField("n_replaces", LongType),
        StructField("vacuumed", BooleanType),
        StructField("replaced", BooleanType))))
    GraftSqlInternal.analyzedPlan(df)
  }

  /** `walrus_namespaces(root)` — the CLUSTER-level federation view: one
    * row per namespace under `root` (the multi-tenant layout where each
    * tenant/instance key owns a namespace dir) with topic / entry / byte /
    * consumer-group / commit totals read from each namespace's driver-side
    * catalog — the reference's cluster METRICS aggregated across buckets
    * (distributed-walrus/src/controller/mod.rs:278-282), here across
    * namespaces. Metadata only (commit records + cursor files; no data
    * scan) and snapshot-at-plan like the other admin TVFs. */
  private[graft] def walrusNamespacesPlan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "walrus_namespaces expects (root)")
    require(exprs.head.foldable && exprs.head.eval() != null,
      "walrus_namespaces: root must be a constant string")
    val spark = SparkSession.active
    val root = String.valueOf(exprs.head.eval())
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = graft.log.WalrusLog.namespacesUnder(root).map { ns =>
      val log = new graft.log.WalrusLog(spark, root, ns)
      val counts = log.entryCounts
      Row(ns, log.topicNames.size.toLong, counts.valuesIterator.sum,
        log.topicNames.map(log.topicSize).sum,
        log.consumerCursors.map(_._1).distinct.size.toLong,
        log.commitHistory.size.toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("namespace", StringType),
        StructField("topics", LongType), StructField("entries", LongType),
        StructField("bytes", LongType), StructField("groups", LongType),
        StructField("commits", LongType))))
    GraftSqlInternal.analyzedPlan(df)
  }

  /** Runtime registration of the TVFs on a live session (the extensions
    * path below covers sessions built with spark.sql.extensions). */
  def registerWalrusLogTvf(spark: SparkSession): Unit = {
    GraftSqlInternal.registerTableFunction(spark, "walrus_log", walrusLogPlan)
    GraftSqlInternal.registerTableFunction(spark, "walrus_topics", walrusTopicsPlan)
    GraftSqlInternal.registerTableFunction(spark, "walrus_groups", walrusGroupsPlan)
    GraftSqlInternal.registerTableFunction(spark, "walrus_members", walrusMembersPlan)
    GraftSqlInternal.registerTableFunction(spark, "walrus_commits", walrusCommitsPlan)
    GraftSqlInternal.registerTableFunction(spark, "walrus_namespaces", walrusNamespacesPlan)
  }

  /** Runtime registration of the manual bloom-filter function pair
    * (Spark's own runtime-filter expressions, surfaced to SQL): build a
    * filter with `bloom_filter_agg(xxhash64(key))` in a scalar subquery,
    * prune with `bloom_might_contain(bloom, xxhash64(key))`. No false
    * negatives, so an exact join downstream removes the false positives —
    * manual semi-join pruning for pipelines the optimizer's automatic
    * injection can't see. */
  def registerBloomFunctions(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("bloom_filter_agg",
      exprs => exprs.size match {
        case 1 => new BloomFilterAggregate(exprs.head)
        case 2 => new BloomFilterAggregate(exprs(0), exprs(1))
        case 3 => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        case n => throw new IllegalArgumentException(
          s"bloom_filter_agg expects 1-3 arguments (value[, estItems[, numBits]]), got $n")
      }, "built-in")
    registry.createOrReplaceTempFunction("bloom_might_contain",
      exprs => {
        require(exprs.size == 2,
          s"bloom_might_contain expects (bloom, value), got ${exprs.size} arguments")
        BloomFilterMightContain(exprs(0), exprs(1))
      }, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String): ExpressionInfo =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
        "", "", "", "", "", "", "")
    // Constant integer argument (k / plane / dims): fail with a clear
    // message on non-foldable or NULL input instead of an analysis-time
    // ClassCastException.
    def intArg(exprs: Seq[Expression], idx: Int, fn: String, what: String): Int = {
      val e = exprs(idx)
      if (!e.foldable)
        throw new IllegalArgumentException(s"$fn: $what must be a constant")
      e.eval() match {
        case null =>
          throw new IllegalArgumentException(s"$fn: $what must not be NULL")
        case n: Number => n.intValue()
        case other =>
          throw new IllegalArgumentException(
            s"$fn: $what must be an integer, got $other")
      }
    }
    ext.injectFunction((FunctionIdentifier("fnv1a64"),
      info("fnv1a64", "_FUNC_(bin) - FNV-1a 64-bit hash of a binary payload."),
      (exprs: Seq[Expression]) => Fnv1a64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "_FUNC_(a, b) - fused cosine similarity between float/double arrays."),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("shingle_codes"),
      info("shingle_codes",
        "_FUNC_(text, k) - base-128 k-shingle codes in one rolling pass."),
      (exprs: Seq[Expression]) => ShingleCodes(exprs.head,
        intArg(exprs, 1, "shingle_codes", "k"))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "_FUNC_(text, k, n) - n MinHash components of the k-shingle set in one pass."),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head,
        intArg(exprs, 1, "minhash_signature", "k"),
        intArg(exprs, 2, "minhash_signature", "numHashes"))))
    ext.injectFunction((FunctionIdentifier("shingle_overlap"),
      info("shingle_overlap",
        "_FUNC_(a, b, k) - struct(both, sz_a, sz_b) distinct k-shingle overlap stats."),
      (exprs: Seq[Expression]) => ShingleOverlap(exprs(0), exprs(1),
        intArg(exprs, 2, "shingle_overlap", "k"))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "_FUNC_(text, k, w, a, b) - distinct winnowed (MOSS) k-shingle fingerprint set."),
      (exprs: Seq[Expression]) => WinnowFingerprints(exprs.head,
        intArg(exprs, 1, "winnow_fingerprints", "k"),
        intArg(exprs, 2, "winnow_fingerprints", "w"),
        intArg(exprs, 3, "winnow_fingerprints", "a").toLong,
        intArg(exprs, 4, "winnow_fingerprints", "b").toLong)))
    ext.injectTableFunction((FunctionIdentifier("walrus_log"),
      info("walrus_log",
        "_FUNC_(path[, topic]) - a walrus log root as a table-valued FROM source."),
      GraftExtensions.walrusLogPlan _))
    ext.injectTableFunction((FunctionIdentifier("walrus_topics"),
      info("walrus_topics",
        "_FUNC_(path) - per-topic STATE (entries, bytes, segments) as a table."),
      GraftExtensions.walrusTopicsPlan _))
    ext.injectTableFunction((FunctionIdentifier("walrus_groups"),
      info("walrus_groups",
        "_FUNC_(path) - consumer-group cursors (committed, end, lag) as a table."),
      GraftExtensions.walrusGroupsPlan _))
    ext.injectTableFunction((FunctionIdentifier("walrus_members"),
      info("walrus_members",
        "_FUNC_(path, group, n_members) - per-member topic assignment + lag " +
          "of one consumer group (range assignor)."),
      GraftExtensions.walrusMembersPlan _))
    ext.injectTableFunction((FunctionIdentifier("walrus_commits"),
      info("walrus_commits",
        "_FUNC_(path) - the commit log as a table (DESCRIBE HISTORY): " +
          "instant, rows, bytes, tag, lifecycle flags per commit."),
      GraftExtensions.walrusCommitsPlan _))
    ext.injectTableFunction((FunctionIdentifier("walrus_namespaces"),
      info("walrus_namespaces",
        "_FUNC_(root) - cluster-level federation: per-namespace topic / " +
          "entry / byte / group / commit totals across one root."),
      GraftExtensions.walrusNamespacesPlan _))
    ext.injectFunction((FunctionIdentifier("pq_code"),
      info("pq_code",
        "_FUNC_(vec, subspaces, subCentroids, subDim, basePlane) - packed PQ code in one fused pass."),
      (exprs: Seq[Expression]) => PqCode(exprs.head,
        intArg(exprs, 1, "pq_code", "subspaces"),
        intArg(exprs, 2, "pq_code", "subCentroids"),
        intArg(exprs, 3, "pq_code", "subDim"),
        intArg(exprs, 4, "pq_code", "basePlane"))))
    ext.injectFunction((FunctionIdentifier("sq8_recon"),
      info("sq8_recon",
        "_FUNC_(vec, mn, mx) - struct(dot, norm_v, norm_r, err_sum) of the int8 scalar-quantization round trip."),
      (exprs: Seq[Expression]) => Sq8Recon(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("projection_dot"),
      info("projection_dot",
        "_FUNC_(vec, plane[, dims]) - dot with the deterministic projection vector."),
      (exprs: Seq[Expression]) => ProjectionDot(exprs.head,
        intArg(exprs, 1, "projection_dot", "plane"),
        if (exprs.size > 2) intArg(exprs, 2, "projection_dot", "dims") else 64)))
  }
}
