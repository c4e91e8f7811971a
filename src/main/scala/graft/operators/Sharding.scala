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

  /** Domain-mixture rebalancing weights: per domain (language, source,
    * crawl…), the token share it actually holds and the sampling weight
    * that would equalize the mixture to a uniform target — the report a
    * training pipeline computes before setting per-domain sampling rates
    * (the mixture-weighting companion of [[stratifiedSample]], which then
    * applies `weight_micro`-derived rates).
    *
    * `weight_micro` = ⌊(total_tokens · 10⁶) / (n_domains · domain_tokens)⌋
    * in exact non-negative BIGINT arithmetic (cross-engine-safe DIV):
    * > 10⁶ means up-sample, < 10⁶ down-sample. Plan shape: one narrow
    * token-count projection, one groupBy(domain) with map-side combine,
    * then a 1-row global aggregate broadcast back onto the |domains|-row
    * result — the corpus is scanned once and never shuffled (the only
    * exchange carries one row per domain). */
  def mixtureWeights(df: DataFrame, domainCol: String, textCol: String): DataFrame = {
    val perDom = df
      .select(col(domainCol).as("domain"),
        expr(s"CAST(size(filter(split($textCol, ' '), x -> x <> '')) AS BIGINT)")
          .as("n_tok"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("domain_tokens"))
    val tot = perDom.agg(sum("domain_tokens").as("total_tokens"),
      count(lit(1)).as("n_domains"))
    perDom.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("domain_tokens"),
        TextOps.q6(col("domain_tokens").cast("double") /
          col("total_tokens").cast("double")).as("token_share"),
        expr("(total_tokens * 1000000) DIV (n_domains * domain_tokens)")
          .as("weight_micro"))
  }

  /** Iterative domain reweighting by multiplicative weights — the
    * Group-DRO update shape at the heart of DoReMi (Xie et al. 2023,
    * arXiv:2305.10429): per round, each domain's weight multiplies up by
    * how far it falls SHORT of its target share under the current
    * weights (and down where it overshoots), then shares are re-derived
    * from the reweighted token masses. Here the per-round "excess" is
    * the target-minus-actual share deviation (so the fixpoint is the
    * target mixture); in a full DoReMi the same slot takes the measured
    * per-domain excess LOSS of a proxy model — the update, the
    * normalization, and the plan shape are identical, which is what this
    * operator demonstrates at scale.
    *
    * All arithmetic is non-negative BIGINT with truncating division
    * (milli shares, micro weights): the multiplier is computed as
    * `(2·10⁶ + excess·η) DIV 10³ − 10³` so the dividend stays
    * non-negative even when the excess is (bounded) negative — Spark DIV
    * and DuckDB `//` agree, and the twin replays every round.
    *
    * Plan shape: ONE corpus scan (narrow token-count projection +
    * map-side-combining groupBy(domain)); every round thereafter runs on
    * the |domains|-row table with a 1-row broadcast total — iteration
    * cost is independent of corpus size. Output per domain: token mass,
    * starting/final milli share, final normalized micro weight. */
  def domainBalance(df: DataFrame, domainCol: String, textCol: String,
      rounds: Int = 4, etaMilli: Long = 500L,
      targetMilliFor: Option[DataFrame] = None): DataFrame = {
    require(rounds >= 1 && etaMilli >= 0 && etaMilli <= 999)
    val perDom = df
      .select(col(domainCol).as("domain"),
        expr(s"CAST(size(filter(split($textCol, ' '), x -> x <> '')) AS BIGINT)")
          .as("n_tok"))
      .groupBy("domain").agg(sum("n_tok").as("domain_tokens"))
      .localCheckpoint() // one corpus scan; rounds iterate on |domains| rows
    val withTarget = targetMilliFor match {
      case Some(t) => perDom.join(t, Seq("domain")) // (domain, target_milli)
      case None =>
        val nd = broadcast(perDom.agg(count(lit(1)).as("n_domains")))
        perDom.crossJoin(nd)
          .withColumn("target_milli", expr("1000 DIV n_domains"))
          .drop("n_domains")
    }
    def shares(w: DataFrame): DataFrame = {
      val tot = broadcast(w.agg(sum(expr("weight * domain_tokens")).as("mass")))
      w.crossJoin(tot)
        .withColumn("share_milli",
          expr("(weight * domain_tokens * 1000) DIV mass"))
        .drop("mass")
    }
    var cur = shares(withTarget.withColumn("weight", lit(1000000L)))
      .withColumn("share0_milli", col("share_milli"))
    for (_ <- 1 to rounds) {
      val stepped = cur.withColumn("weight",
        expr(s"(weight * ((2000000 + (target_milli - share_milli) * $etaMilli)" +
          " DIV 1000 - 1000)) DIV 1000"))
      cur = shares(stepped.drop("share_milli")).localCheckpoint()
    }
    val wTot = broadcast(cur.agg(sum("weight").as("w_total")))
    cur.crossJoin(wTot)
      .select(col("domain"), col("domain_tokens"), col("target_milli"),
        col("share0_milli"), col("share_milli").as("share_final_milli"),
        expr("(weight * 1000000) DIV w_total").as("weight_micro"))
  }

  /** The DuckDB twin of [[domainBalance]] (uniform target): unrolled
    * rounds over the domain table. `docsRel` must expose
    * (domain, text). */
  def domainBalanceSql(docsRel: String, rounds: Int = 4,
      etaMilli: Long = 500L): String = {
    val iters = (1 to rounds).map { i =>
      s"""w$i AS (SELECT domain, domain_tokens, target_milli, share0_milli,
         |    (weight * ((2000000 + (target_milli - share_milli) * $etaMilli)
         |      // 1000 - 1000)) // 1000 AS weight
         |  FROM s${i - 1}),
         |s$i AS (SELECT w.*, (w.weight * w.domain_tokens * 1000)
         |      // (SELECT SUM(weight * domain_tokens) FROM w$i) AS share_milli
         |  FROM w$i w)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT domain,
       |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
       |      AS BIGINT) AS domain_tokens
       |  FROM ($docsRel) GROUP BY 1),
       |t AS (SELECT d.*, 1000 // (SELECT count(*) FROM d) AS target_milli
       |  FROM d),
       |w0 AS (SELECT domain, domain_tokens, target_milli,
       |    CAST(1000000 AS BIGINT) AS weight FROM t),
       |s0p AS (SELECT w.*, (w.weight * w.domain_tokens * 1000)
       |    // (SELECT SUM(weight * domain_tokens) FROM w0) AS share_milli
       |  FROM w0 w),
       |s0 AS (SELECT *, share_milli AS share0_milli FROM s0p),
       |$iters
       |SELECT domain, domain_tokens, CAST(target_milli AS BIGINT) AS target_milli,
       |  CAST(share0_milli AS BIGINT) AS share0_milli,
       |  CAST(share_milli AS BIGINT) AS share_final_milli,
       |  CAST((weight * 1000000) // (SELECT SUM(weight) FROM w$rounds)
       |    AS BIGINT) AS weight_micro
       |FROM s$rounds ORDER BY domain""".stripMargin
  }

  /** Temperature-scaled mixture weights (α = 0.5): sampling probability
    * ∝ p_domain^α — the multilingual up-sampling rule (XLM-R, Conneau
    * et al. 2020, arXiv:1911.02116 §3) that flattens the domain
    * distribution without inverting it ([[mixtureWeights]] is the α → 0
    * uniform-target limit). With α = 1/2 the share p = tok/N cancels:
    * q_l = √tok_l / Σ√tok_k. Each √ rounds to integer MILLI units per
    * term before the sum (IEEE sqrt is correctly rounded in both
    * engines; summing raw doubles would be order-dependent), so weights
    * and expected counts are engine-exact integers. One token-count
    * aggregation; the domain table is metadata-scale. */
  def temperatureMix(df: DataFrame, domainCol: String, textCol: String,
      sampleN: Long = 1000L): DataFrame = {
    val toks = df
      .select(col(domainCol).as("domain"),
        expr(s"CAST(size(filter(split($textCol, ' '), x -> x <> '')) AS BIGINT)")
          .as("n_tok"))
      .groupBy("domain").agg(sum("n_tok").as("n_tokens"))
      .withColumn("s_milli",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1000.0) + lit(0.5))
          .cast("long"))
    val tot = toks.agg(sum("s_milli").as("s_total"))
    toks.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_tokens"), col("s_milli"),
        expr("s_milli * 1000000 DIV s_total").as("weight_micro"),
        expr(s"(s_milli * 1000000 DIV s_total) * $sampleN DIV 1000000")
          .as("expected_docs"))
  }

  /** Embedding-space eval-set decontamination: flag every train vector
    * whose cosine to ANY eval vector reaches `tau` — the semantic
    * complement of the n-gram-overlap gate ([[Dedup.decontaminate]]):
    * paraphrased or re-templated benchmark items share no shingle but sit
    * next to the eval item in embedding space. Eval sets are small by
    * nature, so the eval side BROADCASTS and the train corpus streams
    * through one linear scoring pass — a deliberate broadcast-nested-loop
    * (|eval| × |train| with tiny |eval|), never a corpus shuffle; cosines
    * are 6-dp-quantized before the threshold so the flag set is
    * engine-exact. Returns only flagged rows:
    * (id, n_eval_hits, max_cosine). */
  def decontaminateSemantic(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.functions.GraftFunctions.cosine_similarity
    val t = train.select(col(idCol), col(vecCol).as("_t_vec"))
    val e = eval.select(col(idCol).as("_eval_id"), col(vecCol).as("_e_vec"))
    t.crossJoin(broadcast(e))
      .where(col(idCol) =!= col("_eval_id"))
      .withColumn("_cos", TextOps.q6(cosine_similarity(col("_t_vec"), col("_e_vec"))))
      .where(col("_cos") >= tau)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("_cos")).as("max_cosine"))
  }

  /** Diversity-aware curation sampling: keep the `k` best rows (by
    * `scoreCol`, ties to the lower id) within every `cellCol` group — the
    * coverage-sampling step of a curation pipeline: with cells from a
    * coarse quantizer over embeddings (e.g. [[Similarity.ivfAssign]]),
    * "top quality per cell" keeps the corpus topically diverse instead of
    * letting one dominant mode fill the whole quality budget (the k-center
    * idea, bucketed).
    *
    * One shuffle on the cell key, window PARTITIONED by cell — per-cell
    * work is independent and bounded, so the plan scales out with cell
    * count at any corpus size. */
  def diversitySample(df: DataFrame, cellCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(cellCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Curriculum ordering: a dense GLOBAL position for every row under the
    * total order `(scoreCol asc, idCol asc)` — the easy-to-hard training
    * schedule (curriculum learning), and more generally a distributed
    * global sort-rank.
    *
    * Never a global single-partition window: `scoreCol` (expected in
    * [0,1], e.g. a quality score) is cut into `nBuckets` value-derived
    * coarse buckets (`floor(score·nBuckets)`, clamped — deterministic
    * across runs/retries); phase 1 collects per-bucket counts (≤
    * `nBuckets` rows) and scans them into per-bucket base positions on
    * the driver; phase 2 broadcast-joins the base table and ranks
    * PARTITIONED by bucket. Bucket id is monotone in score, so
    * bucket-major + in-bucket order IS the global order — the result is
    * bit-identical to `row_number() OVER (ORDER BY score, id) − 1` at any
    * corpus size, with per-bucket work independent and bounded. */
  def curriculumRank(df: DataFrame, scoreCol: String, idCol: String,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val b = least(greatest(floor(col(scoreCol) * nBuckets).cast("long"),
      lit(0L)), lit((nBuckets - 1).toLong))
    val bucketed = df.withColumn("_bkt", b)
    // phase 1: per-bucket counts, scanned into base positions on the driver
    val perBucket = bucketed.groupBy("_bkt").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = perBucket.map { case (k, n) =>
      val base = (k, acc); acc += n; base
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val baseDf = bases.toDF("_bkt", "_base")
    // phase 2: bucket-local rank + broadcast base
    val w = Window.partitionBy("_bkt")
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    bucketed.join(broadcast(baseDf), Seq("_bkt"))
      .withColumn("curriculum_pos",
        row_number().over(w).cast("long") - 1L + col("_base"))
      .drop("_bkt", "_base")
  }

  /** Token-budget pack manifest: documents in ascending `idCol` order are
    * assigned to consecutive packs of ~`budget` tokens — the
    * sequence-packing shard plan for pretraining data. A document's pack
    * is where its FIRST token lands (`(cumulative_before) div budget`), so
    * the assignment is a pure prefix sum over the global id order.
    *
    * Computed as a DISTRIBUTED two-phase prefix sum (the same shape
    * `WalrusLog.appendDF` uses for offset assignment), never a global
    * single-partition window: ids are cut into ≤ `targetRanges`
    * order-contiguous coarse ranges (`(id − min) div width` — value-derived,
    * so boundaries are deterministic across runs/retries); phase 1 collects
    * the per-range token totals (≤ `targetRanges` rows) and scans them into
    * per-range base offsets on the driver; phase 2 broadcast-joins the base
    * table and runs the cumulative window PARTITIONED by range. Every range
    * sums independently, so the plan scales out to any corpus size; the
    * result is bit-identical to the single global window for any
    * `targetRanges`. Output: (id, n_tokens, pack_id, pack_pos = offset of
    * the document's first token inside its pack). */
  def packManifest(df: DataFrame, idCol: String, textCol: String,
      budget: Long, targetRanges: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    tokenOffsets(df, idCol, textCol, targetRanges)
      .select(col(idCol), col("n_tokens"),
        expr(s"start_tok DIV $budget").as("pack_id"),
        (col("start_tok") % budget).as("pack_pos"))
  }

  /** Global concat offsets shared by [[packManifest]] and [[chunkSpans]]:
    * (id, n_tokens, start_tok) where `start_tok` is the total token count
    * of all earlier documents in ascending `idCol` order — a DISTRIBUTED
    * two-phase prefix sum (phase 0: id bounds → deterministic
    * value-derived coarse ranges; phase 1: per-range totals scanned into
    * base offsets on the driver, ≤ `targetRanges` rows; phase 2:
    * range-partitioned cumulative window + broadcast bases), never a
    * global single-partition window. Bit-identical to the global window
    * for any `targetRanges`. */
  private def tokenOffsets(df: DataFrame, idCol: String, textCol: String,
      targetRanges: Int): DataFrame = {
    require(targetRanges > 0, "targetRanges must be positive")
    val tokens = df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    // phase 0: id bounds (one tiny agg) -> deterministic range width
    val bounds = tokens
      .agg(min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    if (bounds.isNullAt(0))
      return tokens.where(lit(false)).withColumn("start_tok", lit(0L))
    val minId = bounds.getLong(0)
    val span = bounds.getLong(1) - minId + 1
    val width = math.max(1L, (span + targetRanges - 1) / targetRanges)
    val ranged = tokens.withColumn("rng",
      expr(s"(CAST(`$idCol` AS BIGINT) - ${minId}L) DIV ${width}L"))
    // phase 1: per-range totals, scanned into base offsets on the driver
    val perRange = ranged.groupBy("rng").agg(sum("n_tokens").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = perRange.map { case (rng, tot) =>
      val b = (rng, acc); acc += tot; b
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val baseDf = bases.toDF("rng", "base")
    // phase 2: range-local cumulative window + broadcast base
    val w = Window.partitionBy("rng").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(baseDf), Seq("rng"))
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) + col("base") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("start_tok"))
  }

  /** Concat-and-chunk sequence composition: the corpus is conceptually
    * concatenated in ascending `idCol` order and cut into fixed
    * `chunkTokens` context windows (the packing most pretraining loaders
    * actually run — documents SPLIT across chunk boundaries, nothing is
    * padded). Emits one row per (document, chunk) overlap:
    * (chunk_id, id, n_tokens, start_tok, tok_in_chunk).
    *
    * Built on the same two-phase distributed prefix sum as
    * [[packManifest]]; the chunk fan-out generates per-row from an exact
    * integer `sequence(first_chunk, last_chunk)` explode — a document adds
    * rows only for chunks it overlaps (total rows = docs + boundary
    * crossings ≈ docs + total_tokens/chunkTokens), never a join, so the
    * manifest scales linearly with the corpus at any chunk size. */
  def chunkSpans(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Long, targetRanges: Int = 256): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    tokenOffsets(df, idCol, textCol, targetRanges)
      .where(col("n_tokens") > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"start_tok DIV ${chunkTokens}L"),
        expr(s"(start_tok + n_tokens - 1) DIV ${chunkTokens}L"))))
      .select(col("chunk_id"), col(idCol), col("n_tokens"), col("start_tok"),
        (least(col("start_tok") + col("n_tokens"),
            (col("chunk_id") + lit(1L)) * chunkTokens) -
          greatest(col("start_tok"), col("chunk_id") * chunkTokens))
          .as("tok_in_chunk"))
  }

  /** Deterministic weighted systematic (PPS) sampling: documents in
    * ascending `idCol` order occupy the cumulative-weight interval
    * `[cum_before, cum_before + weight)`, and a document is selected iff
    * its interval contains a multiple of `period` — so inclusion is exact,
    * reproducible, and proportional to weight (P = weight/period for
    * weight < period; weight ≥ period ⇒ always selected, possibly for
    * multiple ticks, reported in `n_ticks`). This is the resampling half
    * of importance resampling (pair with
    * [[TextAnalysis.dsirWeights]]) done WITHOUT randomness: a re-run, a
    * retried task, or a different cluster size selects the identical
    * sample.
    *
    * The cumulative sum is the same two-phase per-range prefix sum as
    * [[packManifest]] (value-derived contiguous id ranges → per-range
    * totals scanned on the driver → range-partitioned cumulative window +
    * broadcast bases), so nothing global ever sits in one task. Output:
    * (id, weight, first_tick, n_ticks) for selected docs only. */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
      period: Long, targetRanges: Int = 256): DataFrame = {
    require(period > 0, "period must be positive")
    require(targetRanges > 0, "targetRanges must be positive")
    // non-positive weight = empty cumulative interval = never selected;
    // dropping those rows up front also keeps every division operand
    // non-negative (Spark DIV truncates toward zero, floor-division
    // engines like DuckDB round down — they only agree on non-negatives,
    // and (cum_incl - 1) would go to -1 for a zero-weight head row)
    val weighted = df.select(col(idCol), col(weightCol).cast("long").as("weight"))
      .where(col("weight") > 0)
    val empty = weighted.where(lit(false))
      .select(col(idCol), col("weight"),
        lit(0L).as("first_tick"), lit(0L).as("n_ticks"))
    val bounds = weighted
      .agg(min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    if (bounds.isNullAt(0)) return empty
    val minId = bounds.getLong(0)
    val span = bounds.getLong(1) - minId + 1
    val width = math.max(1L, (span + targetRanges - 1) / targetRanges)
    val ranged = weighted.withColumn("rng",
      expr(s"(CAST(`$idCol` AS BIGINT) - ${minId}L) DIV ${width}L"))
    val perRange = ranged.groupBy("rng").agg(sum("weight").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = perRange.map { case (rng, tot) =>
      val b = (rng, acc); acc += tot; b
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val baseDf = bases.toDF("rng", "base")
    val w = Window.partitionBy("rng").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(baseDf), Seq("rng"))
      .withColumn("cum_incl", sum(col("weight")).over(w) + col("base"))
      .withColumn("cum_before", col("cum_incl") - col("weight"))
      // ticks m·period inside [cum_before, cum_incl):
      //   ceil(cum_before/period) .. floor((cum_incl-1)/period)
      .withColumn("first_tick", expr(s"(cum_before + ${period - 1}L) DIV ${period}L"))
      .withColumn("last_tick", expr(s"(cum_incl - 1L) DIV ${period}L"))
      .where(col("first_tick") <= col("last_tick"))
      .select(col(idCol), col("weight"), col("first_tick"),
        (col("last_tick") - col("first_tick") + 1L).as("n_ticks"))
  }

  /** Deterministic per-epoch global shuffle order: for each epoch `e`, the
    * corpus is visited in ascending `h_e = (a_e·(id mod P) + b_e) mod P`
    * order (ties by id) — a different, reproducible permutation per epoch,
    * which is how a pretraining loader re-shuffles 100 TB without ever
    * materializing a random permutation (same id → same position, across
    * runs, retries, and cluster sizes).
    *
    * The global position is computed with the same two-phase bucketed rank
    * as [[curriculumRank]]/[[packManifest]]: the hash's TOP bits cut the
    * epoch into `nBuckets` order-contiguous buckets (bucket id is monotone
    * in `h_e`, so per-bucket rank + driver-scanned bucket bases = exact
    * global rank), per-(epoch,bucket) counts are collected (≤
    * epochs·nBuckets tiny rows) and scanned into bases on the driver, and
    * the rank window is PARTITIONED by (epoch, bucket) — never a global
    * single-partition sort. Output: (epoch, id, pos). */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int = 3,
      nBuckets: Int = 64): DataFrame = {
    require(epochs >= 1 && epochs <= 64, "epochs out of range")
    require(nBuckets > 0, "nBuckets must be positive")
    val P = TextOps.P
    val bucketWidth = P / nBuckets + 1
    val hashed = TextOps.hashCoeffs(epochs).zipWithIndex.map { case ((a, b), e) =>
      df.select(lit(e).as("epoch"), col(idCol),
        TextOps.permHash(col(idCol).cast("long"), a, b).as("h"))
    }.reduce(_ unionAll _)
      .withColumn("_bkt", (col("h") / lit(bucketWidth)).cast("long"))
    // phase 1: per-(epoch,bucket) counts -> driver scan into rank bases
    val perBucket = hashed.groupBy("epoch", "_bkt")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    val bases = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var curEpoch = -1
    var acc = 0L
    perBucket.foreach { case ((e, bkt), n) =>
      if (e != curEpoch) { curEpoch = e; acc = 0L }
      bases += ((e, bkt, acc)); acc += n
    }
    val spark = df.sparkSession
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("epoch", "_bkt", "_base")
    // phase 2: bucket-local rank + broadcast base
    val w = Window.partitionBy("epoch", "_bkt")
      .orderBy(col("h").asc, col(idCol).asc)
    hashed.join(broadcast(baseDf), Seq("epoch", "_bkt"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L + col("_base"))
      .select(col("epoch").cast("long").as("epoch"), col(idCol), col("pos"))
  }

  /** Sequence-length bucketing + padding-waste accounting — the batch-shape
    * report a training pipeline runs before fixing its bucket boundaries.
    * Each document is assigned to the smallest power-of-two length bucket
    * ≥ its whitespace token count (floor `minBucket`, documents above
    * `maxBucket` are clamped into it — the truncation bucket); per bucket:
    * document count, real token total, padded token total (`bucket_len ·
    * n_docs` — what a fixed-shape batch actually allocates), and the waste
    * fraction q6((padded − real) / padded).
    *
    * Scale shape: one narrow projection computes the token count + bucket
    * (no explode — `size(split(...))` is per-row), then a map-side-
    * combinable groupBy over ≤ log₂(maxBucket) keys. No joins, no windows;
    * the output is bounded by the bucket count whatever the corpus size. */
  /** Smallest power-of-two bucket ≥ `nTok`, clamped to [minBucket,
    * maxBucket] — ONE definition shared by the batch report
    * ([[lengthBuckets]]) and the streaming twin (stream_length_buckets).
    * Integer-only chained comparisons, engine-exact. */
  def lengthBucketCol(nTok: org.apache.spark.sql.Column,
      minBucket: Int, maxBucket: Int): org.apache.spark.sql.Column = {
    require(minBucket > 0 && (minBucket & (minBucket - 1)) == 0 &&
      maxBucket >= minBucket && (maxBucket & (maxBucket - 1)) == 0,
      "buckets must be powers of two with minBucket <= maxBucket")
    val buckets = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    buckets.init.foldRight(lit(buckets.last.toLong)) {
      case (b, rest) => when(nTok <= b, lit(b.toLong)).otherwise(rest)
    }
  }

  def lengthBuckets(df: DataFrame, textCol: String,
      minBucket: Int = 16, maxBucket: Int = 1024): DataFrame = {
    val nTok = size(split(col(textCol), " ")).cast("long")
    df.select(nTok.as("n_tokens"),
        lengthBucketCol(nTok, minBucket, maxBucket).as("bucket_len"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("n_tokens"), col("bucket_len"))).as("real_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket_len"))
      .withColumn("waste_frac", TextOps.q6(
        (col("padded_tokens") - col("real_tokens")).cast("double") /
          col("padded_tokens").cast("double")))
  }

  /** UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    * spread a total token budget across groups so that no group exceeds
    * `maxEpochs` passes over its own data and the remainder is shared
    * EQUALLY — the published fix for temperature sampling's tail-language
    * over-epoching. Integer water-filling: the largest threshold T with
    * Σ min(cap_g, T) ≤ B, alloc_g = min(cap_g, T), found CLOSED-FORM on
    * one sorted prefix-sum window (for ascending caps the T-regime index
    * satisfies prev_cap ≤ (B − prefix) div (remaining) < cap, and that
    * bracket holds for exactly one row; no valid row means B covers every
    * cap). Budget is a rational `budgetNum/budgetDen` of the corpus total
    * so the whole computation stays in exact longs.
    *
    * Scale: ONE corpus aggregation to the |groups|-row capacity table,
    * then windows/joins on that table with 1-row broadcast totals — the
    * DoReMi shape (corpus touched once, decisions on metadata). Output:
    * (group, n_units, cap, alloc, epochs_milli). */
  def unimaxBudget(df: DataFrame, groupCol: String, unitsCol: String,
      budgetNum: Long, budgetDen: Long, maxEpochs: Long): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && maxEpochs > 0,
      "budget fraction and maxEpochs must be positive")
    val caps = df.groupBy(col(groupCol).as("g"))
      .agg(sum(col(unitsCol)).as("n_units"))
      .withColumn("cap", col("n_units") * maxEpochs)
    val tot = caps.agg(sum(col("n_units")).as("total"),
      count(lit(1)).as("ng"))
    val w = Window.orderBy(col("cap"), col("g"))
    val idx = caps.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("prefix", coalesce(
        sum(col("cap")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("prev_cap", coalesce(lag(col("cap"), 1).over(w), lit(0L)))
      .withColumn("b", expr(s"total * $budgetNum div $budgetDen"))
      .withColumn("t_cand",
        when(col("b") >= col("prefix"),
          expr("(b - prefix) div (ng - i + 1)")))
    val t = idx.agg(min(when(
      col("t_cand").isNotNull && col("t_cand") >= col("prev_cap") &&
        col("t_cand") < col("cap"), col("t_cand"))).as("t"))
    idx.crossJoin(broadcast(t))
      .withColumn("alloc",
        when(col("t").isNull, col("cap")).otherwise(least(col("cap"), col("t"))))
      .select(col("g").as(groupCol), col("n_units"), col("cap"),
        col("alloc"), expr("alloc * 1000 div n_units").as("epochs_milli"))
  }
}
