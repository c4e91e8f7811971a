package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * All semantics are pure `functions._` compositions (codegen'd, no UDFs)
  * with integer/regex primitives reproducible in ANSI SQL. */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Deliberately small, deterministic sets. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "los", "es"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren"))

  private def markerCount(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(text, lit(words.mkString("\\b(", "|", ")\\b")), lit(0)))

  /** Token statistics: whitespace tokens plus a BPE-ish subword estimate
    * (runs of ≤4 letters / digits / single punctuation — the classic
    * pre-tokenizer shape). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), " ")).as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9 ]"), lit(0))).as("subword_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, "Scaling
    * Language Models" repetition filters, adapted to an unpunctuated
    * corpus): per document, the fraction of word-bigram occurrences taken
    * by the single most frequent bigram, and the duplicate fraction of
    * 4-gram occurrences (1 − distinct/total) — the two signals that catch
    * boilerplate loops and degenerate repetition that plain length/ratio
    * quality scores miss. `keep` applies the filter thresholds.
    *
    * Plan shape: explode → one shuffle keyed (doc, gram) with map-side
    * combine → one (doc) aggregate; both fractions ride the same two
    * exchanges, so cost is O(tokens) at any corpus size. Quantized to
    * 6 dp with the q6 floor form (cross-engine exact). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      maxTopBigramFrac: Double = 0.20,
      maxDupFourgramFrac: Double = 0.15): DataFrame = {
    val toks = df
      .select(col(idCol),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("tk"))
      .where(size(col("tk")) >= 4)
    val bg = toks.select(col(idCol), explode(expr(
      "transform(sequence(1, size(tk) - 1), " +
        "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("g"))
    val bstat = bg.groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(col("c")).as("top2"), sum(col("c")).as("nbg"))
    val fg = toks.select(col(idCol), explode(expr(
      "transform(sequence(1, size(tk) - 3), " +
        "i -> concat_ws(' ', slice(tk, i, 4)))")).as("g4"))
    val fstat = fg.groupBy(col(idCol))
      .agg(countDistinct(col("g4")).as("nd4"), count(lit(1)).as("n4"))
    val topFrac = q6(col("top2").cast("double") / col("nbg").cast("double"))
    val dupFrac = q6(lit(1.0) -
      col("nd4").cast("double") / col("n4").cast("double"))
    toks.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
      .join(bstat, Seq(idCol)).join(fstat, Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        topFrac.as("top_bigram_frac"), dupFrac.as("dup_fourgram_frac"),
        (topFrac <= maxTopBigramFrac && dupFrac <= maxDupFourgramFrac)
          .as("keep"))
  }

  /** Per-document token-distribution statistics: Shannon entropy of the
    * unigram distribution in integer millinats plus the type-token ratio —
    * the pair of lexical-diversity signals that catches low-entropy
    * degenerate text (keyboard mash, repeated boilerplate) that length and
    * punctuation ratios miss.
    *
    * Entropy is computed order-proof across engines via the millinat
    * contract (NOTES lesson: ln only with per-term integer rounding before
    * summation): H·1000 ≈ round(ln N·1000) − (Σᵢ cᵢ·round(ln cᵢ·1000)) DIV N
    * — one ln + one round per DISTINCT token, every aggregate an exact
    * BIGINT sum, and the final division a non-negative integer DIV (the
    * cross-engine-safe regime). Plan shape: one shuffle keyed (doc, token)
    * with map-side combine, then one (doc) aggregate — O(tokens) at any
    * corpus size, no corpus-global state. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(expr(s"filter(split($textCol, ' '), x -> x <> '')")).as("tok"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * TextOps.milliLn(col("c").cast("double")))
          .as("_clnc"))
      .select(col(idCol),
        col("n_tokens"), col("n_types"),
        q6(col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (TextOps.milliLn(col("n_tokens").cast("double")) -
          expr("_clnc DIV n_tokens")).as("entropy_millinats"))
  }

  /** Quality scoring: length, word-shape, stopword and punctuation ratios,
    * combined into a deterministic [0,1] score (rounded to 6 dp). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val nWords = size(split(t, " ")).cast("double")
    val stop = markerCount(t, Seq("the", "and", "of", "to", "is", "a", "in", "that"))
      .cast("double")
    val nonAlnum = (length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))).cast("double")
    val meanWordLen = (nChars - (nWords - lit(1.0))) / nWords
    val stopRatio = stop / nWords
    val punctRatio = nonAlnum / nChars
    // Heuristic score: reward mid-length docs + stopword presence,
    // penalize punctuation soup. Clamped to [0,1].
    val lenScore = least(nChars / lit(400.0), lit(1.0))
    val raw = lit(0.4) * lenScore + lit(0.4) * least(stopRatio * lit(5.0), lit(1.0)) +
      lit(0.2) * (lit(1.0) - least(punctRatio * lit(4.0), lit(1.0)))
    // passthrough (r14): lets a caller keep extra input columns so two
    // row-local gates can run in ONE scan/projection instead of being
    // re-joined on the id (default Nil — every existing output unchanged)
    df.select(
      (Seq(col(idCol),
        length(t).as("n_chars"),
        nWords.cast("long").as("n_words"),
        round(meanWordLen, 6).as("mean_word_len"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(punctRatio, 6).as("punct_ratio"),
        round(raw, 6).as("quality_score")) ++ passthrough.map(col)): _*)
  }

  /** Code-likeness signals: prose-vs-code routing for a pretraining mix
    * (the StarCoder/FineWeb-style source-tagging heuristic), re-expressed
    * as exact integer milli-ratios so the verdict is bit-identical in any
    * engine — no model, no floats:
    *   sym_milli      = 1000·|{}();=<>[]#&|| chars    / n_chars
    *   digit_milli    = 1000·digit chars              / n_chars
    *   longword_milli = 1000·words longer than 12     / n_words
    *   code_score     = 3·sym_milli + digit_milli + 2·longword_milli
    *   is_code        = code_score ≥ threshold
    * One fused per-row pass (codegen'd regexp_replace lengths + an array
    * filter on the token split) — scan-bound, no shuffle, no UDF; all
    * divisions are non-negative DIV so Spark truncation and floor-division
    * engines agree (NOTES.md integer-division invariant). */
  def codeSignals(df: DataFrame, idCol: String, textCol: String,
      threshold: Long = 120L): DataFrame = {
    val t = col(textCol)
    val n = greatest(length(t).cast("long"), lit(1L))
    val sym = length(t).cast("long") -
      length(regexp_replace(t, "[{}();=<>\\[\\]#&|]", "")).cast("long")
    val dig = length(t).cast("long") -
      length(regexp_replace(t, "[0-9]", "")).cast("long")
    val words = split(t, " ")
    val nWords = greatest(size(words).cast("long"), lit(1L))
    val longWords = size(expr(s"filter(split(`$textCol`, ' '), w -> length(w) > 12)"))
      .cast("long")
    // Column `/` is double division in Spark — integer DIV via expr only
    df.select(col(idCol), sym.as("_sym"), dig.as("_dig"), n.as("_n"),
        longWords.as("_lw"), nWords.as("_nw"))
      .select(col(idCol),
        expr("(_sym * 1000) DIV _n").as("sym_milli"),
        expr("(_dig * 1000) DIV _n").as("digit_milli"),
        expr("(_lw * 1000) DIV _nw").as("longword_milli"))
      .withColumn("code_score",
        lit(3L) * col("sym_milli") + col("digit_milli") +
          lit(2L) * col("longword_milli"))
      .withColumn("is_code",
        when(col("code_score") >= threshold, lit(1L)).otherwise(lit(0L)))
  }

  /** Feature-hashing ("hashing trick") document embedding (Weinberger
    * et al. 2009, arXiv:0902.2206): each token instance lands in dimension
    * `fnv(token) mod dims` with sign from the next hash bit, so a doc's
    * embedding is an integer vector computable WITHOUT any model or
    * vocabulary — the deterministic lexical twin of the learned-embedding
    * column, and exact in both engines (FNV-1a is the wire-parity hash).
    * Emitted SPARSE as (id, dim, val ≠ 0) rows: one explode + one
    * (id, dim)-keyed aggregation with map-side combine; at 100 TB the
    * shuffle key is (id, small-int) and rows cap at dims per doc. */
  def hashEmbedding(df: DataFrame, idCol: String, textCol: String,
      dims: Int = 64): DataFrame = {
    require(dims == 64, "sign comes from hash bit 6 — the layout is fixed at 64 dims")
    import graft.functions.GraftFunctions.fnv1a64
    val h = fnv1a64(encode(col("w"), "UTF-8"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col(idCol),
        (((h % dims) + dims) % dims).cast("long").as("dim"),
        when(shiftright(h, 6).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
          .as("sign"))
      .groupBy(col(idCol), col("dim"))
      .agg(sum("sign").as("val"))
      .where(col("val") =!= 0L)
  }

  /** Gopher-style quality RULE battery (Rae et al. 2021, arXiv:2112.11446
    * §A1.1 — adapted to single-line ASCII docs): unlike the scalar
    * [[qualityScore]], each rule is a hard pass/fail gate and the output
    * carries the full mask, so downstream can audit WHICH rule kills a
    * document (the operational need at curation scale). All signals are
    * exact integers (milli-ratios via non-negative floor division), so
    * both engines compute identical masks. One narrow projection, no
    * shuffle, no explode — word stats derive from length arithmetic.
    *
    * Rules: r1 word count in [10, 1000]; r2 mean word length in
    * [2, 12] chars; r3 ≥ 2 stopword hits; r4 symbol ratio ≤ 10%;
    * r5 ≥ 80% of words contain a letter. keep = all five. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nWords = size(split(t, " ")).cast("long")
    val wordChars = (nChars - (nWords - lit(1L))) // single-space separators
    val alphaWords = size(filter(split(t, " "),
      w => w.rlike("[a-z]"))).cast("long")
    val nonAlnum = (length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))).cast("long")
    val stop = markerCount(t, Seq("the", "and", "of", "to", "is", "a", "in", "that"))
      .cast("long")
    df.select((Seq(col(idCol), nWords.as("n_words"),
        (wordChars * lit(1000L)).as("_wc1000"),
        (nonAlnum * lit(1000L)).as("_na1000"),
        (alphaWords * lit(1000L)).as("_aw1000"),
        stop.as("stop_cnt"), nChars.as("_nc")) ++ passthrough.map(col)): _*)
      .withColumn("mwl_milli", expr("_wc1000 DIV n_words"))
      .withColumn("sym_milli", expr("_na1000 DIV _nc"))
      .withColumn("alpha_milli", expr("_aw1000 DIV n_words"))
      .withColumn("rule_mask",
        when(col("n_words").between(10L, 1000L), 1L).otherwise(0L) +
        when(col("mwl_milli").between(2000L, 12000L), 2L).otherwise(0L) +
        when(col("stop_cnt") >= 2L, 4L).otherwise(0L) +
        when(col("sym_milli") <= 100L, 8L).otherwise(0L) +
        when(col("alpha_milli") >= 800L, 16L).otherwise(0L))
      .withColumn("keep", (col("rule_mask") === 31L).cast("long"))
      .select((Seq(col(idCol), col("n_words"), col("mwl_milli"),
        col("stop_cnt"), col("sym_milli"), col("alpha_milli"),
        col("rule_mask"), col("keep")) ++ passthrough.map(col)): _*)
  }

  /** Language ID: per-language marker-stopword hit counts; winner is the
    * highest count (ties broken by language code ascending), `und` when no
    * marker fires. A deterministic n-gram-heuristic stand-in for a real
    * langid model. */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = LangMarkers.map { case (lang, words) =>
      struct(markerCount(col(textCol), words).as("hits"), lit(lang).as("lang"))
    }
    // greatest(struct) orders by hits, then lang DESC — to break ties
    // ascending we invert: compare on (hits, reversed lang). Simpler: take
    // max hits, then the first language reaching it.
    val hitCols = LangMarkers.map { case (lang, words) =>
      markerCount(col(textCol), words).as(s"hits_$lang")
    }
    val withHits = df.select((col(idCol) +: col(textCol).as("_t") +: hitCols): _*)
    val maxHits = greatest(LangMarkers.map { case (l, _) => col(s"hits_$l") }: _*)
    val pick = LangMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(col(s"hits_$lang") === col("_max") && col("_max") > 0, lit(lang)).otherwise(acc)
    }
    withHits.withColumn("_max", maxHits)
      .withColumn("lang_pred", pick)
      .select(col(idCol), col("lang_pred"),
        col("_max").as("marker_hits"))
  }

  /** Normalization: lowercase, replace non-alphanumerics with spaces,
    * collapse whitespace runs, trim — the canonical cleanup pass before
    * shingling/dedup. Pure codegen'd string ops, no UDFs. */
  def normalize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "),
        " +", " ")).as("norm_text"))

  /** PII-shaped detector regexes — THE single definition; the DuckDB
    * oracle SQL is generated from these strings (RE2/Java-compatible
    * subset: no lookaround, no backrefs). */
  val EmailRe: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlRe: String = "https?://[a-z0-9./_-]+"
  val PhoneRe: String = "\\+[0-9][0-9-]{5,}[0-9]"

  /** PII scrubbing: count and redact email / URL / phone-shaped spans —
    * the compliance pass a training pipeline runs before any corpus is
    * retained. Counts are measured on the raw text; redaction replaces
    * URLs first (so an address inside a link is not double-counted), then
    * emails, then phone numbers. One narrow codegen'd projection (three
    * `regexp_count` + three `regexp_replace`), no shuffle at any scale. */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("scrubbed"))
  }

  /** Corpus vocabulary statistics + a Zipf's-law fit: vocabulary size,
    * hapax-legomenon count, total token count, type-token ratio, and the
    * least-squares slope of ln(frequency) against ln(rank) over the top
    * `topN` vocabulary entries (Zipf's law predicts ≈ −1; a corpus whose
    * slope is far off is boilerplate-heavy or template-generated — a
    * corpus-level quality gate).
    *
    * Cross-engine determinism: ln values are rounded to integer millinats
    * per term (the perplexity/PMI pattern), the slope comes from the
    * closed form `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` over those exact
    * integer sums, and only the final division is quantized (q6).
    *
    * Plan shape: one token-frequency shuffle with map-side combine; the
    * top-`topN` head rides a distributed TakeOrdered; ranks are assigned
    * by `sort_array` + `posexplode` over the collected `topN`-element
    * array (bounded at `topN` rows regardless of corpus size) — no global
    * window anywhere. */
  def zipfStats(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    val freq = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val totals = freq.agg(
      count(lit(1)).cast("long").as("vocab_size"),
      sum(when(col("f") === 1, 1L).otherwise(0L)).cast("long").as("hapax_count"),
      sum(col("f")).cast("long").as("total_tokens"))
    // top-N by (f desc, w): TakeOrdered, then rank via sorted-array
    // position — the (−f, w) struct sorts exactly in rank order
    val ranked = freq
      .orderBy(col("f").desc, col("w")).limit(topN)
      .agg(sort_array(collect_list(struct(
        (col("f") * -1).as("nf"), col("w").as("w"), col("f").as("f")))).as("a"))
      .select(posexplode(col("a")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("double").as("r"),
        col("s.f").cast("double").as("f"))
    val sums = ranked
      .select(
        floor(log(col("r")) * 1000.0 + 0.5).cast("long").as("x"),
        floor(log(col("f")) * 1000.0 + 0.5).cast("long").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    totals.crossJoin(sums).select(
      col("vocab_size"), col("hapax_count"), col("total_tokens"),
      q6(col("vocab_size").cast("double") / col("total_tokens").cast("double"))
        .as("type_token_ratio"),
      q6((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("zipf_slope"))
  }

  /** Document fingerprint: minimum modular hash over the document's
    * k-shingle codes — a winnowing-style content fingerprint; equal
    * fingerprints are near-dup candidates. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val (a, b) = hashCoeffs(1).head
    // MIN is duplicate-insensitive → no distinct shuffle needed.
    shingles(df, idCol, textCol, k, distinct = false)
      .groupBy(col(idCol))
      .agg(min(permHash(col("code"), a, b)).as("fingerprint"))
  }

  /** Winnowed fingerprint SET per document (`(id, fp)` distinct rows):
    * the per-window minima of the permutation-hashed k-shingle stream,
    * window = `w` consecutive shingles — the MOSS selection rule, so any
    * shared substring of length ≥ k + w − 1 is guaranteed to surface as a
    * shared fingerprint. The whole set is computed inside the fused
    * [[graft.functions.WinnowFingerprints]] expression (one narrow
    * projection + explode; no shuffle, no per-window re-evaluation), which
    * is what makes substring-level dedup viable at corpus scale: cost is
    * O(total characters), not O(docs²) suffix comparison. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 12): DataFrame = {
    val (a, b) = hashCoeffs(1).head
    df.select(col(idCol),
      explode(graft.functions.GraftFunctions.winnow_fingerprints(
        col(textCol), k, w, a, b)).as("fp"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-unigram bucket
    * log-ratios between a target slice (`targetPred` rows, e.g. a trusted
    * high-quality subset) and the raw corpus, summed per document.
    *
    * Arithmetic contract: Laplace-smoothed ratio per bucket
    * `x_b = (cnt_t+1)(R+B) / ((T+B)(cnt_r+1))` with the weight kept as
    * MILLINATS (`floor(ln(x)·1000 + 0.5)` — the repo-wide per-term integer
    * ln rounding), so the per-document sum `Σ tokens n·w_b` is exact
    * integer arithmetic, cross-engine reproducible.
    *
    * Scale shape: ONE pass over the token stream into a
    * `(doc, targetPred, bucket)` count aggregate; the bucket histogram and
    * the weight table derive from that aggregate (≤ `nBuckets` rows,
    * broadcast back), so the corpus is scanned once, the shuffles are
    * keyed on (doc_id, bucket) then doc_id, and nothing global ever sits
    * in one task. Output: (id, n_tokens, importance_millinats). */
  /** Hashed-linear quality classifier scoring (the fasttext-shaped
    * inference pass): every token hashes to one of `nBuckets` feature
    * buckets, each bucket carries a FIXED milli-unit weight, and a
    * document's score is the weight sum over its token stream (bag of
    * hashed unigrams × weight vector — exactly how a pretrained linear
    * quality filter runs over a crawl). Unlike [[dsirWeights]] the weights
    * are NOT learned from this corpus: they are a given model, here a
    * deterministic LCG of the bucket id (`((1103515245·b + 12345) mod
    * 2001) − 1000` ∈ [−1000, 1000] — a stand-in with the real pipeline
    * shape; swap the formula for a broadcast weight table to serve real
    * model weights).
    *
    * Scale shape: bucket AND weight are per-row formulas, so scoring is
    * explode → narrow codegen'd projection → one map-side-combinable
    * per-doc sum — no weight-table join, no broadcast, nothing global.
    * All-integer milli-unit arithmetic → engine-exact scores and labels.
    * Output: (id, n_tokens, score_milli, keep). */
  def linearClassifier(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two (bucket = low bits of the token hash)")
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .withColumn("_b", graft.functions.GraftFunctions
        .fnv1a64(encode(col("tok"), "UTF-8"))
        .bitwiseAND(lit((nBuckets - 1).toLong)))
      .withColumn("_w",
        (lit(1103515245L) * col("_b") + lit(12345L)) % lit(2001L) - lit(1000L))
    toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("_w")).as("score_milli"))
      .withColumn("keep", col("score_milli") > 0L)
  }

  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two (bucket = low bits of the token hash)")
    val toks = df
      .select(col(idCol), targetPred.as("_tgt"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      // unsigned mod 2^j == low bits: cross-engine exact however the
      // engine signs the 64-bit hash
      .withColumn("_b", graft.functions.GraftFunctions
        .fnv1a64(encode(col("tok"), "UTF-8"))
        .bitwiseAND(lit((nBuckets - 1).toLong)))
    val perDocBucket = toks
      .groupBy(col(idCol), col("_tgt"), col("_b"))
      .agg(count(lit(1)).as("_n"))
    val hist = perDocBucket.groupBy("_b").agg(
      sum(col("_n")).as("cnt_r"),
      sum(when(col("_tgt"), col("_n")).otherwise(0L)).as("cnt_t"))
    val tot = hist.agg(sum("cnt_r").as("rr"), sum("cnt_t").as("tt"))
    val wts = hist.crossJoin(tot).select(col("_b"),
      floor(log(
        ((col("cnt_t") + lit(1)).cast("double") * (col("rr") + lit(nBuckets)).cast("double")) /
          ((col("tt") + lit(nBuckets)).cast("double") * (col("cnt_r") + lit(1)).cast("double"))
      ) * lit(1000.0) + lit(0.5)).cast("long").as("_w"))
    perDocBucket.join(broadcast(wts), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_n")).cast("long").as("n_tokens"),
        sum(col("_n") * col("_w")).cast("long").as("importance_millinats"))
  }

  /** Count-min-sketch token-frequency estimation (Cormode–Muthukrishnan)
    * with deterministic salted-FNV hash rows: `bucket_j(tok) =
    * fnv1a64(tok ⧺ "#j") & (width−1)`, so the whole sketch — and therefore
    * every estimate — is exactly reproducible by any engine (no randomized
    * seeds). The sketch build is ONE map-side-combinable aggregate over
    * `depth` bucket ids per token (posexplode of a per-row array, a single
    * pass over the token stream): the mergeable-counters shape that
    * estimates frequencies over 100 TB in `depth·width` integers where an
    * exact vocabulary groupBy would shuffle every distinct token. The
    * exact top-k rides along (TakeOrdered, bounded) to exhibit the CMS
    * guarantee `estimate ≥ exact` per emitted row.
    * Output: (word, exact_n, cms_estimate, overestimated). */
  /** CMS bucket id of token `w` in hash row `j`: low bits of the
    * salted FNV — the ONE definition both the batch and streaming sketch
    * builders (and the generated SQL twins) derive from. */
  def cmsBucket(w: Column, j: Int, width: Int): Column = {
    require(width > 0 && (width & (width - 1)) == 0,
      "width must be a power of two (bucket = low bits of the salted hash)")
    graft.functions.GraftFunctions.fnv1a64(
      encode(concat(w, lit("#"), lit(j.toString)), "UTF-8"))
      .bitwiseAND(lit((width - 1).toLong))
  }

  /** BPE merge-candidate statistics — the first iteration of byte-pair-
    * encoding tokenizer training (Sennrich et al. 2016): every word splits
    * into characters plus an end-of-word marker, and the merge score of an
    * adjacent symbol pair is its corpus frequency (occurrences weighted by
    * word count). Emits the top-`topK` pairs by (frequency desc, pair asc)
    * — exactly the candidates a BPE trainer would merge first — plus the
    * number of distinct word types each pair appears in.
    *
    * Scale shape: the corpus collapses to a word-frequency table FIRST
    * (one map-side-combinable shuffle on the word), and pairs explode over
    * the VOCABULARY, not the token stream — the trainer trick that makes
    * BPE counting corpus-size-independent per iteration (cost ∝ Σ|type|,
    * not Σ|token|). The head is a distributed TakeOrdered, no global
    * window. All-integer counts → engine-exact. */
  def bpePairStats(df: DataFrame, textCol: String, topK: Int = 25): DataFrame = {
    val wf = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wf"))
    val pairs = wf
      .select(col("w"), col("wf"),
        explode(expr(
          "transform(sequence(1, length(w)), i -> concat(" +
            "substr(w, i, 1), ' ', " +
            "CASE WHEN i < length(w) THEN substr(w, i + 1, 1) " +
            "ELSE '</w>' END))")).as("pair"))
    pairs.groupBy("pair")
      .agg(sum(col("wf")).as("pair_freq"),
        countDistinct(col("w")).cast("long").as("n_word_types"))
      .orderBy(col("pair_freq").desc, col("pair"))
      .limit(topK)
  }

  /** Kneser-Ney smoothed bigram probabilities over the whitespace token
    * stream, EXACT-INTEGER: with the dyadic discount d = 3/4,
    *   P_kn(w2|w1) = max(c−d,0)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/T
    * reduces to the rational (max(4c−3,0)·T + 3·Nr·Nl) / (4·c1·T), so a
    * SQL twin replays the smoothing bit-for-bit (p_micro = 1e6·num DIV
    * den). Identity (tested): Σ_w2 over OBSERVED continuations plus the
    * backoff mass of unobserved ones telescopes to exactly 1 per context
    * — i.e. Σ_observed p = 1 − d·Nr/c1·(1 − Σ_observed Nl/T), so the
    * floored micro sums land within #w2 of the closed form.
    *
    * Plan: ONE bigram-count aggregation (the expensive pass at scale);
    * left totals + continuation counts are vocab-keyed re-aggregations on
    * the same exchange shape (AQE stage reuse); T is one scalar action.
    * Returns every observed bigram: (w1, w2, cnt, p_micro). */
  def kneserNeyBigrams(df: DataFrame, textCol: String): DataFrame = {
    val toks = df
      .select(expr(s"filter(split($textCol, ' '), x -> x <> '')").as("tk"))
      .where(size(col("tk")) >= 2)
    val bigrams = toks.select(explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cnts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val left = cnts.groupBy("w1")
      .agg(sum("cnt").as("c1"), count(lit(1)).as("nr"))
    val right = cnts.groupBy("w2").agg(count(lit(1)).as("nl"))
    val t = cnts.count()
    cnts.join(left, Seq("w1")).join(right, Seq("w2"))
      .withColumn("p_micro", expr(
        s"(1000000 * (greatest(4 * cnt - 3, 0) * $t + 3 * nr * nl)) " +
          s"DIV (4 * c1 * $t)"))
      .select(col("w1"), col("w2"), col("cnt"), col("p_micro"))
  }

  /** Jelinek-Mercer interpolated bigram probabilities, EXACT-INTEGER:
    * with λ = 4/5,
    *   P_jm(w2|w1) = λ·c(w1,w2)/c1(w1) + (1−λ)·u(w2)/N
    * is emitted as the SUM OF TWO FLOORED MICRO TERMS
    *   p_micro = (10⁶·4·c) DIV (5·c1) + (10⁶·u) DIV (5·N)
    * — deliberately NOT the single common-denominator fraction: that
    * numerator carries c·N and overflows BIGINT once corpus token counts
    * pass ~10⁶ (the 100 TB regime); each term here stays ≤ 4·10¹².
    * Both engines replay the identical two-floor form bit-for-bit.
    *
    * Plan: the bigram-count aggregation (the expensive pass), a w1
    * re-aggregation on the same exchange shape, a unigram aggregation,
    * and one scalar token-count action. Returns every observed bigram:
    * (w1, w2, cnt, p_micro). */
  def jelinekMercerBigrams(df: DataFrame, textCol: String): DataFrame = {
    val arrs = df
      .select(expr(s"filter(split($textCol, ' '), x -> x <> '')").as("tk"))
    val toks = arrs.select(explode(col("tk")).as("word"))
    val bigrams = arrs.where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cnts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val left = cnts.groupBy("w1").agg(sum("cnt").as("c1"))
    val uni = toks.groupBy(col("word").as("w2")).agg(count(lit(1)).as("uw"))
    val n = toks.count()
    cnts.join(left, Seq("w1")).join(uni, Seq("w2"))
      .withColumn("p_micro", expr(
        s"(1000000 * 4 * cnt) DIV (5 * c1) + (1000000 * uw) DIV (5 * ${n}L)"))
      .select(col("w1"), col("w2"), col("cnt"), col("p_micro"))
  }

  def cmsTopK(df: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 1024, topK: Int = 25): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth out of range")
    def bucket(w: Column, j: Int): Column = cmsBucket(w, j, width)
    val toks = df.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
    val rows = toks.select(posexplode(array((0 until depth).map(j =>
      bucket(col("word"), j)): _*)).as(Seq("rw", "bkt")))
    val sketch = rows.groupBy("rw", "bkt").agg(count(lit(1)).as("c"))
    val exact = toks.groupBy("word").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("word")).limit(topK)
    val probes = exact.select(col("word"), posexplode(array(
      (0 until depth).map(j => bucket(col("word"), j)): _*))
      .as(Seq("rw", "bkt")))
    probes.join(sketch, Seq("rw", "bkt"))
      .groupBy("word").agg(min(col("c")).as("cms_estimate"))
      .join(exact, Seq("word"))
      .select(col("word"), col("exact_n"), col("cms_estimate"),
        (col("cms_estimate") >= col("exact_n")).as("overestimated"))
  }

  /** Hashed bag-of-words training features for [[perceptronTrain]]:
    * (doc_id, y, dim, cnt) — token count per hashed feature bucket
    * (FNV-1a-64 positive hash mod `dims`; dims a power of two so
    * signed/unsigned residues agree cross-engine, the hashEmbedding
    * note), label y ∈ {+1, −1} from `label`. One explode + one
    * map-side-combinable count; ≤ `dims` rows per document. */
  def perceptronFeatures(df: DataFrame, idCol: String, textCol: String,
      label: Column, dims: Int): DataFrame = {
    require(Integer.bitCount(dims) == 1, "dims must be a power of two")
    df.select(col(idCol).as("doc_id"), label.as("y"),
        explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .select(col("doc_id"), col("y"),
        (Sketches.positiveHash(encode(col("w"), "UTF-8")) % dims).as("dim"))
      .groupBy("doc_id", "y", "dim").agg(count(lit(1)).as("cnt"))
  }

  /** Distributed BATCH-perceptron training — the training leg of the
    * hashed-linear filter family ([[linearClassifier]] is the inference
    * leg with pretrained weights). Each epoch updates weights by the SUM
    * of y·x over all currently-misclassified documents (margin y·⟨w,x⟩
    * ≤ 0), so the update is order-independent (unlike the sequential
    * perceptron) and all-integer — both engines replay the training run
    * bit-for-bit, and map-side combining is safe.
    *
    * Plan shape per epoch (the pca_power pattern): margins come from one
    * per-doc aggregate against the weight vector embedded as a literal
    * array (no join); the gradient is one features ⋈ wrong-docs equi-join
    * on doc_id plus a `dims`-row aggregate; the driver holds `dims`
    * longs. Weight magnitude is bounded by epochs × total token count —
    * BIGINT headroom to ~10¹⁵ tokens. */
  def perceptronTrain(feats: DataFrame, dims: Int, epochs: Int): Array[Long] = {
    require(epochs >= 1)
    val f = feats.localCheckpoint()
    val w = Array.fill(dims)(0L)
    for (_ <- 1 to epochs) {
      val wrong = perceptronMargins(f, w).where(col("y") * col("m") <= 0)
        .select("doc_id")
      f.join(wrong, "doc_id")
        .groupBy("dim").agg(sum(col("y") * col("cnt")).as("g"))
        .collect()
        .foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
    }
    w
  }

  /** Per-document margins ⟨w, x⟩ for a trained weight vector: one
    * aggregate, weights as a literal array (never a join). Output
    * (doc_id, y, m). */
  def perceptronMargins(feats: DataFrame, w: Array[Long]): DataFrame = {
    val wArr = array(w.map(lit).toIndexedSeq: _*)
    feats.groupBy("doc_id", "y")
      .agg(sum(col("cnt") * element_at(wArr, col("dim").cast("int") + 1))
        .as("m"))
  }

  /** DuckDB twin of [[perceptronFeatures]] + [[perceptronTrain]]: CTE
    * chain over `documents` ending in `w$epochs(dim, w)` covering every
    * dim 0..dims-1 (zero where no gradient ever landed — matching the
    * driver-side array). Epoch 1 is the closed form (w₀ = 0 makes every
    * featured document misclassified); later epochs unroll margin →
    * wrong-set → gradient → update. `posHash` renders the positive
    * FNV-1a-64 of a VARCHAR SQL expression; `labelSql` yields ±1. */
  def perceptronCtes(dims: Int, epochs: Int, posHash: String => String,
      labelSql: String): String = {
    val head =
      s"""ptk AS (SELECT doc_id, $labelSql AS y,
         |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
         |  FROM documents),
         |f AS (SELECT doc_id, y, CAST(${posHash("w")} % $dims AS BIGINT) AS dim,
         |    CAST(count(*) AS BIGINT) AS cnt FROM ptk GROUP BY 1, 2, 3),
         |ds AS (SELECT CAST(unnest(generate_series(0, ${dims - 1})) AS BIGINT) AS dim),
         |w1 AS (SELECT ds.dim, CAST(coalesce(SUM(f.y * f.cnt), 0) AS BIGINT) AS w
         |  FROM ds LEFT JOIN f ON f.dim = ds.dim GROUP BY ds.dim)""".stripMargin
    val rest = (2 to epochs).map { e =>
      s"""m$e AS (SELECT f.doc_id, f.y, SUM(f.cnt * w.w) AS m
         |  FROM f JOIN w${e - 1} w ON w.dim = f.dim GROUP BY 1, 2),
         |g$e AS (SELECT f.dim, SUM(f.y * f.cnt) AS g FROM f
         |  JOIN m$e m ON m.doc_id = f.doc_id AND m.y * m.m <= 0 GROUP BY 1),
         |w$e AS (SELECT w.dim, CAST(w.w + coalesce(g.g, 0) AS BIGINT) AS w
         |  FROM w${e - 1} w LEFT JOIN g$e g ON g.dim = w.dim)""".stripMargin
    }
    (head +: rest).mkString(",\n")
  }

  /** Per-group bigram entropy rate: the conditional entropy
    * H(W₂|W₁) = Σ c(w₁,w₂)·ln(c(w₁)/c(w₁,w₂)) / N next to the unigram
    * entropy H(W₁) = Σ c(w₁)·ln(N/c(w₁)) / N, in integer MICROnats —
    * the "how predictable is the next token" complexity signal that
    * separates templated/boilerplate text (low rate) from natural prose
    * at corpus level, complementing the per-document [[entropyStats]].
    * Each surprisal is quantized ([[TextOps.microLn]]) then weighted by
    * its exact integer count BEFORE summation, so the reduction is
    * order-independent and the SQL twin replays it bit-for-bit; the
    * closing division is integer on non-negative operands.
    *
    * The unigram distribution derives FROM the bigram table's left word
    * (c₁ = Σ_w₂ c₁₂ — one corpus pass total). Plan: one explode + count,
    * two vocabulary-sized re-aggregations, an equi-join on (g, w₁), and
    * a per-group-row broadcast of N. Output:
    * (g, n_bigrams, vocab1, h_cond_micro, h_uni_micro). */
  def conditionalEntropy(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
        expr(s"filter(split($textCol, ' '), x -> x <> '')").as("tk"))
      .where(size(col("tk")) >= 2)
    val c12 = toks.select(col("g"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"))
        .as("b"))
      .groupBy(col("g"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds c1, N and the join — materialize once
    val c1 = c12.groupBy("g", "w1").agg(sum("c12").as("c1"))
    val nTab = c12.groupBy("g").agg(sum("c12").as("nn"))
    val cond = c12.join(c1, Seq("g", "w1"))
      .select(col("g"),
        (col("c12") * TextOps.microLn(
          col("c1").cast("double") / col("c12").cast("double"))).as("t"))
      .groupBy("g").agg(sum("t").as("sc"), count(lit(1)).as("n_bigrams"))
    val uni = c1.join(broadcast(nTab), Seq("g"))
      .select(col("g"),
        (col("c1") * TextOps.microLn(
          col("nn").cast("double") / col("c1").cast("double"))).as("tu"))
      .groupBy("g").agg(sum("tu").as("su"), count(lit(1)).as("vocab1"))
    cond.join(uni, Seq("g")).join(broadcast(nTab), Seq("g"))
      .select(col("g"), col("n_bigrams"), col("vocab1"),
        expr("sc DIV nn").as("h_cond_micro"),
        expr("su DIV nn").as("h_uni_micro"))
  }
}
