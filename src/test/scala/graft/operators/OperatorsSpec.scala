package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics checks for the LLM-pipeline operators on planted fixtures
  * (FIXTURES.md §C shapes, generated in-test with fixed seeds). */
class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("OperatorsSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import scala.collection.JavaConverters._

  private def docsDF(rows: Seq[(Long, String)]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  test("exact dedup keeps lowest id per identical text") {
    val df = docsDF(Seq(
      (0L, "alpha beta gamma"), (1L, "delta epsilon"),
      (2L, "alpha beta gamma"), (3L, "unique text here"),
      (4L, "alpha beta gamma")))
    val res = Dedup.exact(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(res(0L) == 3) // group of 3 kept at id 0
    assert(res(1L) == 1 && res(3L) == 1)
    assert(res.keySet == Set(0L, 1L, 3L))
  }

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "daily") // small edit
    val rnd = new scala.util.Random(42)
    val noise = (10L until 40L).map { i =>
      i -> (0 until 12).map(_ => ('a' + rnd.nextInt(26)).toChar.toString * 3).mkString(" ")
    }
    val df = docsDF(Seq(0L -> base, 1L -> nearDup) ++ noise)
    val pairs = Dedup.minHashLshPairs(df, "doc_id", "text", k = 5, bands = 4, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"planted pair missing from $pairs")
    // unrelated random docs shouldn't pair with the planted docs
    assert(!pairs.exists { case (a, b) => (a < 2) != (b < 2) })
  }

  test("simhash: near-dups within small hamming distance, jaccard confirms") {
    val base = "spark structured streaming with watermarks handles late data well"
    val near = base.replace("well", "fine")
    val far = "completely different content about databases and storage engines"
    val df = docsDF(Seq(0L -> base, 1L -> near, 2L -> far))
    val fp = Dedup.simHash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(0L), fp(1L)) < hamming(fp(0L), fp(2L)))
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", k = 8, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(jac.toSeq == Seq((0L, 1L)))
  }

  test("brute-force top-k returns true nearest neighbors") {
    import org.apache.spark.sql.types._
    val vecs: Seq[(Long, Array[Float])] = Seq(
      0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0.9f, 0.1f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f), 3L -> Array(0f, 0.9f, 0.1f, 0f),
      4L -> Array(0f, 0f, 1f, 0f))
    val df = spark.createDataFrame(
      vecs.map { case (i, v) => org.apache.spark.sql.Row(i, v.toSeq) }.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val res = Similarity.bruteForceTopK(
        df.where(col("vec_id") === 0), df, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(res.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // 1 closest, then 2/3 tie? no: 2 and 3 ~equal
  }

  test("lsh buckets put identical vectors together") {
    import org.apache.spark.sql.types._
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val w = Array.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    val df = spark.createDataFrame(
      Seq((0L, v.toSeq), (1L, v.toSeq), (2L, w.toSeq)).map {
        case (i, x) => org.apache.spark.sql.Row(i, x)
      }.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val b = Similarity.lshBuckets(df, "vec_id", "embedding", planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
  }

  test("language id picks marker language; token stats count correctly") {
    val df = docsDF(Seq(
      (0L, "the cat and the dog of the house"),
      (1L, "el gato de la casa que es de los vecinos"),
      (2L, "der hund und die katze das ist nicht gut"),
      (3L, "xyzzy plugh qwerty")))
    val langs = TextAnalysis.languageId(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(0L) == "en" && langs(1L) == "es" && langs(2L) == "de")
    assert(langs(3L) == "und")
    val toks = TextAnalysis.tokenStats(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(toks(0L) == 8 && toks(3L) == 3)
  }

  test("multimodal: wrap → describe → stubbed batch decode keeps schema and determinism") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "media payload two"))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val wrapped = Multimodal.wrap(df, "doc_id", "payload", lit("text/plain"),
      Seq("origin" -> lit("test")))
    val desc = Multimodal.describe(wrapped).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(desc(1L) == 11 && desc(2L) == 17)
    val feats = Multimodal.extractFeatures(spark, wrapped).collect()
    assert(feats.length == 2)
    val f1 = feats.find(_.id == 1L).get
    assert(f1.byte_len == 11 && f1.feature.length == 8)
    // deterministic: same input → same fake features
    val again = Multimodal.extractFeatures(spark, wrapped).collect().find(_.id == 1L).get
    assert(f1.feature.toSeq == again.feature.toSeq && f1.width == again.width)
    val frames = Multimodal.sampleFrames(spark, wrapped, 3).collect()
    assert(frames.length == 6)
    assert(frames.filter(_.getLong(0) == 1L).map(_.getAs[Array[Byte]](2).length).sum == 11)
  }

  test("multimodal real codec: PNG roundtrip is pixel-exact; opaque falls back to stub") {
    import spark.implicits._
    // a genuine PNG through the JDK encoder/decoder must reproduce the
    // pixel closed form exactly (PNG is lossless)
    val png = Multimodal.MediaCodecImageIO.syntheticPng(seed = 5L, w = 9, h = 11)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = Multimodal.MediaCodecImageIO.decode(png).get
    assert(img.getWidth == 9 && img.getHeight == 11)
    for (x <- 0 until 9; y <- 0 until 11) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) == (7 * x + 13 * y + 5) % 256, s"r at ($x,$y)")
      assert(((p >> 8) & 0xff) == (3 * x + 5 * y + 10) % 256, s"g at ($x,$y)")
      assert((p & 0xff) == (11 * x + 2 * y + 15) % 256, s"b at ($x,$y)")
    }
    // mixed batch: one PNG (real lane), one opaque payload (stub lane)
    val media = Seq(
      (1L, png, "image/png"),
      (2L, "not an image".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val dec = Multimodal.decodeReal(spark, wrapped).collect()
      .map(d => d.id -> d).toMap
    assert(dec(1L).real_codec && dec(1L).width == 9 && dec(1L).height == 11)
    // mean_r: Σ (7x+13y+5)%256 over the 9×11 grid, milli-units
    val meanR = (for (x <- 0 until 9; y <- 0 until 11)
      yield ((7 * x + 13 * y + 5) % 256).toLong).sum * 1000 / 99
    assert(dec(1L).mean_r_milli == meanR)
    assert(!dec(2L).real_codec) // opaque payload routed to the stub lane
    // real resize: box 6 downscales 9×11 → (4, 6); kernel is replayable
    val rs = Multimodal.resizeReal(spark, wrapped, box = 6).collect()
    assert(rs.length == 1) // the opaque row is dropped from the image lane
    val r = rs.head
    assert(r.getLong(3) == 9 * 6 / 11 && r.getLong(4) == 6)
    val (mx, my) = (((r.getLong(3) / 2) * 9 / r.getLong(3)).toInt,
      ((r.getLong(4) / 2) * 11 / r.getLong(4)).toInt)
    assert(r.getLong(5) == (7 * mx + 13 * my + 5) % 256)
  }

  test("interval join matches exactly the rows in the half-open window") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val left = Seq((1L, 10L, 1000L), (1L, 11L, 2000L), (2L, 12L, 1500L))
      .toDF("k", "lid", "lt")
    val right = Seq(
      (1L, 100L, 900L),  // in [1000-200, 1000) for lid=10
      (1L, 101L, 1000L), // boundary: NOT in [800, 1000) (half-open upper)
      (1L, 102L, 1805L), // in [1800, 2000) for lid=11
      (2L, 103L, 1299L), // just below [1300, 1500) for lid=12
      (2L, 104L, 1300L)) // lower bound inclusive for lid=12
      .toDF("k", "rid", "rt")
    val got = RangeJoin.intervalJoin(left, right, Seq("k"), "lt", "rt",
        lower = -200L, upper = 0L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L), (11L, 102L), (12L, 104L)))
    // bucket-aligned window start must not drop or duplicate matches
    val aligned = RangeJoin.intervalJoin(
        Seq((1L, 20L, 400L)).toDF("k", "lid", "lt"),
        Seq((1L, 200L, 200L), (1L, 201L, 399L), (1L, 202L, 400L))
          .toDF("k", "rid", "rt"),
        Seq("k"), "lt", "rt", lower = -200L, upper = 0L)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    assert(aligned == Seq(200L, 201L))
    // forward (look-ahead) window [lt, lt+150): inclusive lower at lt
    val fwd = RangeJoin.intervalJoin(
        Seq((1L, 30L, 1000L)).toDF("k", "lid", "lt"),
        Seq((1L, 300L, 999L), (1L, 301L, 1000L), (1L, 302L, 1149L),
          (1L, 303L, 1150L)).toDF("k", "rid", "rt"),
        Seq("k"), "lt", "rt", lower = 0L, upper = 150L)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    assert(fwd == Seq(301L, 302L))
  }

  test("containment flags subset duplication that jaccard dilutes") {
    val para = "the quick brown fox jumps over the lazy dog again and again"
    val long = para + " plus a very long unrelated tail that goes on and on " +
      "with totally different content filling many more shingles than the core"
    val df = docsDF(Seq((0L, para), (1L, long), (2L, "nothing in common here at all")))
    val cont = Dedup.containmentPairs(df, "doc_id", "text", k = 8,
      minContainment = 0.9).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
    // the same pair scores far lower on jaccard (subset vs union)
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", k = 8,
      minJaccard = 0.9).collect()
    assert(jac.isEmpty)
  }

  test("hamming top-k ranks by bit distance with id tie-break") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val sigs = Seq(
      (0L, 0x00FFL), (1L, 0x00FEL), (2L, 0x00FFL), (3L, 0xFF00L))
      .toDF("doc_id", "simhash")
    val got = Similarity.hammingTopK(
        sigs.where(col("doc_id") === 0), sigs, "doc_id", "simhash", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    // 2 is identical (ham 0), 1 differs by 1 bit, 3 by 16
    assert(got.toSeq == Seq((2L, 1, 0L), (1L, 2, 1L), (3L, 3, 16L)))
  }

  test("multi-probe IVF candidates are a superset of single-probe's") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val q = emb.where(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(Similarity.ivfSearch(q, emb, "vec_id", "embedding",
      nCentroids = 4, k = 60))
    val multi = pairs(Similarity.ivfSearchMultiProbe(q, emb, "vec_id", "embedding",
      nCentroids = 4, nprobe = 2, k = 60))
    assert(single.subsetOf(multi),
      s"missing from multi-probe: ${single.diff(multi)}")
    assert(multi.size > single.size) // probing a 2nd cell adds candidates
  }

  test("chunk manifest covers every byte exactly once") {
    import spark.implicits._
    val df = Seq((1L, "a" * 700), (2L, "b" * 256), (3L, "")).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val wrapped = Multimodal.wrap(df, "doc_id", "payload", lit("text/plain"), Seq.empty)
    val m = Multimodal.chunkManifest(wrapped, chunkBytes = 256)
      .orderBy("id", "chunk_idx").collect()
    val byId = m.groupBy(_.getLong(0))
    assert(!byId.contains(3L)) // empty payload: no chunks
    assert(byId(1L).map(_.getLong(5)).toSeq == Seq(256L, 256L, 188L))
    assert(byId(1L).map(_.getLong(4)).toSeq == Seq(0L, 256L, 512L))
    assert(byId(2L).map(_.getLong(5)).toSeq == Seq(256L))
    assert(m.forall(r => r.getLong(2) == byId(r.getLong(0)).length.toLong))
  }

  test("hop windows: complete windows only, correct starts and overlap") {
    import spark.implicits._
    // lengths: 200 → windows at 0,32,64,96,128 (start+64 ≤ 200 ⇒ 5);
    // 64 → exactly one; 63 → none; 96 → starts 0,32
    val df = Seq((1L, "a" * 200), (2L, "b" * 64), (3L, "c" * 63), (4L, "d" * 96))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val wrapped = Multimodal.wrap(df, "doc_id", "payload", lit("text/plain"), Seq.empty)
    val w = Multimodal.hopWindows(wrapped, windowBytes = 64, hopBytes = 32)
      .orderBy("id", "win_idx").collect()
    val byId = w.groupBy(_.getLong(0))
    assert(!byId.contains(3L))
    assert(byId(1L).map(_.getLong(3)).toSeq == Seq(0L, 32L, 64L, 96L, 128L))
    assert(byId(2L).map(_.getLong(3)).toSeq == Seq(0L))
    assert(byId(4L).map(_.getLong(3)).toSeq == Seq(0L, 32L))
    // every window is complete and n_windows is consistent
    assert(w.forall(r => r.getLong(4) == 64L))
    assert(w.forall(r => r.getLong(3) + 64L <=
      (r.getLong(0) match { case 1L => 200L; case 2L => 64L; case 4L => 96L })))
    assert(w.forall(r => r.getLong(1) == byId(r.getLong(0)).length.toLong))
  }

  test("pq codes: deterministic, in range, and decomposable per subspace") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val codes = Similarity.pqCodes(emb, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(codes.size == 40)
    assert(codes.values.forall(c => c >= 0 && c < math.pow(4, 8).toLong))
    // rerun is bit-identical (pure projections, no randomness at eval time)
    val again = Similarity.pqCodes(emb, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(codes == again)
    // codes actually use multiple subspaces: some digit beyond the first
    // differs across vectors
    assert(codes.values.map(_ / 4).toSet.size > 1)
    // subspace digit s must equal the assignment computed over the sliced
    // sub-vector alone (digit extraction = base-4 positional decomposition)
    val subDigits = codes.view.mapValues(c => (0 until 8).map(s => (c >> (2 * s)) & 3L))
    assert(subDigits.values.flatten.forall(d => d >= 0 && d <= 3))
  }

  test("pq adc search: scores are exact LUT sums over assigned codes") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 30L).map(i => i -> Array.fill(64)(rnd.nextFloat() * 2 - 1)).toMap
    val emb = vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def subSim(v: Array[Float], s: Int, c: Int): Double =
      r6((0 until 8).map(d => v(s * 8 + d).toDouble *
        Similarity.projComponent(301 + s * 4 + c, d)).sum)
    def digit(v: Array[Float], s: Int): Int =
      (0 until 4).map(c => (subSim(v, s, c), c)).max._2 // ties → higher cid
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val res = Similarity.pqAdcSearch(
        emb.where(col("vec_id") < 3), emb, "vec_id", "embedding", k = 29)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    assert(res.size == 3 * 29) // every non-self neighbor ranked
    res.foreach { case ((q, n), (_, score)) =>
      val expected = (0 until 8).map(s => micro(subSim(vecs(q), s, digit(vecs(n), s)))).sum
      assert(score == r6(expected.toDouble / 1e6),
        s"query $q neighbor $n: got $score expected ${r6(expected.toDouble / 1e6)}")
    }
    // ranks are dense 1..29 and ordered by (score desc, neighbor asc)
    (0L until 3L).foreach { q =>
      val mine = res.collect { case ((`q`, n), (rk, sc)) => (rk, sc, n) }.toSeq.sorted
      assert(mine.map(_._1) == (1 to 29))
      val ord = mine.sortBy(_._1).map(t => (-t._2, t._3))
      assert(ord == ord.sorted)
    }
  }

  test("ivf-pq search: ADC scoring restricted to exactly the probed cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 40L).map(i => i -> Array.fill(64)(rnd.nextFloat() * 2 - 1)).toMap
    val emb = vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cellSim(v: Array[Float], c: Int): Double =
      r6((0 until 64).map(d => v(d).toDouble * Similarity.projComponent(c + 101, d)).sum)
    def cellOf(v: Array[Float]): Int =
      (0 until 8).map(c => ((cellSim(v, c), c), c)).maxBy(_._1)._2
    def probesOf(v: Array[Float]): Set[Int] =
      (0 until 8).map(c => (cellSim(v, c), c)).sortBy(t => (-t._1, -t._2)).take(2)
        .map(_._2).toSet
    def subSim(v: Array[Float], s: Int, c: Int): Double =
      r6((0 until 8).map(d => v(s * 8 + d).toDouble *
        Similarity.projComponent(301 + s * 4 + c, d)).sum)
    def digit(v: Array[Float], s: Int): Int =
      (0 until 4).map(c => (subSim(v, s, c), c)).max._2
    def micro(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

    val res = Similarity.ivfPqSearch(
        emb.where(col("vec_id") < 3), emb, "vec_id", "embedding",
        nCentroids = 8, nprobe = 2, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    // candidate set = non-self corpus vectors whose single cell is probed
    val expectedPairs = for {
      q <- 0L until 3L; n <- 0L until 40L
      if n != q && probesOf(vecs(q)).contains(cellOf(vecs(n)))
    } yield (q, n)
    assert(res.keySet == expectedPairs.toSet)
    assert(res.nonEmpty && res.size < 3 * 39) // genuinely restricted
    // scores are the exact ADC LUT sums
    res.foreach { case ((q, n), (_, score)) =>
      val exp = (0 until 8).map(s => micro(subSim(vecs(q), s, digit(vecs(n), s)))).sum
      assert(score == r6(exp.toDouble / 1e6))
    }
    // per-query ranks dense and ordered by (score desc, neighbor asc)
    (0L until 3L).foreach { q =>
      val mine = res.collect { case ((`q`, n), (rk, sc)) => (rk, sc, n) }.toSeq.sorted
      assert(mine.map(_._1) == (1 to mine.size))
      val ord = mine.sortBy(_._1).map(t => (-t._2, t._3))
      assert(ord == ord.sorted)
    }
  }

  test("sharding: hash split is content-stable; pack manifest is a prefix sum") {
    val docs = docsDF((0L until 400L).map(i =>
      i -> s"tok${i % 7} a b c ${"x " * (i % 13).toInt}word"))
    val split = Sharding.hashSplit(docs, "doc_id")
    val byId = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // deterministic: recomputing (and reordering input) gives identical labels
    val again = Sharding.hashSplit(docs.orderBy(org.apache.spark.sql.functions.rand(7)), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == again)
    // split matches the modular formula; rough 90/5/5 proportions
    byId.foreach { case (id, sp) =>
      val h = ((id * Sharding.HashMul) % 100 + 100) % 100
      val want = if (h < 90) "train" else if (h < 95) "val" else "test"
      assert(sp == want)
    }
    assert(byId.values.count(_ == "train") > 320)
    // pack manifest: contiguous prefix sum, positions within budget
    val p = Sharding.packManifest(docs, "doc_id", "text", budget = 64)
      .orderBy("doc_id").collect()
    var cum = 0L
    p.foreach { r =>
      assert(r.getLong(2) == cum / 64 && r.getLong(3) == cum % 64)
      cum += r.getLong(1)
    }
    assert(p.map(_.getLong(2)).distinct.length.toLong == cum / 64 + (if (cum % 64 > 0) 1 else 0))
  }

  test("fused minhash signature is bit-identical to explode+min aggregation") {
    import graft.operators.TextOps._
    val rnd = new scala.util.Random(99)
    val docs = docsDF((0L until 60L).map { i =>
      val len = rnd.nextInt(40) // includes len < k → no shingles
      i -> (0 until len).map(_ => (' ' + rnd.nextInt(95)).toChar).mkString
    })
    val k = 5; val nHashes = 16
    val fused = Dedup.minHashSignatures(docs, "doc_id", "text", k, nHashes)
      .collect().map(r => r.getLong(0) -> (0 until nHashes).map(j => r.getLong(j + 1))).toMap
    // reference formulation: explode shingles, min of each permutation hash
    val sh = shingles(docs, "doc_id", "text", k, distinct = false)
    val aggs = hashCoeffs(nHashes).zipWithIndex.map { case ((a, b), j) =>
      min(permHash(col("code"), a, b)).as(s"mh$j")
    }
    val viaAgg = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (0 until nHashes).map(j => r.getLong(j + 1))).toMap
    assert(fused == viaAgg) // same doc set (short docs dropped) AND same values
    assert(fused.nonEmpty && fused.size < 60) // some docs genuinely had no shingle
  }

  test("repetition signals: gopher fractions on hand-computable fixtures") {
    // doc 0: "a b a b a b" -> bigrams (a b)x3 (b a)x2, top 3/5;
    //        4-grams: "a b a b","b a b a","a b a b" -> dup 1/3
    // doc 1: all-distinct tokens -> top 1/5, dup 0
    // doc 2: pathological "x x x x x" -> top 4/4=1, dup 1/2
    // doc 3: 3 tokens -> filtered out (< 4)
    val df = docsDF(Seq(
      (0L, "a b a b a b"), (1L, "q w e r t y"),
      (2L, "x x x x x"), (3L, "too short doc")))
    val res = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(res.keySet == Set(0L, 1L, 2L))
    assert(res(0L) == ((0.6, math.floor((1.0 - 2.0 / 3.0) * 1e6 + 0.5) / 1e6, false)))
    assert(res(1L) == ((0.2, 0.0, true)))
    assert(res(2L) == ((1.0, 0.5, false)))
  }

  test("fused pq_code is bit-identical to the greatest-of-structs formulation") {
    import graft.functions.GraftFunctions.projection_dot
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(123)
    val rows = (0L until 200L).map { i =>
      org.apache.spark.sql.Row(i, Array.fill(64)(rnd.nextFloat() - 0.5f).toSeq)
    }
    val emb = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val fused = Similarity.pqCodes(emb, "vec_id", "embedding", 8, 4, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference formulation: per-subspace greatest over (q6 sim, cid) structs
    def q6(x: org.apache.spark.sql.Column) = floor(x * lit(1e6) + lit(0.5)) / lit(1e6)
    val codeTerms = (0 until 8).map { sIdx =>
      val sub = slice(col("embedding"), sIdx * 8 + 1, 8)
      val sims = (0 until 4).map { cIdx =>
        struct(q6(projection_dot(sub, 301 + sIdx * 4 + cIdx, 8)).as("sim"),
          lit(cIdx).as("cid"))
      }
      val weight = (0 until sIdx).foldLeft(1L)((w, _) => w * 4)
      greatest(sims: _*).getField("cid").cast("long") * lit(weight)
    }
    val viaStructs = emb.select(col("vec_id"), codeTerms.reduce(_ + _).as("pq_code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == viaStructs)
    assert(fused.values.toSet.size > 1) // codes actually vary
  }

  test("per-pair shingle overlap matches set arithmetic over distinct shingles") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val texts = (0L until 30L).map { i =>
      val len = 3 + rnd.nextInt(60) // some below k=8 → no shingles
      i -> (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // dups likely
    }
    val docs = docsDF(texts)
    val pairs = (for (a <- 0L until 30L; b <- a + 1 until 30L if (a + b) % 3 == 0)
      yield (a, b)).toDF("id_a", "id_b")
    val k = 8
    def set(t: String): Set[String] = t.sliding(k).filter(_.length == k).toSet
    val got = Dedup.jaccardForPairs(docs, pairs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val tmap = texts.toMap
    val expected = pairs.as[(Long, Long)].collect().flatMap { case (a, b) =>
      val (sa, sb) = (set(tmap(a)), set(tmap(b)))
      val both = (sa & sb).size
      if (both == 0) None
      else {
        val j = both.toDouble / (sa.size + sb.size - both)
        Some((a, b) -> math.floor(j * 1e6 + 0.5) / 1e6)
      }
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty && got.size < pairs.count()) // some pairs dropped out
  }

  test("connected components: driver union-find matches iterative propagation") {
    import spark.implicits._
    // planted components: chains, a star, a cycle, cross-links, isolated pair
    val rnd = new scala.util.Random(7)
    val planted = Seq.tabulate(30)(i => (i.toLong, (i + 31).toLong)) ++ // matching pairs
      Seq.tabulate(9)(i => (100L + i, 101L + i)) ++                     // chain 100..109
      Seq.tabulate(5)(i => (200L, 201L + i)) ++                         // star at 200
      Seq((300L, 301L), (301L, 302L), (302L, 300L)) ++                  // cycle
      Seq((105L, 203L), (5L, 300L)) ++                                  // cross-links
      Seq.fill(40)((rnd.nextInt(60).toLong, (60 + rnd.nextInt(60)).toLong))
    val pairs = planted.toDF("id_a", "id_b")
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val local = labels(Dedup.connectedComponents(pairs))
    val iterative = labels(Dedup.connectedComponents(pairs, maxLocalEdges = 0))
    assert(local == iterative)
    // spot-check the planted structure: chain+star merged via (105,203),
    // cycle pulled into node 5's component via (5,300)
    assert(local(109L) == local(200L))
    assert(local(302L) == local(5L))
    assert(local(302L) <= 5L)
  }

  test("leakage-safe split: near-duplicates always share a split") {
    // the shard_leakage_split composition: LSH pairs -> components -> hash
    // the REPRESENTATIVE. Whatever the hash values, every doc in a
    // component must land in its representative's split.
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = docsDF(Seq(
      0L -> base, 7L -> base.replace("today", "daily"),
      93L -> base.replace("quick", "swift"),
      50L -> "completely unrelated content about spark shuffles and joins"))
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", k = 5, bands = 4, rowsPerBand = 4)
    val cc = Dedup.connectedComponents(pairs).withColumnRenamed("node", "doc_id")
    val rep = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("rep"))
    val split = Sharding.hashSplit(rep, "rep")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split(0L)._1 == 0L && split(7L)._1 == 0L && split(93L)._1 == 0L,
      s"near-dups not clustered: $split")
    assert(Set(split(0L)._2, split(7L)._2, split(93L)._2).size == 1,
      "near-dups split across folds (leakage)")
    assert(split(50L)._1 == 50L) // singleton represents itself
  }

  test("runtime bloom filter injects into the shuffle-join probe side") {
    // The rel_bloom_filter_join conf shape: broadcast disabled + size
    // floors dropped → the optimizer builds a bloom filter from the
    // selectively-filtered build side and applies it to the probe-side
    // scan (might_contain), pruning rows BEFORE the shuffle. Values must
    // be unchanged vs the plain join.
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-").toString
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"p${i % 5}", (i % 1000) * 7L))
      .toDF("fact_key", "tag", "v").write.parquet(s"$dir/fact")
    (0L until 200L).map(i => (i, i * 13L % 97L))
      .toDF("dim_key", "score").write.parquet(s"$dir/dim")
    val s2 = org.apache.spark.sql.graft.GraftSqlInternal.cloneSession(spark)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val fact = s2.read.parquet(s"$dir/fact")
    val dim = s2.read.parquet(s"$dir/dim").where(col("score") < 10)
    val joined = fact.join(dim, col("fact_key") === col("dim_key"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "bloom filter was not injected")
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"$dir/fact")
      .join(spark.read.parquet(s"$dir/dim").where(col("score") < 10),
        col("fact_key") === col("dim_key"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("pii scrub: counts on raw text, URL→EMAIL→PHONE redaction order") {
    val df = docsDF(Seq(
      (0L, "reach me at a.b+c@mail.example.com or via https://x.example.org/path now"),
      (1L, "call +1-555-0042 twice or mail x@y.io and z@w.net"),
      (2L, "nothing sensitive here at all")))
    val got = TextAnalysis.piiScrub(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(0L) == ((1L, 1L, 0L,
      "reach me at <EMAIL> or via <URL> now")))
    assert(got(1L) == ((2L, 0L, 1L,
      "call <PHONE> twice or mail <EMAIL> and <EMAIL>")))
    assert(got(2L) == ((0L, 0L, 0L, "nothing sensitive here at all")))
  }

  test("zipf stats: hand-computable vocabulary and slope on a tiny corpus") {
    // frequencies: aa×4, bb×2, cc×1, dd×1 → vocab 4, hapax 2, tokens 8
    val df = docsDF(Seq(
      (0L, "aa aa bb cc"), (1L, "aa bb dd"), (2L, "aa")))
    val r = TextAnalysis.zipfStats(df, "text", topN = 100).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 8L)
    assert(r.getDouble(3) == 0.5) // type-token ratio 4/8
    // slope from the exact millinat integers: x=ln(rank)·1000 rounded,
    // y=ln(freq)·1000 rounded over ranks 1..4
    val x = Seq(1, 2, 3, 4).map(v => math.floor(math.log(v) * 1000 + 0.5).toLong)
    val y = Seq(4, 2, 1, 1).map(v => math.floor(math.log(v) * 1000 + 0.5).toLong)
    val n = 4L
    val (sx, sy) = (x.sum, y.sum)
    val (sxy, sxx) = (x.zip(y).map { case (a, b) => a * b }.sum, x.map(a => a * a).sum)
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(r.getDouble(4) == math.floor(slope * 1e6 + 0.5) / 1e6)
  }

  test("sq8 recon: on-grid vectors round-trip exactly; error bounded by half-step") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val dims = 8
    // vec 0/1 sit exactly on the [0,255] int grid; vec 2 is off-grid
    val rows = Seq(
      (0L, Array.tabulate(dims)(d => (d * 3).toFloat)),
      (1L, Array.tabulate(dims)(_ => 0f)),
      (2L, Array.tabulate(dims)(d => d * 3 + 0.4f)))
    val df = spark.createDataFrame(
      rows.map { case (i, v) => org.apache.spark.sql.Row(i, v.toSeq) }.asJava,
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    // stretch bounds to [0,255] by planting min/max rows
    val bounds = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(98L, Seq.fill(dims)(0f)),
      org.apache.spark.sql.Row(99L, Seq.fill(dims)(255f))).asJava, df.schema)
    val got = Similarity.sq8Recon(df.union(bounds), "vec_id", "embedding", dims)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(0L)._2 == 0.0, "on-grid vector must reconstruct exactly")
    assert(got(0L)._1 == 1.0)
    // off-grid: every dim within half a quantization step (0.5), cosine ≈ 1
    assert(got(2L)._2 <= 0.5 && got(2L)._1 >= 0.999)
    // all-zero vector: zero norms guard → cosine 0, exact reconstruction
    assert(got(1L) == ((0.0, 0.0)))
  }

  test("curriculum rank: bucketed two-phase equals the global sort-rank") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    // scores cluster near bucket edges (k/64 ± ε) to stress boundaries,
    // plus exact ties sharing a bucket, plus out-of-range values (clamped)
    val rows = (0L until 300L).map { i =>
      val s = i % 10 match {
        case 0 => (i % 64).toDouble / 64.0              // exactly on an edge
        case 1 => 1.0                                    // top clamp
        case 2 => 0.25                                   // heavy tie group
        case _ => rnd.nextDouble()
      }
      (i, s)
    }
    val df = spark.createDataFrame(
      rows.map { case (i, s) => org.apache.spark.sql.Row(i, s) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("s", DoubleType))))
    val got = Sharding.curriculumRank(df, "s", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val expected = rows.sortBy { case (i, s) => (s, i) }
      .zipWithIndex.map { case ((i, _), pos) => i -> pos.toLong }.toMap
    assert(got == expected)
  }

  test("as-of tolerance: farther-than-tolerance matches become NULL, rows stay") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("user_id", LongType), StructField("t", LongType)))
    def df(rows: Seq[(Long, Long, Long)]) = spark.createDataFrame(
      rows.map { case (a, b, c) => org.apache.spark.sql.Row(a, b, c) }.asJava, schema)
    val left = df(Seq((100L, 1L, 50L), (101L, 1L, 500L), (102L, 2L, 10L)))
    val right = df(Seq((7L, 1L, 45L), (8L, 1L, 300L)))
      .withColumnRenamed("id", "rid")
    val got = AsOf.joinNearest(left, right, Seq("user_id"), "t", Seq("rid"),
        tolerance = Some(lit(100L)))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == Set(
      (100L, Some(7L), Some(5L)),   // nearest at delta 5 ≤ 100
      (101L, None, None),           // nearest delta 200 > tolerance → NULL
      (102L, None, None)))          // no right row for user 2 at all
  }

  /** Naive reference winnow: O(n·w) window minima over the same
    * hash stream the fused expression computes. */
  private def naiveWinnow(text: String, k: Int, w: Int): Set[Long] = {
    val (a, b) = TextOps.hashCoeffs(1).head
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length - k + 1
    if (n <= 0) return Set.empty
    val hs = (0 until n).map { i =>
      val code = (0 until k).foldLeft(0L)((c, d) => c * 128L + (bytes(i + d) & 0xffL))
      (a * (code % TextOps.P) + b) % TextOps.P
    }
    if (n <= w) Set(hs.min)
    else (0 to n - w).map(j => hs.slice(j, j + w).min).toSet
  }

  test("winnow fingerprints match the naive window-min reference; short docs get one window") {
    val rnd = new scala.util.Random(19)
    def randText(len: Int) =
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val rows = Seq(
      (0L, randText(60)),   // normal: many windows
      (1L, randText(19)),   // exactly one full window (n = w)
      (2L, randText(15)),   // n < w -> single spanning window
      (3L, randText(8)),    // exactly one shingle
      (4L, "abc"))          // shorter than k -> no fingerprint at all
    val got = TextAnalysis
      .winnowFingerprints(docsDF(rows), "doc_id", "text", k = 8, w = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, fps) => id -> fps.map(_._2).toSet }
    rows.foreach { case (id, text) =>
      val expect = naiveWinnow(text, 8, 12)
      assert(got.getOrElse(id, Set.empty[Long]) == expect,
        s"doc $id fingerprints diverge from the reference")
    }
    assert(!got.contains(4L)) // no shingle -> NULL -> no exploded row
  }

  test("winnowing guarantee: a shared >= k+w-1 run always yields a shared fingerprint") {
    val rnd = new scala.util.Random(23)
    def randText(len: Int) =
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val sharedRun = randText(30) // >= k + w - 1 = 19
    val df = docsDF(Seq(
      (0L, randText(40) + sharedRun + randText(40)),
      (1L, randText(25) + sharedRun + randText(55)),
      (2L, randText(100)))) // unrelated
    val pairs = Dedup.winnowPairs(df, "doc_id", "text", k = 8, w = 12,
        minShared = 1L, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)),
      "planted shared substring must surface as a shared fingerprint")
    assert(!pairs.exists { case (x, y) => x == 2L || y == 2L },
      "unrelated doc matched")
  }

  test("dsir weights match an independent driver-side recomputation") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val rows = Seq(
      (0L, "en", "good clean prose with the usual words"),
      (1L, "en", "more good clean prose words"),
      (2L, "de", "komisch andere sprache hier"),
      (3L, "de", "good words komisch mixed"),
      (4L, "fr", ""))
    val df = spark.createDataFrame(
      rows.map { case (i, l, t) => org.apache.spark.sql.Row(i, l, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("text", StringType))))
    val nB = 64
    val got = TextAnalysis.dsirWeights(df, "doc_id", "text",
        targetPred = col("lang") === "en", nBuckets = nB)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // independent recomputation (same contract: FNV low bits, Laplace
    // millinat ln weights, integer sums)
    val toks = rows.flatMap { case (id, lang, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok =>
        (id, lang == "en", graft.functions.Fnv1a64.hash(tok.getBytes("UTF-8")) & (nB - 1)))
    }
    val cntR = toks.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val cntT = toks.filter(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val rr = cntR.values.sum
    val tt = cntT.values.sum
    val wts = cntR.keys.map { bkt =>
      val x = ((cntT.getOrElse(bkt, 0L) + 1).toDouble * (rr + nB).toDouble) /
        ((tt + nB).toDouble * (cntR(bkt) + 1).toDouble)
      bkt -> math.floor(math.log(x) * 1000.0 + 0.5).toLong
    }.toMap
    val expect = toks.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.map(x => wts(x._3)).sum)
    }
    assert(got == expect)
    // target-exclusive vocabulary scores above non-target-exclusive
    assert(got(1L)._2 / got(1L)._1 > got(2L)._2 / got(2L)._1)
  }

  test("cms estimates: >= exact always, == exact when width avoids collisions") {
    val df = docsDF(Seq(
      (0L, "aa bb aa cc aa bb"),
      (1L, "dd ee ff aa bb gg hh ii jj kk ll mm nn oo pp qq")))
    // wide sketch: 16 distinct tokens in 1024 buckets -> collisions are
    // possible but the exact counts must never exceed the estimate
    val wide = TextAnalysis.cmsTopK(df, "text", depth = 4, width = 1024, topK = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val naive = "aa bb aa cc aa bb dd ee ff aa bb gg hh ii jj kk ll mm nn oo pp qq"
      .split(" ").groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    assert(wide.length == naive.size)
    wide.foreach { case (w, exact, est, over) =>
      assert(exact == naive(w), s"exact count wrong for $w")
      assert(est >= exact && over, s"CMS guarantee violated for $w")
    }
    // narrow sketch: width 2 forces heavy collisions -> at least one
    // estimate must strictly exceed its exact count, none may undershoot
    val narrow = TextAnalysis.cmsTopK(df, "text", depth = 2, width = 2, topK = 20)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(narrow.forall { case (exact, est) => est >= exact })
    assert(narrow.exists { case (exact, est) => est > exact },
      "16 tokens in 2 buckets cannot all estimate exactly")
  }

  test("systematic sample: every tick assigned exactly once, selection matches naive") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(31)
    // sparse ids, spiky weights incl. 0 (never selectable) and > period
    // (always selected, possibly multi-tick)
    val rows = (0L until 300L).map { i =>
      val w = rnd.nextInt(6) match {
        case 0 => 0L
        case 1 => 2500L // > period
        case _ => 1L + rnd.nextInt(400)
      }
      (i * 13 % 4096, w)
    }.distinct
    val df = spark.createDataFrame(
      rows.map { case (i, w) => org.apache.spark.sql.Row(i, w) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("w", LongType))))
    val period = 1000L
    val got = Sharding.systematicSample(df, "id", "w", period)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // naive single-pass reference over ascending id (zero-weight rows
    // have empty intervals — and must be skipped BEFORE the division:
    // (cum-1)/period at cum=0 is -1/period, where truncating and
    // flooring engines disagree; the operator filters them for the
    // same reason)
    var cum = 0L
    val expect = rows.sortBy(_._1).flatMap { case (id, w) =>
      val before = cum; cum += w
      val first = (before + period - 1) / period
      val last = (cum - 1) / period
      if (w > 0 && first <= last) Some(id -> ((w, first, last - first + 1)))
      else None
    }.toMap
    assert(got == expect)
    // partition property: ticks 0..floor((total-1)/period) each land on
    // exactly one document
    val totalTicks = (cum - 1) / period + 1
    assert(got.values.map(_._3).sum == totalTicks)
    assert(rows.filter(_._2 >= period).forall { case (id, _) => got.contains(id) })
    assert(rows.filter(_._2 == 0L).forall { case (id, _) => !got.contains(id) })
  }

  test("epoch shuffle: each epoch is the exact global (hash, id) rank; epochs differ") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val ids = (0L until 200L).map(i => i * 37 % 1009) // sparse, shuffled ids
    val df = spark.createDataFrame(
      ids.map(i => org.apache.spark.sql.Row(i)).asJava,
      StructType(Seq(StructField("doc_id", LongType))))
    val got = Sharding.epochShuffle(df, "doc_id", epochs = 3, nBuckets = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val coeffs = TextOps.hashCoeffs(3)
    (0 until 3).foreach { e =>
      val (a, b) = coeffs(e)
      val expect = ids.sortBy(id => ((a * (id % TextOps.P) + b) % TextOps.P, id))
        .zipWithIndex.map { case (id, pos) => (e.toLong, id) -> pos.toLong }.toMap
      expect.foreach { case (k, v) =>
        assert(got(k) == v, s"epoch $e rank mismatch at $k")
      }
    }
    val order0 = ids.sortBy(id => got((0L, id)))
    val order1 = ids.sortBy(id => got((1L, id)))
    assert(order0 != order1, "distinct epochs must produce distinct orders")
  }

  /** Driver-side reference of [[Dedup.cdcChunks]]'s boundary rule. */
  private def naiveCdc(text: String, k: Int, divisor: Int): Seq[String] = {
    val (a, b) = TextOps.hashCoeffs(1).head
    def code(i0: Int): Long =
      (0 until k).map(d => text.charAt(i0 + d).toLong * TextOps.pow128(k - 1 - d)).sum
    val cuts = (0 to text.length - k).collect {
      case i0 if ((a * (code(i0) % TextOps.P) + b) % TextOps.P) % divisor == 0 =>
        i0 + k
    }
    val bnds = (0 +: cuts :+ text.length).distinct
    bnds.sliding(2).collect { case Seq(s0, e0) => text.substring(s0, e0) }.toSeq
  }

  test("cdc chunks: exact coverage, dense indexes, naive-reference equality") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 12L).map(i =>
      (i, (0 until 150 + rnd.nextInt(250))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
    val got = Dedup.cdcChunks(docsDF(docs), "doc_id", "text", k = 8, divisor = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(c => (c._2, c._3)) }
    docs.foreach { case (id, text) =>
      val chunks = got(id)
      assert(chunks.map(_._1).toSeq == (1L to chunks.length).toSeq,
        s"doc $id indexes not dense")
      assert(chunks.map(_._2).mkString == text, s"doc $id chunks don't cover text")
      assert(chunks.map(_._2).toSeq == naiveCdc(text, 8, 16).toSeq,
        s"doc $id boundary mismatch")
    }
  }

  test("cdc chunks: boundaries re-align after an insertion (shift tolerance)") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = "zzzzz" + base // insertion at the front shifts every char
    val a = naiveCdc(base, 8, 16)
    val b = naiveCdc(shifted, 8, 16)
    // content-defined boundaries depend only on local windows, so all
    // chunks after the first cut are byte-identical despite the shift —
    // the property fixed-size blocking cannot have
    val shared = a.toSet.intersect(b.toSet)
    assert(a.size >= 3, s"fixture too short, only ${a.size} chunks")
    assert(shared.size >= a.size - 2,
      s"expected re-alignment, shared only ${shared.size} of ${a.size}")
  }

  test("token entropy and mixture weights: hand-computed fixtures") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val ent = TextAnalysis.tokenEntropy(
      docsDF(Seq((0L, "a a b"), (1L, "x x x x"))), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // doc 0: N=3 types=2; clnc = 2*round(ln2*1000) = 1386;
    // H_milli = round(ln3*1000) - 1386 DIV 3 = 1099 - 462 = 637
    assert(ent(0L) == ((3L, 2L, 0.666667, 637L)), s"got ${ent(0L)}")
    // doc 1: uniform single type -> entropy 1386 - (4*1386) DIV 4 = 0
    assert(ent(1L) == ((4L, 1L, 0.25, 0L)), s"got ${ent(1L)}")

    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(0L, "en", "one two three"),
      org.apache.spark.sql.Row(1L, "en", "four five six"),
      org.apache.spark.sql.Row(2L, "fr", "un deux")).asJava,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("text", StringType))))
    val mw = Sharding.mixtureWeights(df, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // en: 2 docs 6 tokens, fr: 1 doc 2 tokens, total 8, n_domains 2
    assert(mw("en") == ((2L, 6L, 0.75, 8000000L / 12L)), s"got ${mw("en")}")
    assert(mw("fr") == ((1L, 2L, 0.25, 8000000L / 4L)), s"got ${mw("fr")}")
  }

  test("bloom probe: no false negatives; empty prior flags nothing") {
    // batch doc 10 duplicates prior doc 1 -> MUST be bloom_hit+exact_dup
    // (soundness); doc 11 is novel (tiny filter may or may not FP, but
    // sound stays true either way)
    val prior = docsDF(Seq((1L, "alpha beta gamma"), (3L, "delta epsilon")))
    val batch = docsDF(Seq((10L, "alpha beta gamma"), (11L, "zeta eta")))
    val res = Dedup.bloomProbe(prior, batch, "doc_id", "text",
        mBits = 64, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(res(10L) == ((true, true, true)), s"got ${res(10L)}")
    assert(res(11L)._3, "sound must hold for novel docs")
    // empty prior: nothing can hit (no set bits at all)
    val res2 = Dedup.bloomProbe(prior.limit(0), batch, "doc_id", "text",
        mBits = 64, k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(res2.values.forall(_ == false), s"empty prior must not hit: $res2")
  }

  test("length buckets: boundary, clamp, and waste accounting") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    // 16 tokens -> bucket 16 (boundary inclusive); 17 -> 32; 5000 -> clamp
    // 1024 with real_tokens capped at the bucket (truncation bucket)
    val df = docsDF(Seq(
      (0L, Seq.fill(16)("w").mkString(" ")),
      (1L, Seq.fill(17)("w").mkString(" ")),
      (2L, Seq.fill(2000)("w").mkString(" "))))
    val res = Sharding.lengthBuckets(df, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(res(16L) == ((1L, 16L, 16L, 0.0)), s"got ${res(16L)}")
    assert(res(32L) == ((1L, 17L, 32L, 0.46875)), s"got ${res(32L)}")
    assert(res(1024L) == ((1L, 1024L, 1024L, 0.0)), s"got ${res(1024L)}")
  }

  test("hamming pairs over a precomputed fingerprint: lossless vs naive") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    val fps = (0L until 60L).map(i => (i, (rnd.nextInt(1 << 16)).toLong))
    val df = spark.createDataFrame(
      fps.map { case (i, h) => org.apache.spark.sql.Row(i, h) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("fp", LongType))))
    val got = Dedup.hammingPairs(df, "id", "fp", bits = 16, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == want, s"pigeonhole must equal naive: ${got.size} vs ${want.size}")
  }

  test("lexical knn is symmetric in discovery and respects topK") {
    val df = docsDF(Seq(
      (0L, "the quick brown fox jumps over the lazy dog today ok"),
      (1L, "the quick brown fox jumps over the lazy dog daily ok"),
      (2L, "completely different content with nothing shared at all here")))
    val res = Dedup.lexicalKnn(df, "doc_id", "text", k = 8, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // 0 and 1 must each list the other as rank 1; doc 2 shares nothing
    assert(res.contains((0L, 1L, 1L)) && res.contains((1L, 0L, 1L)), res.toSeq)
    assert(!res.exists(_._1 == 2L), "doc 2 shares no shingle, no neighbors")
    assert(res.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("pagerank: hub dominates a star, leaves tie, mass is conserved up to floor loss") {
    import spark.implicits._
    // undirected star: center 0 <-> leaves 1..6
    val es = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val r = Graph.pageRank(es, "src", "dst", iterations = 5).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r.size == 7)
    val leaves = (1L to 6L).map(r)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie: $leaves")
    assert(r(0L) > leaves.head * 3, s"hub must dominate: $r")
    // damped update conserves total mass up to integer-floor loss, which
    // only ever shrinks the total: n*unit is a hard upper bound
    val total = r.values.sum
    assert(total <= 7L * 1000000L && total > 6L * 1000000L, s"total=$total")
  }

  test("pagerank: isolated sink settles at base; determinism across runs") {
    import spark.implicits._
    // 1 -> 2 -> 3 chain: node 1 has no inbound edges -> rank = base
    val es = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val run = () => Graph.pageRank(es, "src", "dst", iterations = 4).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val r = run()
    assert(r(1L) == 150000L, s"no-inbound node must sit at base: $r")
    assert(r(3L) > r(2L) && r(2L) > r(1L), s"downstream accumulates: $r")
    assert(run() == r, "iterative integer update must be deterministic")
  }

  test("degree profile: counts, distinct neighbors, full outer over one-sided nodes") {
    import spark.implicits._
    val es = Seq((1L, 2L), (1L, 2L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    val r = Graph.degreeProfile(es, "src", "dst").collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((3L, 1L, 2L))) // out 3 (dup edge counts), in 1, 2 distinct nbrs
    assert(r(2L) == ((0L, 2L, 0L))) // dst-only node appears with zero out
    assert(r(4L) == ((1L, 0L, 1L)))
  }

  test("triangle counts: K4 has 4 triangles touching every node 3 times") {
    import spark.implicits._
    // complete graph on 4 nodes (edges given in mixed orientation + a dup)
    val es = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L)).toDF("a", "b")
    val r = Graph.triangleCounts(es, "a", "b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // K4 has C(4,3)=4 triangles; each node sits in exactly 3
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), r)
    // removing one edge kills the two triangles through it
    val r2 = Graph.triangleCounts(es.where(!(col("a") === 3 && col("b") === 4)),
        "a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r2 == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L), r2)
  }

  test("cooccurrence: shared-user counts; power users dropped by the degree cap") {
    import spark.implicits._
    val rel = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L),
      (1L, 10L), // duplicate interaction collapses
      (9L, 10L), (9L, 20L), (9L, 30L), (9L, 40L)) // power user
      .toDF("u", "it")
    val all = Graph.cooccurrence(rel, "u", "it", minShared = 2L,
        maxUserDegree = 1000).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(all == Map((10L, 20L) -> 4L), all) // users 1,2,3,9
    val capped = Graph.cooccurrence(rel, "u", "it", minShared = 2L,
        maxUserDegree = 3).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(capped == Map((10L, 20L) -> 3L), capped) // 9 dropped (degree 4)
  }

  test("triangle counts match naive enumeration on random graphs") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    (0 until 5).foreach { _ =>
      val n = 9
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if r.nextInt(10) < 4
      } yield (a.toLong, b.toLong))
      if (edges.nonEmpty) {
        val adj = edges.toSet
        def conn(x: Long, y: Long) = adj.contains((x min y, x max y))
        val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
             if conn(a, b) && conn(b, c) && conn(a, c)) {
          naive(a) += 1; naive(b) += 1; naive(c) += 1
        }
        val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
          .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
        assert(got == naive.toMap, s"edges=$edges")
      }
    }
  }

  test("pagerank: random-graph mass bound and base floor") {
    import spark.implicits._
    val r = new scala.util.Random(13)
    val edges = (0 until 40).map(_ => (r.nextInt(12).toLong, r.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    val ranks = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iterations = 6).collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val n = ranks.size
    // damped update conserves mass up to floor loss (never gains)
    assert(ranks.values.sum <= n.toLong * 1000000L, ranks)
    // every node receives at least the teleport base
    assert(ranks.values.forall(_ >= 150000L), ranks)
  }

  test("kneser-ney bigrams match a naive exact-rational reference") {
    val r = new scala.util.Random(29)
    val vocab = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val docs = docsDF((0L until 20L).map { i =>
      (i, (0 until 3 + r.nextInt(10)).map(_ => vocab(r.nextInt(vocab.size)))
        .mkString(" "))
    })
    // naive reference: BigInt rationals, identical floor
    val toks = docs.collect().map(_.getString(1).split(" ").filter(_.nonEmpty))
    val bg = toks.flatMap(t => t.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val c = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = c.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nr = c.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val nl = c.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val t = c.size.toLong
    val expect = c.map { case ((w1, w2), cnt) =>
      val num = BigInt(1000000) *
        (BigInt((4 * cnt - 3) max 0) * t + BigInt(3) * nr(w1) * nl(w2))
      val den = BigInt(4) * c1(w1) * t
      (w1, w2, cnt, (num / den).toLong)
    }.toSet
    val got = TextAnalysis.kneserNeyBigrams(docs, "text").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(got == expect)
    // per-context sum-to-one identity: observed micro mass + exact backoff
    // mass of unobserved continuations = 1e6, within per-term floor loss
    val byW1 = expect.groupBy(_._1)
    byW1.foreach { case (w1, rows) =>
      val observed = rows.toSeq.map(_._4).sum
      val unobservedMass = (BigInt(1000000) * BigInt(3) * nr(w1) *
        (t - rows.toSeq.map(x => nl(x._2)).sum)) / (BigInt(4) * c1(w1) * t)
      val total = observed + unobservedMass.toLong
      assert(total <= 1000000L && total >= 1000000L - rows.size - 1,
        s"w1=$w1 total=$total")
    }
  }

  test("power-iteration PC: unit norm, deterministic, finds the planted axis") {
    import spark.implicits._
    val r = new scala.util.Random(31)
    // planted anisotropy: dimension 5 carries 10x the variance
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(16)(d =>
        (r.nextDouble() - 0.5).toFloat * (if (d == 5) 10f else 1f)).toSeq)
    }.toDF("vec_id", "embedding")
    val m = Similarity.powerIterationPC(emb, "embedding", dims = 16, iters = 3)
    assert(m.length == 16)
    val norm = m.map(x => (x / 1e6) * (x / 1e6)).sum
    assert(math.abs(norm - 1.0) < 1e-3, s"not unit: $norm")
    assert(m.zipWithIndex.maxBy(x => math.abs(x._1))._2 == 5,
      s"planted axis not dominant: ${m.toSeq}")
    assert(Similarity.powerIterationPC(emb, "embedding", 16, 3).toSeq == m.toSeq,
      "must be deterministic")
  }

  test("centroid outliers: threshold slices exactly the low-best-sim vectors") {
    import spark.implicits._
    val emb = (0L until 30L).map { i =>
      (i, Array.tabulate(64)(d => (((i * 17 + d * 5) % 23).toFloat / 23f) - 0.4f).toSeq)
    }.toDF("vec_id", "embedding")
    val all = Similarity.centroidOutliers(emb, "vec_id", "embedding",
      nCentroids = 8, maxSim = Double.MaxValue).collect()
    assert(all.length == 30, "with no threshold every vector appears once")
    val sims = all.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cut = sims.values.toSeq.sorted.apply(10) // admit exactly 10 below
    val out = Similarity.centroidOutliers(emb, "vec_id", "embedding",
      nCentroids = 8, maxSim = cut).collect().map(_.getLong(0)).toSet
    assert(out == sims.filter(_._2 < cut).keySet)
  }

  test("label propagation: r rounds = min id within r hops; components stay separate") {
    import spark.implicits._
    // path 1-2-3-4-5 plus disjoint pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val l3 = Graph.labelPropagation(edges, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 5 is 4 hops from 1: after 3 rounds its label is min within 3 hops = 2
    assert(l3 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L,
      10L -> 10L, 11L -> 10L), s"got $l3")
    val l4 = Graph.labelPropagation(edges, "a", "b", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l4(5L) == 1L, "one more round reaches the component min")
  }

  test("shingles distinct: per-doc array_distinct equals corpus-wide distinct") {
    // r13 rewrote shingles(distinct = true) from explode-then-.distinct()
    // to array_distinct-then-explode (zero-shuffle). With one row per id —
    // the documented caller contract — the (id, code) sets must be
    // identical even when texts repeat shingles internally.
    val df = docsDF(Seq(
      (0L, "abc abc abc abc abc"),            // heavy internal repeats
      (1L, "xyz xyz abc abc xyz xyz"),
      (2L, "ab"),                              // shorter than k → no codes
      (3L, "the quick brown fox the quick brown fox")))
    for (k <- Seq(4, 8)) {
      val got = TextOps.shingles(df, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reference = df.select(col("doc_id"),
          explode(graft.functions.GraftFunctions.shingle_codes(col("text"), k)).as("code"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == reference, s"k=$k distinct shingle sets diverge")
      // and no duplicates leak through the per-doc dedup
      val rows = TextOps.shingles(df, "doc_id", "text", k).collect()
      assert(rows.length == got.size, s"k=$k duplicate (id, code) rows")
    }
  }

  test("binary quant: bits match a scala reference; hamming ranks self-similar first") {
    import spark.implicits._
    val vecs = (0L until 12L).map { i =>
      (i, Array.tabulate(64)(d => (((i * 31 + d * 7) % 19).toFloat / 19f) - 0.3f).toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val codes = Similarity.binaryQuantCodes(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // scala reference: same micro quantization and mean test
    def micro(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val n = vecs.size.toLong
    val sums = (0 until 64).map(d => vecs.map(v => micro(v._2(d))).sum)
    vecs.foreach { case (id, v) =>
      def word(lo: Int): Long = (lo until lo + 32).map { d =>
        if (micro(v(d)) * n > sums(d)) 1L << (d - lo) else 0L
      }.sum
      assert(codes(id) == ((word(0), word(32))), s"code mismatch for $id")
    }
    // a vector duplicated under a new id must rank at hamming 0
    val withDup = (vecs :+ (99L, vecs(3)._2)).toDF("vec_id", "embedding")
    val c2 = Similarity.binaryQuantCodes(withDup, "vec_id", "embedding")
    val top = Similarity.hammingTopKWords(
      c2.where(col("vec_id") === 99L), c2, "vec_id", Seq("bq0", "bq1"), k = 1)
      .collect()(0)
    assert(top.getLong(1) == 3L && top.getLong(3) == 0L)
  }

  test("label propagation equals min-id-within-r-hops BFS on random graphs") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    (0 until 3).foreach { _ =>
      val n = 12 + r.nextInt(8)
      val edges = (0 until n * 2).map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val rounds = 1 + r.nextInt(3)
        val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
        val got = Graph.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        got.foreach { case (node, label) =>
          // BFS reference: min id reachable within `rounds` hops
          var frontier = Set(node); var seen = Set(node)
          (1 to rounds).foreach { _ =>
            frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
            seen ++= frontier
          }
          assert(label == seen.min, s"node $node rounds $rounds: $label != ${seen.min}")
        }
      }
    }
  }

  test("kcore prune run to fixpoint equals the classic iterative peel") {
    import spark.implicits._
    val r = new scala.util.Random(13)
    (0 until 3).foreach { _ =>
      val n = 14
      val edges = (0 until n * 3).map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val k = 2L + r.nextInt(2)
      // scala reference: peel until stable, counting the rounds needed
      var es = (edges ++ edges.map(_.swap)).toSet
      var changed = true
      var peelRounds = 0
      while (changed) {
        val deg = es.groupBy(_._1).map { case (v, l) => v -> l.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = es.filter { case (a, b) => keep(a) && keep(b) }
        changed = next != es; es = next
        if (changed) peelRounds += 1
      }
      val want = es.groupBy(_._1).map { case (v, l) => v -> l.size.toLong }
      // peelRounds + 1 rounds reach the fixpoint (each non-final round
      // removes >= 1 node); running exactly that many keeps the chained
      // lineage shallow enough for analysis
      val got = Graph.kCorePrune(edges.toDF("a", "b"), "a", "b", k,
          rounds = peelRounds + 1)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == want, s"k=$k got $got want $want")
    }
  }

  test("kcore prune: tail peels away round by round, the core survives intact") {
    import spark.implicits._
    // K4 core {1,2,3,4} plus a chain 4-5-6: at k=3 the whole chain falls
    // and only the clique survives, every node at degree 3
    val core = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (core ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val out = Graph.kCorePrune(edges, "a", "b", k = 3L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $out")
    // with only 1 round the chain's middle node is still present
    val r1 = Graph.kCorePrune(edges, "a", "b", k = 2L, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(r1 == Set(1L, 2L, 3L, 4L, 5L), s"got $r1")
  }

  test("mmr rerank: near-duplicate of the top hit is demoted below a diverse doc") {
    import spark.implicits._
    // query 100 at the origin direction; docs 0/1 nearly identical and most
    // relevant; doc 2 less relevant but orthogonal-ish. Pure top-2 would
    // pick {0, 1}; MMR must pick {0, 2} at lambda = 0.7.
    def v(main: Double, alt: Double, jitter: Double): Seq[Float] =
      (Array(main, alt, jitter) ++ Array.fill(61)(0.0)).map(_.toFloat).toSeq
    // sim(q,0) = sim(q,1) = 0.8, sim(1,0) ~ 1.0, sim(q,2) = 0.75,
    // sim(2,0) = 0.6: round-2 scores 7*800k - 3*1000k = 2.6M for the
    // near-dup vs 7*750k - 3*600k = 3.45M for the diverse doc.
    val emb = Seq(
      (100L, v(1.0, 0.0, 0.0)),        // query
      (0L, v(0.8, 0.6, 0.0)),          // top hit
      (1L, v(0.8, 0.6, 0.001)),        // near-dup of 0
      (2L, v(0.75, 0.0, -0.661)),      // diverse, nearly as relevant
      (3L, v(-1.0, 0.2, 0.0))          // irrelevant
    ).toDF("vec_id", "embedding")
    val sel = Similarity.mmrRerank(
      emb.where(col("vec_id") === 100L), emb.where(col("vec_id") < 100L),
      "vec_id", "embedding", kCand = 4, kSel = 2)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(sel(1L) == 0L, "round 1 is pure relevance")
    assert(sel(2L) == 2L, s"round 2 must diversify away from the near-dup: $sel")
    // sanity: pure top-2 WOULD have chosen the near-dup
    val top2 = Similarity.bruteForceTopK(
      emb.where(col("vec_id") === 100L), emb.where(col("vec_id") < 100L),
      "vec_id", "embedding", k = 2).collect().map(_.getLong(1)).toSet
    assert(top2 == Set(0L, 1L))
  }

  test("farthest points equals a naive greedy k-center on random vectors") {
    import spark.implicits._
    val r = new scala.util.Random(31)
    val vecs = (0L until 25L).map { i =>
      (i, Array.fill(64)((r.nextDouble() - 0.5).toFloat).toSeq)
    }
    val got = Similarity.farthestPoints(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    // naive reference with the same q6->micro cosine
    def cos(a: Seq[Float], b: Seq[Float]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      val q6 = math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6
      math.floor(q6 * 1e6 + 0.5).toLong
    }
    var sel = Seq(0L)
    (2 to 4).foreach { _ =>
      val cand = vecs.filterNot(v => sel.contains(v._1))
        .map { case (id, v) => (id, sel.map(s => cos(v, vecs(s.toInt)._2)).max) }
      val best = cand.minBy { case (id, ms) => (ms, id) }
      sel = sel :+ best._1
    }
    assert(got.map(_._2).toSeq == sel, s"got ${got.toSeq} want $sel")
  }

  test("format sniff: detection follows magic bytes, not the declared mime") {
    import spark.implicits._
    val payloads = Seq(
      (0L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 1, 2)),
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 9)),
      (2L, "RIFF1234WAVEdata".getBytes("UTF-8")),
      (3L, "just plain text".getBytes("UTF-8")),
      (4L, "RIFF1234XXXX".getBytes("UTF-8"))) // RIFF but not WAVE
      .toDF("doc_id", "payload")
    val wrapped = Multimodal.wrap(payloads, "doc_id", "payload",
      lit("application/octet-stream"), Seq.empty)
    val got = Multimodal.formatSniff(wrapped).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(0L) == (("image/jpeg", 3L)))
    assert(got(1L) == (("image/png", 4L)))
    assert(got(2L) == (("audio/wav", 12L)))
    assert(got(3L) == (("application/octet-stream", 0L)))
    assert(got(4L) == (("application/octet-stream", 0L)))
  }

  test("duplicated spans: diagonal seeds merge into maximal spans, split runs stay split") {
    // docs 0/1 share the 7-word run s1..s7 (overlapping 4-gram seeds at a
    // single diagonal -> ONE maximal span); doc 3 shares only the two
    // edge grams with each, at different diagonals -> separate 4-word
    // spans; doc 2 shares nothing
    val df = docsDF(Seq(
      (0L, "x1 x2 s1 s2 s3 s4 s5 s6 s7 y1 y2"),
      (1L, "z1 s1 s2 s3 s4 s5 s6 s7 z2 z3 z4"),
      (2L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q0 qa"),
      (3L, "s1 s2 s3 s4 m1 m2 m3 m4 m5 s4 s5 s6 s7")))
    val got = Dedup.duplicatedSpans(df, "doc_id", "text",
        k = 4, maxGramFreq = 20, minSpanWords = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      (0L, 1L, 3L, 2L, 7L, 4L),  // the full run: span 7 words, 4 seeds
      (0L, 3L, 3L, 1L, 4L, 1L), (0L, 3L, 6L, 10L, 4L, 1L),
      (1L, 3L, 2L, 1L, 4L, 1L), (1L, 3L, 5L, 10L, 4L, 1L)))
  }

  test("duplicated spans: planted shared runs recover at exact position and full length") {
    val r = new scala.util.Random(7)
    (0 until 8).foreach { trial =>
      val runLen = 4 + r.nextInt(8)
      val run = (0 until runLen).map(i => s"s${trial}x$i")
      def filler(tag: String, n: Int) = (0 until n).map(i => s"${tag}f$i")
      val pa = 1 + r.nextInt(5)
      val pb = 1 + r.nextInt(5)
      val docA = (filler(s"qa$trial", pa) ++ run ++ filler(s"za$trial", 3 + r.nextInt(4))).mkString(" ")
      val docB = (filler(s"qb$trial", pb) ++ run ++ filler(s"zb$trial", 3 + r.nextInt(4))).mkString(" ")
      val got = Dedup.duplicatedSpans(docsDF(Seq((0L, docA), (1L, docB))),
        "doc_id", "text").collect()
      assert(got.length == 1, s"trial $trial found ${got.length} spans")
      val row = got.head
      assert((row.getLong(2), row.getLong(3), row.getLong(4)) ==
        (((pa + 1).toLong, (pb + 1).toLong, runLen.toLong)),
        s"trial $trial: planted at (${pa + 1}, ${pb + 1}) len $runLen, got $row")
    }
  }

  test("span removal: intervals union across partners, duplicates collapse") {
    val df = docsDF(Seq(
      (0L, "x1 x2 s1 s2 s3 s4 s5 s6 s7 y1 y2"),
      (1L, "z1 s1 s2 s3 s4 s5 s6 s7 z2 z3 z4"),
      (3L, "s1 s2 s3 s4 m1 m2 m3 m4 m5 s4 s5 s6 s7")))
    val got = Dedup.spanRemovalStats(df, "doc_id", "text",
        k = 4, maxGramFreq = 20, minSpanWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: kept side of (0,1) — one 7-word span at words [2,9)
    assert(got(1L) == ((11L, 7L, 1L, 636L)))
    // doc 3: kept side of (0,3) AND (1,3) — identical [1,5)+[10,14)
    // intervals from both partners collapse into two 4-word islands
    assert(got(3L) == ((13L, 8L, 2L, 615L)))
    assert(!got.contains(0L)) // lowest id never loses content
  }

  test("gopher rules: each rule gates independently and the mask names the killer") {
    val good = (1 to 30).map(i => s"the word and of to is a in that w$i").mkString(" ")
    val df = docsDF(Seq(
      (0L, good),                              // passes everything
      (1L, "too short doc"),                   // r1 (word count) fails
      (2L, (1 to 30).map(_ => "@#$%!").mkString(" ") + " the of"), // symbols + no alpha
      (3L, (1 to 20).map(i => "supercalifragilisticexpialidocious").mkString(" ")))) // mwl + stopwords fail
    val got = TextAnalysis.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(6), r.getLong(7))).toMap
    assert(got(0L) == ((31L, 1L)))
    assert((got(1L)._1 & 1L) == 0L && got(1L)._2 == 0L)     // word count rule off
    assert((got(2L)._1 & 8L) == 0L && (got(2L)._1 & 16L) == 0L) // symbol + alpha off
    assert((got(3L)._1 & 2L) == 0L && (got(3L)._1 & 4L) == 0L)  // mwl + stopword off
  }

  test("balanced assign: caps cells at capacity, spills keep their second choice") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val cap = (n + 7) / 8
    val bal = Similarity.balancedAssign(emb, "vec_id", "embedding", 8, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bal.length == n)
    val ivf = Similarity.ivfAssign(emb, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    // non-spilled rows sit in their unconstrained-best cell; spilled ones don't
    bal.foreach { case (id, cell, moved) =>
      if (moved == 0L) assert(cell == ivf(id), s"vec $id moved without flag")
      else assert(cell != ivf(id), s"vec $id flagged but kept cell")
    }
    // every cell holds at most cap NON-SPILLED members (spill targets may
    // exceed cap — single rebalance round, documented)
    val kept = bal.filter(_._3 == 0L).groupBy(_._2).map(_._2.size)
    assert(kept.forall(_ <= cap))
    val expectedSpills = ivf.values.groupBy(identity)
      .map { case (_, v) => math.max(0L, v.size - cap) }.sum
    assert(bal.count(_._3 == 1L) == expectedSpills)
  }

  test("temperature mix: alpha=0.5 weights are exact integer sqrt ratios") {
    val df = docsDF(Seq(
      (0L, (1 to 100).map(i => s"a$i").mkString(" ")),   // en: 100 tokens
      (1L, (1 to 400).map(i => s"b$i").mkString(" "))))  // fr: 400 tokens
      .withColumn("lang", when(col("doc_id") === 0L, "en").otherwise("fr"))
    val got = graft.operators.Sharding.temperatureMix(df, "lang", "text", sampleN = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("en") == ((100L, 10000L, 333333L, 333L))) // sqrt(100)=10 exactly
    assert(got("fr") == ((400L, 20000L, 666666L, 666L)))
  }

  test("hash embedding: mass equals token count; doubling tokens doubles values") {
    val df = docsDF(Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta alpha beta gamma delta")))
    val got = TextAnalysis.hashEmbedding(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d0 = got.filter(_._1._1 == 0L)
    // |val| sums to the token count when no two tokens collide+cancel
    assert(d0.values.map(math.abs).sum == 4L)
    assert(d0.keys.forall { case (_, dim) => dim >= 0 && dim < 64 })
    // doc 1 = doc 0 twice: every dim value exactly doubles
    d0.foreach { case ((_, dim), v) => assert(got((1L, dim)) == 2 * v) }
  }

  test("adamic-adar: rare shared items outweigh popular ones; hub items dropped") {
    val rel = spark.createDataFrame(Seq(
      (1L, 101L), (2L, 101L),                             // deg 2 — rare
      (1L, 102L), (2L, 102L), (3L, 102L),                 // deg 3
      (1L, 109L), (2L, 109L), (3L, 109L), (4L, 109L)))    // deg 4 — hub
      .toDF("u", "it")
    val got = Graph.adamicAdar(rel, "u", "it", maxItemDegree = 3, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val w2 = math.floor(1e6 / math.log(2) + 0.5).toLong
    val w3 = math.floor(1e6 / math.log(3) + 0.5).toLong
    assert(w2 > w3) // rarer item carries more weight
    assert(got((1L, 2L)) == ((2L, w2 + w3)))
    assert(got((1L, 3L)) == ((1L, w3)))
    assert(got((2L, 3L)) == ((1L, w3)))
    // user 4 shares only the capped hub item — no pair survives
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("bottom_k aggregate: k smallest distinct values survive partial/merge across partitions") {
    import spark.implicits._
    // values deliberately duplicated and scattered over 8 partitions so
    // the TypedImperativeAggregate's update→serialize→merge path runs
    val vals = (0 until 500).map(i => (i % 3).toString -> ((i * 2654435761L) % 10007))
    val df = vals.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(graft.functions.GraftFunctions.bottom_k(col("v"), 10).as("bk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val expect = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(10)
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (g, e) => assert(got(g) == e, s"group $g") }
    // fewer than k distinct values → the full sorted distinct set
    val small = Seq(("a", 5L), ("a", 1L), ("a", 5L)).toDF("g", "v")
      .groupBy("g").agg(graft.functions.GraftFunctions.bottom_k(col("v"), 10).as("bk"))
      .head.getSeq[Long](1)
    assert(small == Seq(1L, 5L))
  }

  test("hdr_hist_sketch: bucket map matches a reference fold regardless of partitioning; rank bracket holds") {
    import spark.implicits._
    import graft.functions.HdrHistSketch
    // reference fold of bucket -> (cnt, min, max) over the raw values
    def refHist(vs: Seq[Long]): Map[Long, (Long, Long, Long)] =
      vs.groupBy(HdrHistSketch.bucketOf).map { case (b, g) =>
        b -> ((g.size.toLong, g.min, g.max))
      }
    // adversarial values: 0, exact powers of two, bucket-boundary ±1,
    // and a pseudo-random spread; scattered over 8 partitions so the
    // update→serialize→merge path runs and merge ORDER varies
    val vs = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 31L, 32L, 1023L, 1024L) ++
      (0 until 500).map(i => (i * 2654435761L) % 100003)
    val got = vs.toDF("v").repartition(8)
      .agg(graft.functions.GraftFunctions.hdr_hist_sketch(col("v")).as("h"))
      .select(explode(col("h")).as("b"))
      .select(col("b.bucket"), col("b.cnt"), col("b.vmin"), col("b.vmax"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == refHist(vs))
    // rank guarantee: for every q, the true quantile value lies inside
    // the [vmin, vmax] of the bucket holding rank ceil(q·n/1000)
    val sorted = vs.sorted
    val hist = refHist(vs).toSeq.sortBy(_._1)
    Seq(250L, 500L, 750L, 900L, 990L).foreach { q =>
      val rank = (q * vs.size + 999) / 1000
      val trueQ = sorted((rank - 1).toInt)
      var cum = 0L
      val picked = hist.find { case (_, (c, _, _)) => cum += c; cum >= rank }.get
      assert(trueQ >= picked._2._2 && trueQ <= picked._2._3,
        s"q=$q rank=$rank true=$trueQ bucket=$picked")
    }
    // bucketOf is monotone (order-preserving), the property the rank
    // walk's correctness rests on
    val probes = (0L to 2048L) ++ Seq(1L << 40, (1L << 40) + 1, Long.MaxValue)
    probes.sliding(2).foreach { case Seq(a, b) =>
      assert(HdrHistSketch.bucketOf(a) <= HdrHistSketch.bucketOf(b), s"$a,$b")
    }
  }

  test("HITS integer recurrence matches a BigInt reference; smaller-unit seed path agrees") {
    import spark.implicits._
    // the judge-flagged path: unit²·n_users must stay under 2⁶³, so large
    // graphs seed with a SMALLER unit — prove the recurrence is exact for
    // both the default and a small-unit seed against a BigInt replay
    val edges = Seq(
      ("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "c"),
      ("u3", "b"), ("u3", "c"), ("u4", "c"), ("u4", "d"))
    val df = edges.toDF("user_id", "item")
    def reference(unit: Long, iters: Int): Map[(String, String), Long] = {
      val us = edges.map(_._1).distinct
      val its = edges.map(_._2).distinct
      var hub: Map[String, BigInt] = us.map(_ -> BigInt(unit)).toMap
      var auth: Map[String, BigInt] = Map.empty
      for (_ <- 1 to iters) {
        val rawA = its.map(i =>
          i -> edges.filter(_._2 == i).map(e => hub(e._1)).sum).toMap
        val totA = rawA.values.sum
        auth = rawA.map { case (k, v) => k -> v * unit / totA }
        val rawH = us.map(u =>
          u -> edges.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
        val totH = rawH.values.sum
        hub = rawH.map { case (k, v) => k -> v * unit / totH }
      }
      hub.map { case (k, v) => (k, "hub") -> v.toLong } ++
        auth.map { case (k, v) => (k, "auth") -> v.toLong }
    }
    for (unit <- Seq(1000000L, 1000L)) {
      val got = Graph.hits(df, "user_id", "item", iterations = 3, unit = unit)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == reference(unit, 3), s"unit $unit: $got")
    }
  }

  test("KMV distinct estimate is exact below k and within theory error above it") {
    import spark.implicits._
    // 2000 distinct items in one group, 50 in another
    val items = (0 until 2000).map(i => ("big", s"tok$i")) ++
      (0 until 50).map(i => ("small", s"s$i"))
    val df = items.toDF("g", "item").repartition(8)
    val got = Sketches.kmvDistinct(df, "g", "item", 128).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (bigExact, bigK, bigEst) = got("big")
    assert(bigExact == 2000L && bigK == 128L)
    // KMV std error ≈ 1/sqrt(k-1) ≈ 9%; allow 4σ
    assert(math.abs(bigEst - 2000L) < 2000 * 0.36, s"est $bigEst")
    val (smallExact, smallK, smallEst) = got("small")
    assert(smallExact == 50L && smallK == 50L && smallEst == 50L) // exact below k
  }

  test("harmonic centrality: path-graph distances, truncation, multi-root sums") {
    import spark.implicits._
    // path 1-2-3-4-5
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val single = Graph.harmonicCentrality(es, "a", "b", col("node") === 1,
        rounds = 3).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    // from root 1: d(2)=1, d(3)=2, d(4)=3; 5 is 4 hops -> truncated out
    assert(single == Map(2L -> ((1L, 1000000L)), 3L -> ((1L, 500000L)),
      4L -> ((1L, 333333L))), single)
    val multi = Graph.harmonicCentrality(es, "a", "b", col("node") % 2 === 1,
        rounds = 3).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(multi(2L) == ((3L, 2333333L)), multi) // roots 1,3 at d1; 5 at d3
    assert(multi(1L) == ((1L, 500000L)), multi) // root 3 at d2; 5 truncated
    assert(multi(3L) == ((2L, 1000000L)), multi) // roots 1,5 at d2 each
    assert(multi(4L) == ((3L, 2333333L)), multi)
  }

  test("random walks: hash-driven picks match a naive replay; edges respected") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    val rows = Graph.randomWalks(es, "a", "b", col("node") % 2 === 1, steps = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val walks = rows.groupBy(_._1)
    assert(walks.keySet == Set(1L, 3L))
    // symmetrized adjacency, neighbors in dst order (the row_number index)
    val adj = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(1L, 3L))
    def fnvPos(v: String): Long = {
      var h = 0xcbf29ce484222325L
      v.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h & Long.MaxValue
    }
    for ((w, wr) <- walks) {
      val byStep = wr.sortBy(_._2).map(_._3)
      assert(byStep.length == 5 && byStep.head == w, s"walk $w: $byStep")
      var cur = w
      for (t <- 1 to 4) {
        val nbrs = adj(cur)
        val expect = nbrs((fnvPos(s"$w:$t") % nbrs.length).toInt)
        assert(byStep(t) == expect, s"walk $w step $t: $byStep")
        cur = expect
      }
    }
    // determinism across runs (no RNG state anywhere)
    val again = Graph.randomWalks(es, "a", "b", col("node") % 2 === 1, steps = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(again.sorted.sameElements(rows.sorted))
  }

  test("walk skip-gram pairs: window, ordering, self-pair exclusion") {
    import spark.implicits._
    val walks = Seq(
      (1L, 0L, 10L), (1L, 1L, 20L), (1L, 2L, 30L), (1L, 3L, 40L),
      (2L, 0L, 5L), (2L, 1L, 5L), (2L, 2L, 7L))
      .toDF("walk_id", "step", "node")
    val got = Graph.walkSkipgramPairs(walks, window = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val walk1 = Seq((10L, 20L), (10L, 30L), (20L, 10L), (20L, 30L),
      (20L, 40L), (30L, 10L), (30L, 20L), (30L, 40L), (40L, 20L), (40L, 30L))
    // walk 2: the 5-5 pair at distance 1 is a self-pair (dropped); each
    // 5 pairs with 7 in both directions
    val walk2 = Seq((5L, 7L), (5L, 7L), (7L, 5L), (7L, 5L))
    assert(got.sameElements((walk1 ++ walk2).sorted), got.mkString(","))
  }

  test("node2vec walks: biased picks match a naive weighted replay") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    val rows = Graph.node2vecWalks(es, "a", "b", col("node") % 2 === 1, steps = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val adj = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(1L, 3L))
    // adj.toSeq first: flatMap on a Map returning tuples rebuilds a Map
    // (dedup by key) and would silently drop most edges
    val edge = adj.toSeq.flatMap { case (s0, ds) => ds.map((s0, _)) }.toSet
    def fnvPos(v: String): Long = {
      var h = 0xcbf29ce484222325L
      v.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h & Long.MaxValue
    }
    def pick(walk: Long, t: Int, prev: Long, cur: Long): Long = {
      val cands = adj(cur).map { d =>
        (d, if (d == prev) 3L else if (edge((prev, d))) 6L else 2L)
      }
      val r = fnvPos(s"$walk:$t") % cands.map(_._2).sum
      var cum = 0L
      cands.find { case (_, w) => cum += w; cum > r }.get._1
    }
    val walks = rows.groupBy(_._1)
    assert(walks.keySet == Set(1L, 3L))
    for ((w, wr) <- walks) {
      val byStep = wr.sortBy(_._2).map(_._3)
      assert(byStep.length == 4 && byStep.head == w, s"walk $w: $byStep")
      var (prev, cur) = (w, w) // step 1 seeds prev = cur (uniform first hop)
      for (t <- 1 to 3) {
        val expect = pick(w, t, prev, cur)
        assert(byStep(t) == expect, s"walk $w step $t: $byStep")
        prev = cur; cur = expect
      }
    }
  }

  test("simplified silhouette: partitions the corpus, argmax own-cluster keeps s >= 0") {
    import spark.implicits._
    // two tight clusters + one all-zero vector (nv=0 sentinel path:
    // every cell scores -2e6, a = b = 3e6, s = 0)
    def v(hot: Int, mag: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == hot) mag else 0.001f * ((i % 3) - 1))
    val emb = (Seq.tabulate(3)(i => (i.toLong, v(0, 1.0f + i * 0.01f))) ++
      Seq.tabulate(3)(i => (10L + i, v(7, -1.0f - i * 0.01f))) ++
      Seq((99L, Array.fill(64)(0.0f))))
      .toDF("vec_id", "embedding")
    val out = Similarity.silhouetteSimplified(emb, "vec_id", "embedding",
      nCentroids = 8).collect()
    assert(out.map(_.getLong(1)).sum == 7L, out.toSeq) // every vector scored once
    // own cluster is the argmax -> a <= b -> simplified s is never negative
    assert(out.forall(_.getLong(2) >= 0L), out.toSeq)
    val again = Similarity.silhouetteSimplified(emb, "vec_id", "embedding",
      nCentroids = 8).collect()
    assert(again.map(r => (r.get(0), r.getLong(1), r.getLong(2))).sortBy(_.toString)
      .sameElements(out.map(r => (r.get(0), r.getLong(1), r.getLong(2))).sortBy(_.toString)))
  }

  test("batch perceptron: separable toy converges by epoch 1, exact weights") {
    import spark.implicits._
    // aa/bb/cc/dd hash to dims 23/5/3/21 (no collisions) — the epoch-1
    // closed form w = Σ y·x already separates, epochs 2-3 are no-ops
    val docs = Seq((1L, "aa aa bb", "en"), (2L, "aa bb bb", "en"),
      (3L, "cc dd dd", "de"), (4L, "cc cc dd", "de"))
      .toDF("doc_id", "text", "lang")
    val feats = TextAnalysis.perceptronFeatures(docs, "doc_id", "text",
      when(col("lang") === "en", 1L).otherwise(-1L), dims = 32)
    val w = TextAnalysis.perceptronTrain(feats, dims = 32, epochs = 3)
    assert(w(23) == 3L && w(5) == 3L && w(3) == -3L && w(21) == -3L, w.toSeq)
    assert(w.zipWithIndex.filterNot(x => Set(23, 5, 3, 21)(x._2)).forall(_._1 == 0L))
    val ok = TextAnalysis.perceptronMargins(feats, w)
      .select((col("y") * col("m") > 0).as("ok")).collect()
    assert(ok.length == 4 && ok.forall(_.getBoolean(0)))
  }

  test("k-truss peel: K4 survives k=4, lone triangle and chain do not") {
    import spark.implicits._
    // K4 on {0,1,2,3} (every edge in 2 triangles), a lone triangle
    // {10,11,12} (support 1), a chain 20-21-22 (support 0)
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val edges = (k4 ++ Seq((10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (21L, 22L))).toDF("a", "b")
    val t4 = Graph.kTrussPrune(edges, "a", "b", k = 4L, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t4 == k4.toSet, t4)
    val t3 = Graph.kTrussPrune(edges, "a", "b", k = 3L, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t3 == k4.toSet ++ Set((10L, 11L), (10L, 12L), (11L, 12L)), t3)
  }

  test("chunk spans: exact coverage, naive-reference equality, boundary splits") {
    val docs = docsDF(Seq(
      (0L, "a b c"), (1L, "d e f g h"), (3L, "i"),      // id gap on purpose
      (7L, "j k l m n o p"), (9L, "q r")))
    val out = Sharding.chunkSpans(docs, "doc_id", "text", chunkTokens = 4,
        targetRanges = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // naive reference: concat in id order, cut every 4 tokens
    val naive = {
      var st = 0L
      Seq((0L, 3L), (1L, 5L), (3L, 1L), (7L, 7L), (9L, 2L)).flatMap {
        case (id, n) =>
          val rows = ((st / 4) to ((st + n - 1) / 4)).map { c =>
            (c, id, n, st,
              math.min(st + n, (c + 1) * 4) - math.max(st, c * 4))
          }
          st += n
          rows
      }
    }
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      naive.sortBy(r => (r._1, r._2)), out.toSeq)
    // every doc's chunk slices sum back to its token count
    val perDoc = out.groupBy(_._2).map { case (id, rs) =>
      (id, rs.map(_._5).sum, rs.head._3) }
    assert(perDoc.forall { case (_, sum, n) => sum == n }, perDoc)
    // every chunk except the last is exactly full
    val perChunk = out.groupBy(_._1).map { case (c, rs) => (c, rs.map(_._5).sum) }
    val lastChunk = perChunk.keys.max
    assert(perChunk.filter(_._1 != lastChunk).forall(_._2 == 4L), perChunk)
  }

  test("as-of first-after: strictly later, earliest wins, payload tiebreak") {
    import spark.implicits._
    val left = Seq((10L, 1L, 100L), (11L, 1L, 250L), (12L, 2L, 50L))
      .toDF("lid", "k", "ts")
    val right = Seq(
      (1L, 100L, 900L),  // equal ts -> NOT visible (strict >)
      (1L, 200L, 901L), (1L, 200L, 899L), // tie at 200 -> min payload 899
      (1L, 300L, 902L))
      .toDF("k", "ts", "pay")
    val out = AsOf.joinFirstAfter(left, right, Seq("k"), "ts", Seq("pay"))
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
      .toMap
    assert(out(10L).contains("899"), out)   // 100 -> first after is 200, min pay
    assert(out(11L).contains("902"), out)   // 250 -> next is 300
    assert(out(12L).isEmpty, out)           // key 2 has no right rows
  }

  test("code signals: hand-computed milli ratios and verdict") {
    val docs = docsDF(Seq(
      (0L, "x=1; y=2; if (x<y) { z[0]=3; } #done"),   // code-ish
      (1L, "the quick brown fox jumps over the lazy dog")))
    val out = TextAnalysis.codeSignals(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // doc 0: n=36 chars, sym {}=;()<>[]# = 14, digits = 4
    val (sym0, dig0, lw0, score0, is0) = out(0L)
    assert(sym0 == 14L * 1000 / 36, out(0L))
    assert(dig0 == 4L * 1000 / 36, out(0L))
    assert(lw0 == 0L && score0 == 3 * sym0 + dig0 && is0 == 1L, out(0L))
    val (sym1, dig1, _, score1, is1) = out(1L)
    assert(sym1 == 0L && dig1 == 0L && score1 == 0L && is1 == 0L, out(1L))
  }

  test("bloom positions: double-hashing arithmetic matches a scalar replay") {
    val m = 64
    val k = 3
    val items = (0L until 50L).map(i => s"item_$i")
    val df = spark.createDataFrame(
      items.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("it",
          org.apache.spark.sql.types.StringType))))
    val got = df.select(col("it"),
        Sketches.bloomPositions(
          Sketches.positiveHash(encode(col("it"), "UTF-8")), m, k).as("pos"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // scalar replay of pos_i = (h mod m + i*h2) mod m with the forced-odd
    // step h2 = ((h div m) mod (m/2))*2 + 1 (coprime with power-of-two m)
    def fnv(s: String): Long = {
      var h = -3750763034362895579L // 14695981039346656037 as signed
      s.getBytes("UTF-8").foreach { b =>
        h = (h ^ (b & 0xffL)) * 1099511628211L
      }
      h & Long.MaxValue
    }
    items.foreach { it =>
      val h = fnv(it)
      val h1 = h % m
      val h2 = ((h / m) % (m / 2)) * 2 + 1
      val want = (0 until k).map(i => (h1 + i * h2) % m)
      assert(got(it) == want, s"$it: ${got(it)} != $want")
    }
    // positions are within [0, m) and h2 >= 1 guarantees k distinct-ish probes
    assert(got.values.flatten.forall(p => p >= 0 && p < m))
  }

  test("bloom fill report: exact bit count, estimate brackets truth, saturation NULL") {
    val items = (0L until 40L).map(i => s"tok_$i") ++ Seq("tok_0", "tok_1")
    val df = spark.createDataFrame(
      items.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("it",
          org.apache.spark.sql.types.StringType))))
    val r = Sketches.bloomFillReport(df, "it", m = 256, k = 3).collect()(0)
    val bits = r.getLong(2)
    val nExact = r.getLong(4)
    val est = r.getLong(5)
    assert(nExact == 40L) // duplicates collapse
    assert(bits > 0 && bits <= 3 * 40 && bits < 256)
    // Swamidass-Baldi is tight at this fill: within 20% of truth
    assert(math.abs(est - nExact) <= nExact / 5, s"est=$est exact=$nExact")
    assert(r.getLong(3) == 1000000L * bits / 256) // fill_micro integer-exact
    // saturated filter: every bit set -> no finite estimate (NULL, not crash)
    val sat = Sketches.bloomFillReport(df, "it", m = 4, k = 3).collect()(0)
    if (sat.getLong(2) == 4L) assert(sat.isNullAt(5))
  }

  test("reach curve: hand-built path graph, per-root cumulative counts, truncation") {
    // path 1-2-3-4-5 plus isolated-ish edge 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType))))
    // roots: nodes divisible by 5 -> {5, 10}
    val got = Graph.reachCurve(df, "a", "b", col("node") % 5 === 0, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // root 5: hop0 {5}, hop1 +{4}, hop2 +{3}; truncation hides 1, 2
    assert(got((5L, 0L)) == 1 && got((5L, 1L)) == 2 && got((5L, 2L)) == 3)
    // root 10: hop0 {10}, hop1 +{11}, no hop-2 row (frontier empty)
    assert(got((10L, 0L)) == 1 && got((10L, 1L)) == 2)
    assert(!got.contains((10L, 2L)))
    assert(got.size == 5)
  }

  test("bloom set ops: exact overlap arithmetic, union bits dominate, estimates bracket") {
    val rows = ((0L until 10L).map(i => (true, s"x$i")) ++
      (5L until 15L).map(i => (false, s"x$i")))
    val df = spark.createDataFrame(
      rows.map { case (f, it) => org.apache.spark.sql.Row(f, it) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fa",
          org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("it",
          org.apache.spark.sql.types.StringType))))
    val r = Sketches.bloomSetOps(df, "fa", "it", m = 1024, k = 3).collect()(0)
    // A = x0..x9, B = x5..x14: |A|=10 |B|=10 |A∪B|=15 |A∩B|=5
    assert(r.getLong(3) == 10 && r.getLong(4) == 10 &&
      r.getLong(5) == 15 && r.getLong(6) == 5, r.toString)
    // union filter bits dominate both sides (bitwise-OR property)
    assert(r.getLong(2) >= r.getLong(0) && r.getLong(2) >= r.getLong(1))
    // estimates at this fill are near-exact; inclusion-exclusion lands ±2
    assert(math.abs(r.getLong(10) - 5L) <= 2, s"est_inter=${r.getLong(10)}")
  }

  test("conditional entropy: deterministic successors give zero rate; scalar replay") {
    def micro(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val df = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row("g1", "a b a b a b"),
        org.apache.spark.sql.Row("g2", "a b a c")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = TextAnalysis.conditionalEntropy(df, "lang", "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // g1: bigrams ab(3), ba(2); every w1 has ONE successor -> H(W2|W1)=0
    val (nb1, v1, hc1, hu1) = out("g1")
    assert(nb1 == 2 && v1 == 2 && hc1 == 0)
    assert(hu1 == (3 * micro(5.0 / 3) + 2 * micro(5.0 / 2)) / 5)
    // g2: ab, ba, ac; c1(a)=2 -> hcond = (ln2 + 0 + ln2)/3 in micros
    val (nb2, v2, hc2, _) = out("g2")
    assert(nb2 == 3 && v2 == 2)
    assert(hc2 == 2 * micro(2.0) / 3, s"hc2=$hc2")
  }

  test("effective diameter: path graph thresholds at 90% and 60%") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType))))
    val r90 = Graph.effectiveDiameter(df, "a", "b",
      col("node") === 5L, rounds = 4).collect()(0)
    // from 5: reach 1,2,3,4,5 over hops 0..4
    assert(r90.getLong(1) == 5 && r90.getLong(2) == 4 && r90.getLong(3) == 4)
    val r60 = Graph.effectiveDiameter(df, "a", "b",
      col("node") === 5L, rounds = 4, permille = 600).collect()(0)
    assert(r60.getLong(3) == 2, s"60% diameter: ${r60.getLong(3)}")
  }

  test("four cycles: square graph counts one cycle via both diagonal pairs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType))))
    val rows = Graph.fourCycles(df, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the square 1-2-3-4: only diagonal pairs carry wedges (2 middles each)
    assert(rows.keySet == Set((1L, 3L), (2L, 4L)), rows.toString)
    assert(rows((1L, 3L)) == ((2L, 1L, 1L)) && rows((2L, 4L)) == ((2L, 1L, 1L)))
  }

  test("knn degree: star graph separates hub and leaf classes exactly") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val df = spark.createDataFrame(
      edges.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType))))
    val got = Graph.knnDegree(df, "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hub (deg 3): neighbors all deg 1 -> knn = 1e6; leaves (deg 1):
    // neighbor is the deg-3 hub -> knn = 3e6
    assert(got(3L) == ((1L, 1000000L)) && got(1L) == ((3L, 3000000L)), got)
  }

  test("conductance: two triangles + bridge, hand-computed phi") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val eDf = spark.createDataFrame(
      edges.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType))))
    val labels = spark.createDataFrame(
      Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 20L, 5L -> 20L, 6L -> 20L)
        .map { case (n, l) => org.apache.spark.sql.Row(n, l) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.LongType))))
    val got = Graph.conductance(eDf, "a", "b", labels).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // each side: vol 7 (degrees 2+2+3), cut 1, phi = 1e6/7 = 142857
    assert(got(10L) == ((3L, 7L, 1L, 142857L)), got)
    assert(got(20L) == ((3L, 7L, 1L, 142857L)), got)
  }

  test("kmv sketch merge: bottom-k of unioned day sketches equals global bottom-k") {
    import graft.functions.GraftFunctions.bottom_k
    val rows = (0L until 300L).map(i => (i % 5, s"item_${i % 97}"))
    val df = spark.createDataFrame(
      rows.map { case (d, it) => org.apache.spark.sql.Row(d, it) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("day",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("it",
          org.apache.spark.sql.types.StringType))))
    val hashed = df.select(col("day"),
      Sketches.positiveHash(encode(col("it"), "UTF-8")).as("h"))
    val daySk = hashed.groupBy("day").agg(bottom_k(col("h"), 16).as("bk"))
    val merged = daySk.select(explode(col("bk")).as("h"))
      .agg(bottom_k(col("h"), 16).as("bk")).collect()(0).getSeq[Long](0)
    val global = hashed.agg(bottom_k(col("h"), 16).as("bk"))
      .collect()(0).getSeq[Long](0)
    assert(merged == global, s"merge property broken:\n$merged\n$global")
  }

  test("LSH star-bucket pairs: identical connected components to the clique form, strictly fewer pairs in hot buckets") {
    import spark.implicits._
    // synthesize a corpus with a PLANTED hot bucket: 12 near-identical
    // boilerplate docs (one shared text + id-suffix noise past the
    // shingle window) plus distinct docs — the band buckets for the
    // boilerplate family exceed any small threshold
    val boiler = (0L until 12L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val rest = (100L until 110L).map(i =>
      (i, s"completely different document number $i with its own words ${i * 37}"))
    val docs = (boiler ++ rest).toDF("doc_id", "text")
    val clique = Dedup.minHashLshPairs(docs, "doc_id", "text",
      k = 5, bands = 4, rowsPerBand = 4)
    val star = Dedup.minHashLshPairs(docs, "doc_id", "text",
      k = 5, bands = 4, rowsPerBand = 4, starBucketThreshold = Some(3))
    val nClique = clique.count()
    val nStar = star.count()
    // the 12-doc family alone is 66 clique pairs vs 11 star pairs
    assert(nStar < nClique, s"star ($nStar) must prune the clique ($nClique)")
    assert(nStar >= 11L)
    // the CONTRACT: connected components are identical
    def comps(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(star) == comps(clique),
      "star-bucket pairs changed the connected components")
    // threshold high enough → byte-identical to the clique form
    val same = Dedup.minHashLshPairs(docs, "doc_id", "text",
      k = 5, bands = 4, rowsPerBand = 4, starBucketThreshold = Some(1000))
    assert(same.orderBy("id_a", "id_b").collect().toSeq ==
      clique.orderBy("id_a", "id_b").collect().toSeq)
  }

  test("multimodal video codec: MP4 box walk round-trips the fixture; corrupt payloads degrade") {
    import spark.implicits._
    import Multimodal.MediaCodecMp4
    for (d <- 0L until 8L) {
      val b = MediaCodecMp4.syntheticMp4(d)
      assert(new String(b, 4, 4, "ISO-8859-1") == "ftyp")
      val m = MediaCodecMp4.parseMeta(b).get
      val n = 5 + (d % 4).toInt
      val lens = (0 until n).map(i => 50 + ((7L * i + d) % 40).toInt)
      assert(m.majorBrand == "isom" && m.handler == "vide")
      assert(m.width == 16 * (1 + d % 4) && m.height == 16 * (1 + (3 * d) % 4))
      assert(m.codec == Seq("avc1", "hev1", "vp09")((d % 3).toInt))
      assert(m.timescale == 600 && m.durationMs == 40L * n)
      assert(m.nSamples == n && m.mdatLen == lens.sum)
      // sample table resolves to exact back-to-back ranges from offset 32,
      // and the bytes behind each range replay the content closed form
      val ss = MediaCodecMp4.parseSamples(b).get
      assert(ss.size == n)
      var off = 32L
      for (i <- 0 until n) {
        assert(ss(i).start == off && ss(i).len == lens(i), s"d=$d i=$i ${ss(i)}")
        for (j <- 0 until lens(i))
          assert((b(ss(i).start.toInt + j) & 0xff) ==
            java.lang.Math.floorMod(j + 17L * i + d, 256L).toInt)
        off += lens(i)
      }
    }
    // corrupt / non-BMFF payloads return None, never throw
    assert(MediaCodecMp4.parseMeta("not an mp4".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecMp4.parseMeta(Array.empty[Byte]).isEmpty)
    assert(MediaCodecMp4.parseMeta(MediaCodecMp4.syntheticMp4(3).take(40)).isEmpty)
    assert(MediaCodecMp4.parseSamples(Array.fill[Byte](64)(0x7f)).isEmpty)
    // a size field pointing past the buffer must end the walk cleanly
    val lying = MediaCodecMp4.syntheticMp4(1)
    lying(0) = 0x7f.toByte // ftyp "size" becomes enormous
    assert(MediaCodecMp4.parseMeta(lying).isEmpty)
    // through the Spark operators: mixed batch, opaque lane flagged
    val media = Seq(
      (1L, MediaCodecMp4.syntheticMp4(1), "video/mp4"),
      (2L, "opaque bytes".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val vm = Multimodal.videoMeta(spark, wrapped).collect().map(v => v.id -> v).toMap
    assert(vm(1L).real_codec && vm(1L).codec == "hev1" && vm(1L).width == 32)
    assert(!vm(2L).real_codec && vm(2L).mdat_len == 12L)
    val fr = Multimodal.sampleFramesMp4(spark, wrapped).collect()
    assert(fr.map(_.getLong(0)).distinct.toSeq == Seq(1L)) // opaque → no rows
    assert(fr.length == 6) // n = 5 + 1%4
    val f0 = fr.minBy(r => r.getInt(1))
    assert(f0.getLong(2) == 32L && f0.getLong(3) == 51L) // 50 + (0+1)%40
    val bytes0 = f0.getAs[Array[Byte]](4)
    assert(bytes0.length == 51 &&
      f0.getLong(5) == bytes0.map(_ & 0xff).map(_.toLong).sum)
  }

  test("multimodal video codec: RIFF/AVI header walk round-trips the fixture; corrupt payloads degrade") {
    import spark.implicits._
    import Multimodal.MediaCodecRiffAvi
    for (d <- 0L until 6L) {
      val b = MediaCodecRiffAvi.syntheticAvi(d)
      assert(new String(b, 0, 4, "ISO-8859-1") == "RIFF" &&
        new String(b, 8, 4, "ISO-8859-1") == "AVI ")
      val m = MediaCodecRiffAvi.parseMeta(b).get
      val n = 4 + (d % 3).toInt
      assert(m.usPerFrame == 33333 + 100 * (d % 5))
      assert(m.totalFrames == n && m.streams == 1 && m.moviFrames == n)
      assert(m.width == 32 * (1 + d % 3) && m.height == 24 * (1 + (2 * d) % 3))
      assert(m.handler == Seq("mjpg", "xvid", "dib ")((d % 3).toInt))
      assert(m.moviBytes ==
        (0 until n).map(i => 40L + 2 * ((5L * i + d) % 12)).sum)
    }
    assert(MediaCodecRiffAvi.parseMeta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(MediaCodecRiffAvi.parseMeta("not riff".getBytes).isEmpty)
    assert(MediaCodecRiffAvi.parseMeta(
      MediaCodecRiffAvi.syntheticAvi(2).take(30)).isEmpty)
    // Spark operator: mixed batch, opaque lane flagged
    val media = Seq(
      (1L, MediaCodecRiffAvi.syntheticAvi(1), "video/x-msvideo"),
      (2L, "opaque".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val am = Multimodal.aviMeta(spark, wrapped).collect().map(v => v.id -> v).toMap
    assert(am(1L).real_codec && am(1L).handler == "xvid" &&
      am(1L).duration_ms == 33433L * 5 / 1000)
    assert(!am(2L).real_codec && am(2L).movi_bytes == 6L)
  }

  test("multimodal video codec: AVI movi frame ranges match the RIFF layout closed form") {
    import spark.implicits._
    import Multimodal.MediaCodecRiffAvi
    for (d <- 0L until 6L) {
      val b = MediaCodecRiffAvi.syntheticAvi(d)
      val frames = MediaCodecRiffAvi.parseFrames(b).get
      val n = 4 + (d % 3).toInt
      assert(frames.size == n)
      var expectStart = 232L // 12 RIFF hdr + 200 hdrl list + 12 movi LIST hdr + 8 chunk hdr
      frames.foreach { case (i, st, ln) =>
        val expectLen = 40L + 2 * ((5L * i + d) % 12)
        assert(st == expectStart && ln == expectLen, s"frame $i of seed $d")
        // slice content replays byte j = (3j + 11i + d) mod 256
        val sum = (st until st + ln).map(o => b(o.toInt) & 0xffL).sum
        val expectSum = (0L until expectLen).map(j =>
          java.lang.Math.floorMod(3 * j + 11 * i + d, 256L)).sum
        assert(sum == expectSum)
        expectStart += 8 + expectLen // even lens: no pad byte
      }
    }
    assert(MediaCodecRiffAvi.parseFrames("not riff".getBytes).isEmpty)
    // Spark operator: non-RIFF payloads yield no rows
    val media = Seq(
      (1L, MediaCodecRiffAvi.syntheticAvi(1), "video/x-msvideo"),
      (2L, "opaque".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val rows = Multimodal.sampleFramesAvi(spark, wrapped).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L) && rows.length == 5)
    val f0 = rows.minBy(r => r.getInt(1))
    val bytes0 = f0.getAs[Array[Byte]](4)
    assert(f0.getLong(2) == 232L && bytes0.length == f0.getLong(3).toInt &&
      f0.getLong(5) == bytes0.map(_ & 0xff).map(_.toLong).sum)
  }

  test("multimodal video codec: Matroska EBML walk round-trips the fixture; corrupt payloads degrade") {
    import spark.implicits._
    import Multimodal.MediaCodecMkv
    for (d <- 0L until 8L) {
      val b = MediaCodecMkv.syntheticMkv(d)
      // EBML header magic on the wire
      assert((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)
      val m = MediaCodecMkv.parseMeta(b).get
      val n = 3 + (d % 4).toInt
      assert(m.timestampScale == 1000000L && m.durationMs == 40L * n)
      assert(m.tracks == 1 && m.videoTrack == 1)
      assert(m.codecId == Seq("V_VP9", "V_AV1", "V_MPEG4/ISO/AVC")((d % 3).toInt))
      assert(m.width == 64 * (1 + d % 4) && m.height == 36 * (1 + (3 * d) % 4))
      assert(m.clusters == 2 && m.blocks == n)
      assert(m.blockBytes ==
        (0 until n).map(i => 24L + 2 * ((7L * i + d) % 10)).sum)
    }
    assert(MediaCodecMkv.parseMeta("not ebml at all".getBytes).isEmpty)
    assert(MediaCodecMkv.parseMeta(Array[Byte](0x1a, 0x45)).isEmpty)
    assert(MediaCodecMkv.parseMeta(
      MediaCodecMkv.syntheticMkv(3).take(25)).isEmpty)
    // Spark operator: mixed batch, opaque lane flagged
    val media = Seq(
      (1L, MediaCodecMkv.syntheticMkv(1), "video/x-matroska"),
      (2L, "opaque".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val mm = Multimodal.mkvMeta(spark, wrapped).collect().map(v => v.id -> v).toMap
    assert(mm(1L).real_codec && mm(1L).codec_id == "V_AV1" &&
      mm(1L).duration_ms == 160L && mm(1L).n_clusters == 2)
    assert(!mm(2L).real_codec && mm(2L).block_bytes == 6L)
    // block ranges match the EBML layout closed form (the oracle's
    // arithmetic): cluster-1 base 141+L, cluster-2 base 156+L
    for (d <- 0L until 8L) {
      val b = MediaCodecMkv.syntheticMkv(d)
      val blocks = MediaCodecMkv.parseBlocks(b).get
      val n = 3 + (d % 4).toInt
      val L = Seq(5, 5, 15)((d % 3).toInt)
      val half = (n + 1) / 2
      assert(blocks.size == n)
      var cum = 0L
      blocks.foreach { case (i, st, ln) =>
        val expectLen = 24L + 2 * ((7L * i + d) % 10)
        val base = if (i < half) 141L else 156L
        assert(st == base + L + cum && ln == expectLen, s"block $i seed $d")
        val sum = (st until st + ln).map(o => b(o.toInt) & 0xffL).sum
        assert(sum == (0L until expectLen).map(j =>
          java.lang.Math.floorMod(5 * j + 13 * i + d, 256L)).sum)
        cum += 9 + expectLen
      }
    }
    assert(MediaCodecMkv.parseBlocks("nope".getBytes).isEmpty)
  }

  test("Matroska unknown-size elements: streamed Segment/Cluster parse identically") {
    import Multimodal.MediaCodecMkv
    // live-streamed Matroska writes Segment (and often Clusters) with the
    // UNKNOWN size vint because the final size isn't known at write time;
    // the parser must terminate the Segment at payload end and resync
    // unknown Clusters at the next Cluster ID. Rewrite the closed-form
    // fixture's 4-byte sizes to the 1-byte unknown vint (0xFF) by byte
    // surgery and require the identical parse.
    def unknownize(b: Array[Byte], ids: Set[Long]): Array[Byte] = {
      // walk top-down; when an element's id is in `ids`, replace its
      // 4-byte size with 0xFF (shrinking the stream by 3 bytes each time)
      val out = new scala.collection.mutable.ArrayBuffer[Byte]()
      def idAt(o: Int): (Long, Int) = {
        val first = b(o) & 0xff
        val w = Integer.numberOfLeadingZeros(first) - 24 + 1
        var v = first.toLong
        (1 until w).foreach(i => v = (v << 8) | (b(o + i) & 0xffL))
        (v, w)
      }
      var o = 0
      while (o < b.length) {
        val (id, iw) = idAt(o)
        val szFirst = b(o + iw) & 0xff
        val sw = Integer.numberOfLeadingZeros(szFirst) - 24 + 1
        var sz = (szFirst & (0xff >>> sw)).toLong
        (1 until sw).foreach(i => sz = (sz << 8) | (b(o + iw + i) & 0xffL))
        out ++= b.slice(o, o + iw)
        if (ids.contains(id)) {
          out += 0xff.toByte // unknown size; recurse into the body
          var inner = o + iw + sw
          val end = inner + sz.toInt
          // master bodies: only Segment/Cluster are unknownized here, and
          // both contain whole child elements — copy them verbatim (their
          // own sizes stay known)
          out ++= b.slice(inner, end)
          o = end
        } else {
          out ++= b.slice(o + iw, o + iw + sw + sz.toInt)
          o = o + iw + sw + sz.toInt
        }
      }
      out.toArray
    }
    val SEGMENT = 0x18538067L; val CLUSTER = 0x1F43B675L
    for (d <- 0L until 6L) {
      val b = MediaCodecMkv.syntheticMkv(d)
      val known = MediaCodecMkv.parseMeta(b).get
      // streamed segment only
      val segStreamed = unknownize(b, Set(SEGMENT))
      assert(MediaCodecMkv.parseMeta(segStreamed).contains(known), s"seed $d seg")
      // streamed segment AND clusters (the cluster resync path)
      val allStreamed = unknownize(b, Set(SEGMENT, CLUSTER))
      assert(MediaCodecMkv.parseMeta(allStreamed).contains(known), s"seed $d all")
      // block payloads parse to the same lengths and content sums
      val kb = MediaCodecMkv.parseBlocks(b).get
      val sb = MediaCodecMkv.parseBlocks(allStreamed).get
      assert(kb.size == sb.size)
      kb.zip(sb).foreach { case ((ki, kst, kln), (si, sst, sln)) =>
        assert(ki == si && kln == sln)
        val ksum = (kst until kst + kln).map(o => b(o.toInt) & 0xffL).sum
        val ssum = (sst until sst + sln).map(o => allStreamed(o.toInt) & 0xffL).sum
        assert(ksum == ssum)
      }
    }
  }

  test("zip archive expansion: members decode to the closed form, non-archives yield no rows") {
    import spark.implicits._
    import Multimodal.MediaCodecZip
    for (d <- 0L until 6L) {
      val ms = MediaCodecZip.members(MediaCodecZip.syntheticZip(d)).get
      val k = (2 + d % 3).toInt
      assert(ms.size == k)
      ms.zipWithIndex.foreach { case ((name, data), m) =>
        assert(name == s"doc_$m.txt")
        val len = 20 + ((5L * m + d) % 15).toInt
        assert(data.length == len)
        data.zipWithIndex.foreach { case (b, j) =>
          assert(b == ('a' + java.lang.Math.floorMod(3L * j + 7L * m + d, 26L)).toByte)
        }
      }
    }
    assert(MediaCodecZip.members("PK but not zip".getBytes).isEmpty)
    assert(MediaCodecZip.members("plain".getBytes).isEmpty)
    // per-member cap: a member inflating past the cap kills the archive
    val big = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(big)
    zo.putNextEntry(new java.util.zip.ZipEntry("bomb.bin"))
    zo.write(new Array[Byte](1 << 20)); zo.closeEntry(); zo.close()
    assert(MediaCodecZip.members(big.toByteArray, maxBytesPerMember = 1 << 16).isEmpty)
    assert(MediaCodecZip.members(big.toByteArray).isDefined)
    // Spark operator: archive explodes, opaque yields nothing
    val media = Seq(
      (0L, MediaCodecZip.syntheticZip(0), "application/zip"),
      (1L, "opaque".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val rows = Multimodal.expandArchive(spark, wrapped).collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 0L))
  }

  test("tar archive: ustar headers round-trip the closed form, bad checksums reject") {
    import spark.implicits._
    import Multimodal.MediaCodecTar
    for (d <- 0L until 8L) {
      val b = MediaCodecTar.syntheticTar(d)
      assert(b.length % 512 == 0)
      val ms = MediaCodecTar.members(b).get
      val k = (2 + d % 4).toInt
      assert(ms.size == k)
      ms.zipWithIndex.foreach { case ((name, data), m) =>
        assert(name == s"file_$m.dat")
        val len = 30 + ((9L * m + d) % 21).toInt
        assert(data.length == len)
        data.zipWithIndex.foreach { case (byte, j) =>
          assert(byte == java.lang.Math.floorMod(7L * j + 3L * m + d, 256L).toByte)
        }
      }
    }
    assert(MediaCodecTar.members("not a tar".getBytes).isEmpty)
    // corrupt a header byte after the checksum was computed -> reject
    val bad = MediaCodecTar.syntheticTar(2)
    bad(0) = 'X'.toByte
    assert(MediaCodecTar.members(bad).isEmpty)
    // the shared operator expands tar payloads through the same flatMap
    val media = Seq(
      (0L, MediaCodecTar.syntheticTar(0), "application/x-tar"),
      (1L, "opaque".getBytes("UTF-8"), "application/octet-stream"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val rows = Multimodal.expandArchive(spark, wrapped).collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 0L) &&
      rows.map(_.getString(2)).toSet == Set("file_0.dat", "file_1.dat"))
    // .tgz: the gzip wrapper inflates transparently to the same members;
    // gzip-wrapped NON-archives still yield nothing
    val tgz = Seq(
      (0L, Multimodal.MediaCodecGzip.gzip(MediaCodecTar.syntheticTar(0)),
        "application/gzip"),
      (1L, Multimodal.MediaCodecGzip.gzip("just text".getBytes), "application/gzip"))
      .toDF("doc_id", "payload", "mime")
    val tgzWrapped = Multimodal.wrap(tgz, "doc_id", "payload", col("mime"), Seq.empty)
    val tgzRows = Multimodal.expandArchive(spark, tgzWrapped).collect()
    assert(tgzRows.length == 2 && tgzRows.forall(_.getLong(0) == 0L))
  }

  test("gzip lane: lossless round-trip, corrupt members degrade, zip bombs are capped") {
    import spark.implicits._
    import Multimodal.MediaCodecGzip
    // round-trip: inflate(gzip(x)) == x, including non-ASCII codepoints
    val texts = Seq("hello world", "", "héllo ωorld 世界", "a" * 10000)
    texts.foreach { t =>
      val raw = t.getBytes("UTF-8")
      assert(MediaCodecGzip.gunzip(MediaCodecGzip.gzip(raw))
        .map(new String(_, "UTF-8")).contains(t))
    }
    // non-gzip and corrupt payloads -> None
    assert(MediaCodecGzip.gunzip("plain".getBytes).isEmpty)
    val corrupt = MediaCodecGzip.gzip("payload".getBytes)
    corrupt(12) = (corrupt(12) ^ 0x5a).toByte // flip bits mid-deflate-stream
    assert(MediaCodecGzip.gunzip(corrupt).isEmpty)
    // zip-bomb guard: 1 MB of zeros compresses tiny but must not inflate
    // past the cap
    val bomb = MediaCodecGzip.gzip(new Array[Byte](1 << 20))
    assert(bomb.length < 4096)
    assert(MediaCodecGzip.gunzip(bomb, maxBytes = 1 << 16).isEmpty)
    assert(MediaCodecGzip.gunzip(bomb, maxBytes = 1 << 21).isDefined)
    // Spark operator: both lanes decode to the same content stats
    val media = Seq(
      (0L, MediaCodecGzip.gzip("abcé".getBytes("UTF-8")), "application/gzip"),
      (1L, "abcé".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "payload", "mime")
    val wrapped = Multimodal.wrap(media, "doc_id", "payload", col("mime"), Seq.empty)
    val inf = Multimodal.inflateText(spark, wrapped).collect().map(v => v.id -> v).toMap
    assert(inf(0L).is_gzip && !inf(1L).is_gzip)
    Seq(0L, 1L).foreach { id =>
      assert(inf(id).n_chars == 4 && inf(id).head == "abcé" &&
        inf(id).char_sum == 'a'.toLong + 'b' + 'c' + 0xe9)
    }
  }

  test("pow chain SQL: literal left-assoc chain equals math.pow on exact dyadics") {
    assert(TextOps.powChainSql("x", 1) == "x")
    assert(TextOps.powChainSql("x", 3) == "((x * x) * x)")
    // evaluate the generated chain through Spark on a dyadic-exact input
    val df = spark.sql(s"SELECT ${TextOps.powChainSql("0.5", 16)} AS p")
    assert(df.collect()(0).getAs[java.math.BigDecimal](0).doubleValue()
      == math.pow(0.5, 16))
    // catch-probability chain: s=1 -> 1e6, s=0 -> 0 at any (b, r)
    val edge = spark.sql(
      s"SELECT ${TextOps.lshCatchMicroSql("CAST(1.0 AS DOUBLE)", 4, 4)} AS hi, " +
        s"${TextOps.lshCatchMicroSql("CAST(0.0 AS DOUBLE)", 4, 4)} AS lo")
      .collect()(0)
    assert(edge.getLong(0) == 1000000L && edge.getLong(1) == 0L)
  }
}
