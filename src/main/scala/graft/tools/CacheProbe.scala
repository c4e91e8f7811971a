package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps._
import graft.operators.Dedup

/** Scratch probe: cached vs uncached (exchange-reuse) dedup pipelines. */
object CacheProbe {
  def minHashLshPairsNoCache(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val n = bands * rowsPerBand
    val sig = Dedup.minHashSignatures(df, idCol, textCol, k, n)
    val bandCols = (0 until bands).map { b =>
      val key = concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
      struct(lit(b).as("band"), key.as("bkey"))
    }
    val banded = sig
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  def jaccardForPairsNoCache(
      df: DataFrame, pairs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val candIds = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    val candDocs = df.join(broadcast(candIds), Seq(idCol), "left_semi")
    val sh = shingles(candDocs, idCol, textCol, k)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val aSide = broadcast(pairs)
      .join(sh.withColumnRenamed(idCol, "id_a"), Seq("id_a"))
    val bSide = sh.select(col(idCol).as("id_b"), col("code"))
    val inter = aSide.join(bSide, Seq("id_b", "code"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"), 6))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Long): Unit = {
      (0 until 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.range(100000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    time("pipeline CACHED") {
      val cands = Dedup.minHashLshPairs(docs, "doc_id", "text", 5, 4, 4)
      Dedup.jaccardForPairs(docs, cands, "doc_id", "text", 8)
        .where(col("jaccard") >= 0.05).count()
    }
    time("pipeline NOCACHE") {
      val cands = minHashLshPairsNoCache(docs, "doc_id", "text", 5, 4, 4)
      jaccardForPairsNoCache(docs, cands, "doc_id", "text", 8)
        .where(col("jaccard") >= 0.05).count()
    }
    time("lsh CACHED")(Dedup.minHashLshPairs(docs, "doc_id", "text", 5, 4, 4).count())
    time("lsh NOCACHE")(minHashLshPairsNoCache(docs, "doc_id", "text", 5, 4, 4).count())
    spark.stop()
  }
}
