package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Scratch probe: stage-level timings for the slow dedup queries. */
object QueryProbe {
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
    println(s"documents: ${docs.count()}")

    // ngram_jaccard stages
    val sub = docs.where(col("doc_id") % 10 === 0)
    val all = TextOps.shingles(sub, "doc_id", "text", 8).cache()
    time("shingles materialize")(all.count())
    val hot = all.groupBy("code").agg(count(lit(1)).as("df"))
      .where(col("df") > 50).select("code")
    time("hot codes")(hot.count())
    val sh = all.join(broadcast(hot), Seq("code"), "left_anti")
    time("filtered count")(sh.count())
    val l = sh.select(col("doc_id").as("id_a"), col("code"))
    val r = sh.select(col("doc_id").as("id_b"), col("code"))
    val inter = l.join(r, Seq("code")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("both"))
    time("inter (self-join+agg)")(inter.count())
    all.unpersist()
    time("full ngram_jaccard")(
      Dedup.ngramJaccardPairs(sub, "doc_id", "text", 8, 0.12, Some(50)).count())

    // pipeline stages
    val t0 = System.nanoTime()
    val cands = Dedup.minHashLshPairs(docs, "doc_id", "text", 5, 4, 4)
    time("lsh candidates")(cands.count())
    time("jaccardForPairs")(
      Dedup.jaccardForPairs(docs, cands, "doc_id", "text", 8).count())
    println(f"pipeline total: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // variants: shuffle-hash hints + fewer shuffle partitions
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    for (parts <- Seq(32, 8)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val sh2 = sh.hint("shuffle_hash")
      val inter2 = sh2.select(col("doc_id").as("id_a"), col("code"))
        .join(sh2.select(col("doc_id").as("id_b"), col("code")), Seq("code"))
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("both"))
      time(s"inter shuffle_hash parts=$parts")(inter2.count())
      time(s"full ngram parts=$parts")(
        Dedup.ngramJaccardPairs(sub, "doc_id", "text", 8, 0.12, Some(50)).count())
      time(s"jaccardForPairs parts=$parts")(
        Dedup.jaccardForPairs(docs, cands, "doc_id", "text", 8).count())
    }
    spark.stop()
  }
}
