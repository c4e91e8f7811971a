package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: fixed per-task / per-stage overhead in this environment. */
object TaskProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize", sys.env.getOrElse("PAGE_SIZE", "64m"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("BYPASS_THRESHOLD", "200"))
      .config("spark.shuffle.compress", sys.env.getOrElse("SHUFFLE_COMPRESS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Unit): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    // warm
    spark.range(1000).count()

    for (n <- Seq(1, 8, 32)) {
      time(s"empty rdd $n tasks") {
        spark.sparkContext.parallelize(0 until n, n).map(_ => 1).count()
      }
    }
    for (p <- Seq(8, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      time(s"tiny groupBy parts=$p") {
        spark.range(0, 100000, 1, p)
          .groupBy((col("id") % 1000).as("k")).agg(count(lit(1))).count()
      }
      time(s"tiny join parts=$p") {
        val a = spark.range(0, 100000, 1, p).select((col("id") % 5000).as("k"), col("id").as("v"))
        val b = spark.range(0, 100000, 1, p).select((col("id") % 5000).as("k"), col("id").as("w"))
        a.join(b, Seq("k")).where(col("v") < col("w")).count()
      }
    }
    spark.stop()
  }
}
