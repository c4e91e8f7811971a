package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r14): size the scale_hash_chain probe — time the lineitem
  * scan+repartition+agg skeleton at several chain depths so the declared
  * probe can be sized to dominate fixed overhead at 32 cores while staying
  * DuckDB-affordable. Usage: runMain graft.tools.ScaleProbeTune [depths...] */
object ScaleProbeTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val depths = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(0, 96, 192, 384)
    def run(k: Int): Double = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
      val seed = concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))
      val h = (1 to k).foldLeft(seed)((e, _) => sha2(e, 256))
      val t0 = System.nanoTime()
      li.select(h.as("h"))
        .agg(count(lit(1)).as("n"), min(col("h")), max(col("h")),
          count(when(substring(col("h"), 1, 1) <= "3", 1))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run(2) // warm
    depths.foreach { k =>
      val times = (0 until 3).map(_ => run(k))
      println(f"[tune] depth=$k%4d best=${times.min}%7.3f runs=${
        times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
