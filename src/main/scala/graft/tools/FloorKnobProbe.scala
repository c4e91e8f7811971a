package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot A/B: per-trigger floor of a zero-work stateful stream drive
  * vs spark.sql.shuffle.partitions (state-store instance count = shuffle
  * partitions for streaming aggs). Scratch probe for the r13 stream-floor
  * work. */
object FloorKnobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("knob-")
    (0 until 3).foreach { i =>
      spark.range(i, i + 1).toDF("v").coalesce(1).write.parquet(s"$dir/f$i")
    }
    val sch = spark.read.parquet(s"$dir/f0").schema
    def drive(): Double = {
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/f*")
        .groupBy(col("v") % 2).agg(count(lit(1)))
      val qn = s"knob_${System.nanoTime()}"
      val ck = java.nio.file.Files.createTempDirectory("knob-ck-")
      try {
        val q = src.writeStream.format("memory").queryName(qn)
          .outputMode("complete").option("checkpointLocation", ck.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(qn).collect()
      } finally {
        spark.catalog.dropTempView(qn)
        graft.log.WalrusLog.deleteRecursively(ck)
      }
      (System.nanoTime() - t0) / 1e9
    }
    for (p <- Seq(32, 16, 8, 4, 2)) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      drive() // warm at this partitioning
      val runs = (1 to 5).map(_ => drive())
      println(f"[knob] partitions=$p%2d min=${runs.min}%.2f s med=${runs.sorted.apply(2)}%.2f s")
    }
    spark.stop()
  }
}
