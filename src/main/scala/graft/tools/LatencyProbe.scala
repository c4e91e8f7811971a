package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.log.WalrusLog
import graft.streaming.WalrusStreams

/** Scratch probe: micro-batch trigger duration breakdown. */
object LatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (mode <- Seq("sync", "async", "shm")) {
      val root = Files.createTempDirectory(s"latency-$mode-").toString
      val log = new WalrusLog(spark, root)
      log.append("t", "seed".getBytes)
      var w = WalrusStreams.readStream(spark, root)
        .writeStream.format("memory").queryName(s"lat_$mode")
        .trigger(Trigger.ProcessingTime(200L))
      if (mode == "async")
        w = w.option("asyncProgressTrackingEnabled", "true")
          .option("asyncProgressTrackingCheckpointIntervalMs", "1000")
      if (mode == "shm")
        w = w.option("checkpointLocation",
          Files.createTempDirectory(
            java.nio.file.Paths.get("/dev/shm"), "lat-ckpt-").toString)
      val q = try w.start()
      catch { case e: Throwable =>
        println(s"$mode: FAILED to start: ${e.getMessage.linesIterator.next()}")
        null
      }
      if (q != null) {
        (0 until 10).foreach { i =>
          log.append("t", s"m$i".getBytes)
          Thread.sleep(300)
        }
        q.processAllAvailable()
        val ds = q.recentProgress.toSeq.filter(_.numInputRows > 0)
          .map(_.durationMs.get("triggerExecution").toDouble).drop(1)
        if (ds.nonEmpty)
          println(f"$mode: avg=${ds.sum / ds.size}%.0f ms over ${ds.size} batches")
        q.recentProgress.toSeq.filter(_.numInputRows > 0).takeRight(3).foreach { p =>
          val d = p.durationMs
          println(s"  $mode batch ${p.batchId}: total=${d.get("triggerExecution")} " +
            s"addBatch=${d.get("addBatch")} " +
            s"commitOffsets=${d.get("commitOffsets")} walCommit=${d.get("walCommit")}")
        }
        q.stop()
      }
    }
    spark.stop()
  }
}
