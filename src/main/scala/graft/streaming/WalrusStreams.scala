package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.log.WalrusLog

/** Structured Streaming entry points for the topic log (SURVEY.md §7 M2).
  *
  * Reading: `format("walruslog")` DataSource V2 micro-batch source — the
  * checkpointed (start, end] commit ranges give exactly-once delivery, the
  * Spark-native counterpart of the reference's `StrictlyAtOnce` consumer
  * (reference: src/wal/runtime/walrus.rs:20-24).
  *
  * Writing: `foreachBatch` into [[WalrusLog.appendDF]] with an epoch tag —
  * a retried epoch re-commits under the same tag and is dropped, so the
  * sink is effectively exactly-once (the reference's fsync-then-publish
  * atomicity, src/wal/runtime/writer.rs:135-341, expressed as tag
  * idempotence).
  *
  * The trigger interval is the durability-cadence analogue of the
  * reference's `FsyncSchedule::Milliseconds` (default 200 ms,
  * src/wal/runtime/walrus.rs:45).
  *
  * Low-latency at-least-once mode: add
  * `.option("asyncProgressTrackingEnabled", "true")` to the stream writer
  * to move checkpoint-file writes off the trigger path (~5× lower trigger
  * latency measured locally). Delivery then matches the reference's
  * `AtLeastOnce { persist_every: N }` cursor mode — a crash replays the
  * micro-batches since the last async checkpoint
  * (reference: src/wal/runtime/walrus_read.rs:347-366).
  */
object WalrusStreams {

  val DefaultTriggerMs = 200L // FsyncSchedule::Milliseconds(200) parity

  /** The source's raw schema is the file layout (`ts_us` epoch-micros,
    * topic last, vectorized-batch order); this projection restores the
    * public entry shape. Column pruning still reaches the parquet reader —
    * Catalyst pushes the projection through. */
  private def entryShape(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(col("topic"), col("offset"),
      timestamp_micros(col("ts_us")).as("ts"), col("value"), col("checksum"))
  }

  /** Streaming DataFrame over a log namespace (optionally one topic). */
  def readStream(
      spark: SparkSession, root: String, namespace: String = "default",
      topic: Option[String] = None,
      maxBatchesPerTrigger: Option[Int] = None,
      startingTimestampMs: Option[Long] = None,
      maxRowsPerTrigger: Option[Long] = None,
      maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format("walruslog")
      .option("path", root).option("namespace", namespace)
    topic.foreach(t => r = r.option("topic", t))
    maxBatchesPerTrigger.foreach(n => r = r.option("maxBatchesPerTrigger", n))
    startingTimestampMs.foreach(ms => r = r.option("startingTimestampMs", ms))
    maxRowsPerTrigger.foreach(n => r = r.option("maxRowsPerTrigger", n))
    maxBytesPerTrigger.foreach(n => r = r.option("maxBytesPerTrigger", n))
    entryShape(r.load())
  }

  /** Batch DataFrame over the same source (BATCH_READ capability). */
  def read(spark: SparkSession, root: String, namespace: String = "default",
      topic: Option[String] = None): DataFrame = {
    var r = spark.read.format("walruslog")
      .option("path", root).option("namespace", namespace)
    topic.foreach(t => r = r.option("topic", t))
    entryShape(r.load())
  }

  /** Streaming writer into a log: rows need `topic` + `value` columns.
    * Epoch-tagged appendDF makes retried epochs no-ops (exactly-once). */
  def sink(df: DataFrame, log: WalrusLog, checkpointDir: String,
      triggerMs: Long = DefaultTriggerMs): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        log.appendDF(batch, tag = Some(s"stream-epoch-$epochId"))
        ()
      }

  /** One-shot drain: process everything currently committed, then stop —
    * the micro-batch analogue of the reference's catch-up `GET` loop. */
  def drainOnce(writer: DataStreamWriter[org.apache.spark.sql.Row]): StreamingQuery = {
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}

/** Replay-proof collector for REAL-TIME-MODE drives (`Trigger.RealTime`
  * allows only console/foreach/kafka sinks): rows land in a per-run map
  * keyed by (topic, offset), so a retried task or replayed batch is
  * idempotent and the collected set is deterministic whatever the
  * wall-clock batch boundaries were. Local-mode only by construction (the
  * foreach writer and the driver share one JVM — exactly the memory-sink
  * constraint every streaming drive here already has). */
object RtTailCollector {
  import scala.collection.concurrent.TrieMap
  private val buffers =
    TrieMap.empty[String, java.util.concurrent.ConcurrentHashMap[(String, Long), String]]

  /** New collection run: returns (runId, writer). */
  def fresh(): (String, org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row]) = {
    val id = java.util.UUID.randomUUID().toString
    buffers(id) = new java.util.concurrent.ConcurrentHashMap[(String, Long), String]
    (id, new W(id))
  }

  def size(runId: String): Int = buffers(runId).size

  /** Drain and forget the run's rows: (topic, offset, value-string). */
  def drain(runId: String): Seq[(String, Long, String)] = {
    import scala.jdk.CollectionConverters._
    val rows = buffers.remove(runId).get.asScala.toSeq
      .map { case ((t, o), v) => (t, o, v) }
    rows.sortBy(r => (r._1, r._2))
  }

  private class W(runId: String)
      extends org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
    def open(partitionId: Long, epochId: Long): Boolean = true
    def process(r: org.apache.spark.sql.Row): Unit =
      buffers(runId).put((r.getString(0), r.getLong(1)), r.getString(2))
    def close(errorOrNull: Throwable): Unit = ()
  }
}
