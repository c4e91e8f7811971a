package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQuery

/** Captures the state-store metrics of named streaming queries so the
  * bench detail file can ATTRIBUTE their cost (rows held in join/agg state
  * vs per-trigger fixed overhead) instead of band-watching the wall-clock
  * number. Queries opt in by name; [[graft.Bench]] folds [[snapshot]] into
  * `BENCH_DETAIL.json` under `stream_state_metrics`. */
object StreamStateProbe {
  private val metrics = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record the last progress that carried state-operator metrics (the
    * final data batch — later no-data/sentinel batches may report empty). */
  def record(name: String, q: StreamingQuery): Unit = {
    lastProgressJsons.clear()
    q.recentProgress.foreach(p => lastProgressJsons.add(p.json))
    val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
    if (ps.nonEmpty) {
      val last = ps.last
      val ops = last.stateOperators.map(_.json).mkString("[", ",", "]")
      val trig = Option(last.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(-1L)
      metrics.put(name,
        s"""{"batchId":${last.batchId},"numInputRows":${last.numInputRows},""" +
          s""""triggerExecutionMs":$trig,"stateOperators":$ops}""")
    }
  }

  /** Name → JSON blob of the recorded queries (insertion-order-free). */
  def snapshot(): Map[String, String] = metrics.asScala.toMap

  /** Dev-probe detail: every progress (durationMs breakdown) of the last
    * recorded query — populated by [[record]], read by StreamPhaseProbe. */
  val lastProgressJsons = new java.util.concurrent.CopyOnWriteArrayList[String]()
}
