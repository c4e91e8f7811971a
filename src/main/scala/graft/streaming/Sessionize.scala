package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization of topic entries via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset custom-state path
  * the reference has no analogue for (its streaming is per-entry delivery;
  * this is the "beyond the log" layer built on it).
  *
  * A session for a key closes when no entry arrives within `gapMs` of the
  * previous one; closed sessions are emitted, the open session rides in
  * `GroupState` across micro-batches. State size is O(keys), not O(rows).
  */
object Sessionize {

  case class Event(key: String, tsMs: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class ClosedSession(key: String, start: Long, end: Long, n: Long)

  def sessionize(spark: SparkSession, entries: DataFrame, gapMs: Long,
      keyCol: String = "topic", tsCol: String = "ts"): Dataset[ClosedSession] = {
    import spark.implicits._
    val events = entries.select(
      col(keyCol).cast("string").as("key"),
      (col(tsCol).cast("double") * 1000).cast("long").as("tsMs")).as[Event]

    def fn(key: String, it: Iterator[Event],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val sorted = it.toSeq.sortBy(_.tsMs)
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      sorted.foreach { e =>
        open match {
          case Some(s) if e.tsMs - s.end <= gapMs =>
            open = Some(s.copy(end = e.tsMs, n = s.n + 1))
          case Some(s) =>
            closed += ClosedSession(key, s.start, s.end, s.n)
            open = Some(OpenSession(e.tsMs, e.tsMs, 1))
          case None =>
            open = Some(OpenSession(e.tsMs, e.tsMs, 1))
        }
      }
      open.foreach(state.update)
      closed.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
