package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/output shapes for [[RunningSummaryProcessor]]. */
case class TwsEvent(topic: String, k: Long)
case class TwsSummary(topic: String, n: Long, sum_k: Long, max_k: Long)

/** Spark 4 `transformWithState` processor: a per-key running summary
  * (count / sum / max of the payload key) held in a single `ValueState`
  * and re-emitted after every batch — the arbitrary-stateful successor to
  * `flatMapGroupsWithState` (typed state handles, TTL support, RocksDB
  * column families; see stream_custom_state for the legacy API the
  * reference-parity consumer uses).
  *
  * Every emitted field is MONOTONE in processed input (count/sum of
  * non-negative keys, max), so a consumer can reduce the update-mode sink
  * with `max` per key and get a batch-boundary-independent — hence
  * oracle-checkable — final answer. */
class RunningSummaryProcessor
    extends StatefulProcessor[String, TwsEvent, TwsSummary] {
  @transient private var st: ValueState[TwsSummary] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TwsSummary]("summary",
      Encoders.product[TwsSummary], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsSummary] = {
    var cur =
      if (st.exists()) st.get()
      else TwsSummary(key, 0L, 0L, Long.MinValue)
    rows.foreach { r =>
      cur = TwsSummary(key, cur.n + 1, cur.sum_k + r.k,
        math.max(cur.max_k, r.k))
    }
    st.update(cur)
    Iterator.single(cur)
  }
}
