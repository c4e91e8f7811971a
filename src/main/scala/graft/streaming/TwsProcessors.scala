package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/output shapes for [[RunningSummaryProcessor]]. */
case class TwsEvent(topic: String, k: Long)
case class TwsSummary(topic: String, n: Long, sum_k: Long, max_k: Long)

/** Event-time TIMER demo for `transformWithState`: counts real rows per
  * key (sentinel keys — `k >= sentinelFloor` — flow through to advance
  * the watermark but are NOT counted; filtering inside the processor is
  * immune to the Catalyst push-through-watermark trap), registers ONE
  * event-time timer per key at a fixed expiry, and emits the final
  * (key, n) exactly once when the watermark passes it — the
  * emit-on-timer pattern that `flatMapGroupsWithState` expressed with
  * timeouts. Append-mode output; deterministic under the two-phase
  * sentinel drive because all real rows arrive before any timer can
  * fire. */
class TimerCountProcessor(expiryMs: Long, sentinelFloor: Long)
    extends StatefulProcessor[String, TwsEvent, TwsSummary] {
  @transient private var count: ValueState[Long] = _
  @transient private var timerSet: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count",
      Encoders.scalaLong, TTLConfig.NONE)
    timerSet = getHandle.getValueState[Boolean]("timerSet",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[TwsEvent],
      timerValues: TimerValues): Iterator[TwsSummary] = {
    var c = if (count.exists()) count.get() else 0L
    rows.foreach { r => if (r.k < sentinelFloor) c += 1 }
    count.update(c)
    if (!timerSet.exists()) {
      getHandle.registerTimer(expiryMs)
      timerSet.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[TwsSummary] = {
    val c = if (count.exists()) count.get() else 0L
    // count is released; timerSet stays — it records "registered once",
    // so late sentinel-only batches cannot re-arm the timer and emit a
    // second (zero) row for the key
    count.clear()
    Iterator.single(TwsSummary(key, c, 0L, 0L))
  }
}

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
