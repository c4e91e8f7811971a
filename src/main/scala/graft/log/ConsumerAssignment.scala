package graft.log

/** Deterministic topic→consumer assignment strategies for consumer groups —
  * the group-membership surface the reference's shared per-topic cursors
  * (reference: distributed-walrus/src/controller/mod.rs:199-268 GET path,
  * src/wal/runtime/index.rs:7-10) leave client-side. Kafka-parity
  * assignors over the unit of parallelism this engine exposes (topics):
  *
  *  - [[roundRobin]]: sorted topics dealt one-by-one across consumers —
  *    balanced counts, interleaved ownership.
  *  - [[range]]: sorted topics cut into contiguous blocks of
  *    `ceil(T / n)`; earlier consumers take the larger blocks — preserves
  *    adjacency (useful when adjacent topics co-access state).
  *
  * Pure metadata arithmetic on the driver; rebalancing after membership
  * change is just re-running the assignor with the new `nConsumers` and
  * diffing — cursors are keyed (group, topic) so ownership moves are
  * implicit (any member may resume a topic at its committed offset).
  */
object ConsumerAssignment {

  /** (topic, consumerIndex) pairs, consumerIndex ∈ [0, nConsumers). */
  def roundRobin(topics: Seq[String], nConsumers: Int): Seq[(String, Int)] = {
    require(nConsumers > 0, "nConsumers must be positive")
    topics.sorted.zipWithIndex.map { case (t, i) => (t, i % nConsumers) }
  }

  /** (topic, consumerIndex) pairs; consumer j owns the j-th block of
    * `ceil(T / n)` consecutive sorted topics (trailing consumers may own
    * fewer or zero topics when T does not divide evenly). */
  def range(topics: Seq[String], nConsumers: Int): Seq[(String, Int)] = {
    require(nConsumers > 0, "nConsumers must be positive")
    val sorted = topics.sorted
    val block = (sorted.size + nConsumers - 1) / nConsumers
    sorted.zipWithIndex.map { case (t, i) => (t, i / block) }
  }

  /** Sticky (cooperative) rebalance after a membership change to
    * `nConsumers`: every topic whose previous owner survives keeps it
    * (zero movement — the cooperative-rebalance contract: only orphaned
    * work moves, nobody stops consuming topics they already own), and
    * orphaned topics (owner index ≥ nConsumers, or new topics) are dealt
    * round-robin across the new membership in sorted-topic order.
    * Deterministic pure metadata arithmetic, like the other assignors —
    * cursors are keyed (group, topic), so a move is just the new owner
    * resuming at the committed offset. */
  def sticky(topics: Seq[String], previous: Map[String, Int],
      nConsumers: Int): Seq[(String, Int)] = {
    require(nConsumers > 0, "nConsumers must be positive")
    val sorted = topics.sorted
    val orphans = sorted.filter(t => !previous.get(t).exists(_ < nConsumers))
    val orphanOwner = orphans.zipWithIndex
      .map { case (t, i) => t -> (i % nConsumers) }.toMap
    sorted.map(t => t -> orphanOwner.getOrElse(t, previous(t)))
  }
}
