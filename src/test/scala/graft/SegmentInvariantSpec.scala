package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.log.TopicState

/** The reference's TLA+ safety-invariant family
  * (reference: distributed-walrus/spec/DistributedWalrus.tla:139-173),
  * checked with ScalaCheck over random append/consume/seek/vacuum
  * sequences against the REAL [[TopicState.applyAppend]] transition —
  * the same code the commit path and startup replay execute, so a
  * violation here is a violation in production sequencing.
  *
  * Mapping (TLA+ → here): WalAppend/Rollover → applyAppend;
  * Read → the consume/seek cursor clamp WalrusLog applies.
  */
class SegmentInvariantSpec extends AnyFunSuite {

  private val Nodes = Vector("node-0", "node-1", "node-2")

  sealed trait Op
  private case class Append(n: Int) extends Op
  private case class Consume(n: Int) extends Op
  private case class Seek(to: Long) extends Op

  // Vacuum is deliberately absent: space reclamation never touches the
  // sequencing state by construction (it has no TopicState transition),
  // and its engine-level invariance (counts/offsets/cursors survive) is
  // asserted against the real log in WalrusLogSpec.
  private val genOp: Gen[Op] = Gen.frequency(
    6 -> Gen.choose(1, 400).map(Append),
    2 -> Gen.choose(0, 200).map(Consume),
    1 -> Gen.choose(-100L, 2000L).map(Seek))

  private def runProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("segment/cursor invariant family holds over random op sequences") {
    runProp(Prop.forAll(
      Gen.choose(1L, 300L), Gen.listOfN(60, genOp)) { (maxSeg, ops) =>
      val st = new TopicState
      var cursor = 0L
      // first-seen sealed counts/leaders — must never change afterwards
      val sealedSeen = scala.collection.mutable.Map.empty[Long, (Long, String)]
      var prevSegment = 0L
      ops.forall { op =>
        op match {
          case Append(n) =>
            st.applyAppend(st.nextOffset + n, n * 300L, maxSeg,
              seg => Nodes((seg % Nodes.size).toInt))
          case Consume(n) => // shared-cursor read: never past appended
            cursor = math.min(cursor + n, st.nextOffset)
          case Seek(to) =>   // WalrusLog.seek clamp: [0, nextOffset]
            cursor = math.min(math.max(to, 0L), st.nextOffset)
        }
        // InvSealedCountsStable (tla:150-154): sealed counts and leaders
        // are immutable once recorded, leaders come from the node set
        val stable = st.sealedSegments.forall { case (seg, cnt) =>
          val leader = st.segmentLeaders(seg)
          sealedSeen.getOrElseUpdate(seg, (cnt, leader)) == (cnt, leader) &&
            Nodes.contains(leader)
        }
        // InvLastSealedIsSum (tla:156-160)
        val sumOk = st.lastSealedEntryOffset == st.sealedSegments.values.sum
        // InvNoWritesPastOpen (tla:146-148): sealed ids are exactly the
        // dense prefix below the open segment
        val denseOk =
          st.sealedSegments.keySet == (0L until st.currentSegment).toSet
        // InvReadCursorWithinBounds (tla:162-169)
        val cursorOk = cursor >= 0L && cursor <= st.nextOffset
        // rollover monotone + InvSeqOrder analogue: dense offsets mean
        // total = sealed + open, and the open segment stays below the
        // threshold after every transition
        val monotoneOk = st.currentSegment >= prevSegment
        prevSegment = st.currentSegment
        val openOk = st.entriesInOpenSegment >= 0 &&
          st.entriesInOpenSegment < maxSeg &&
          st.nextOffset ==
            st.lastSealedEntryOffset + st.entriesInOpenSegment
        stable && sumOk && denseOk && cursorOk && monotoneOk && openOk
      }
    })
  }

  test("sealed segments only seal at or above the threshold, leaders rotate") {
    runProp(Prop.forAll(
      Gen.choose(1L, 100L), Gen.listOfN(40, Gen.choose(1, 250))) {
      (maxSeg, appends) =>
      val st = new TopicState
      appends.foreach(n => st.applyAppend(st.nextOffset + n, n.toLong, maxSeg,
        seg => Nodes((seg % Nodes.size).toInt)))
      st.sealedSegments.forall { case (_, cnt) => cnt >= maxSeg } &&
        st.segmentLeaders.forall { case (seg, leader) =>
          leader == Nodes((seg % Nodes.size).toInt)
        }
    })
  }

  test("liveness: rollover always fires past the threshold (tla RolloverProgress, spec:188)") {
    // RolloverProgress: whenever a segment's count reaches
    // MaxSegmentEntries, the open segment id EVENTUALLY advances past it.
    // Our transition satisfies the strongest possible witness — the
    // rollover fires in the SAME applyAppend that crosses the threshold —
    // so the twin asserts immediate fire on every crossing transition,
    // plus conservation (no entry is lost to the seal) under sustained
    // rollovers of every mix of batch sizes vs thresholds.
    runProp(Prop.forAll(
      Gen.choose(1L, 120L), Gen.listOfN(60, Gen.choose(1, 300))) {
      (maxSeg, appends) =>
      val st = new TopicState
      appends.forall { n =>
        val preSeg = st.currentSegment
        val preOpen = st.entriesInOpenSegment
        st.applyAppend(st.nextOffset + n, n * 10L, maxSeg,
          seg => Nodes((seg % Nodes.size).toInt))
        val crossed = preOpen + n >= maxSeg
        (!crossed || st.currentSegment > preSeg) &&
          (crossed || st.currentSegment == preSeg) &&
          st.nextOffset == st.lastSealedEntryOffset + st.entriesInOpenSegment
      }
    })
  }

  test("liveness: a weakly-fair reader drains every appended entry (tla ReadProgress, spec:198)") {
    // ReadProgress: a reader positioned below the appended count
    // eventually advances. The twin models the engine's read clamp
    // (batchRead delivers >= 1 entry whenever any is unread — the
    // entriesCap/byte-budget floor) under a random interleaving of
    // appends and reader schedulings, then closes with a fairness drain:
    // scheduling the reader `remaining` more times MUST reach nextOffset
    // (bounded progress — each fair step delivers at least one entry),
    // across however many segment seals the appends forced. Seeks are
    // deliberately absent: ReadProgress quantifies over the cursor's
    // natural advance; seek replay is a safety concern (cursor clamp,
    // first test). Engine-level drain-across-seals is asserted against
    // the real log in WalrusLogSpec's rollover fixtures.
    runProp(Prop.forAll(
      Gen.choose(1L, 50L),
      Gen.listOfN(50, Gen.frequency(
        3 -> Gen.choose(1, 120).map(n => Left(n): Either[Int, Int]),
        2 -> Gen.choose(1, 80).map(n => Right(n): Either[Int, Int])))) {
      (maxSeg, ops) =>
      val st = new TopicState
      var cursor = 0L
      val interleaveOk = ops.forall {
        case Left(n) => // append: forces rollovers at small maxSeg
          st.applyAppend(st.nextOffset + n, n * 10L, maxSeg,
            seg => Nodes((seg % Nodes.size).toInt))
          true
        case Right(n) => // a scheduled read with unread entries progresses
          val pre = cursor
          cursor = math.min(cursor + n, st.nextOffset)
          pre == st.nextOffset || cursor > pre
      }
      // fairness closure: one entry per scheduling is the worst case the
      // read floor allows, so `remaining` schedulings must drain fully
      var steps = 0L
      val budget = st.nextOffset - cursor
      while (cursor < st.nextOffset && steps < budget + 1) {
        cursor = math.min(cursor + 1, st.nextOffset)
        steps += 1
      }
      interleaveOk && cursor == st.nextOffset && steps <= budget
    })
  }
}
