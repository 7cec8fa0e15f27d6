package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.SessionState
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the sessionization fold shared by both streaming
  * variants: the fold must be arrival-order-insensitive within a batch,
  * must produce exactly the canonical gap partition of the sorted event
  * times, and must compose across in-order batch splits the way Append
  * mode requires (emitted sessions never need retraction). */
class SessionFoldPropSpec extends AnyFunSuite {

  private val gapMs = 60000L

  private val times: Gen[List[Long]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n,
      Gen.choose(0L, 40L).map(_ * 17000L))) // multiples straddling the gap

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** The specification: sort, then split wherever the silence exceeds the
    * gap. */
  private def canonical(ts: Seq[Long]): Seq[SessionState] = {
    if (ts.isEmpty) return Seq.empty
    val sorted = ts.sorted
    val out = scala.collection.mutable.ArrayBuffer(
      SessionState(sorted.head, sorted.head, 1))
    sorted.tail.foreach { t =>
      val last = out.last
      if (t - last.last <= gapMs)
        out(out.length - 1) = SessionState(last.start, t, last.n + 1)
      else out += SessionState(t, t, 1)
    }
    out.toSeq
  }

  test("fold of any permutation equals the canonical gap partition") {
    checkProp(Prop.forAll(times, Gen.long) { (ts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ts)
      val (closed, open) = EventStream.foldSessions(Nil, shuffled, gapMs)
      (closed ++ open) == canonical(ts)
    })
  }

  test("in-order batch splits compose: sequential fold == one-shot fold") {
    // Append-mode contract: when batches arrive in event-time order (what a
    // watermark enforces), feeding them through the fold one at a time —
    // emitting closed sessions and carrying the open tail — must yield the
    // same session set as folding everything at once.
    checkProp(Prop.forAll(times, Gen.choose(1, 5)) { (ts, nSplits) =>
      val sorted = ts.sorted
      val batches = sorted.grouped(math.max(1, sorted.length / nSplits)).toSeq
      var state = List.empty[SessionState]
      val emitted = scala.collection.mutable.ArrayBuffer.empty[SessionState]
      batches.foreach { b =>
        val (closed, open) = EventStream.foldSessions(state, b, gapMs)
        emitted ++= closed
        state = open
      }
      (emitted ++ state) == canonical(ts)
    })
  }
}
