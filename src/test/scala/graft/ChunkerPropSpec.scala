package graft

import graft.operators.Chunker
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for chunker invariants (SURVEY §5b): size bounds where
  * attainable, ordered line provenance, content coverage. */
class ChunkerPropSpec extends AnyFunSuite {

  private val word = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
  private val paragraph = Gen.choose(5, 120).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val document = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, paragraph).map(_.mkString("\n\n")))

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("chunks respect bounds; provenance ordered; every input word survives") {
    checkProp(Prop.forAll(document) { doc =>
      val cs = Chunker.chunk(doc)
      val sizeOk = cs.forall(_.text.length <=
        Chunker.MaxChunkChars + Chunker.OverlapChars + Chunker.MinChunkChars + 2)
      val nonTailOk = cs.dropRight(1).forall(_.text.length >= Chunker.MinChunkChars) ||
        cs.length <= 1
      val provOk = cs.forall(c => c.startLine >= 1 && c.startLine <= c.endLine)
      val startsOk = cs.map(_.startLine) == cs.map(_.startLine).sorted
      // coverage: concatenated chunk text contains every input word
      val joined = cs.map(_.text).mkString(" ")
      val coverOk = doc.split("\\s+").filter(_.nonEmpty).forall(joined.contains)
      sizeOk && nonTailOk && provOk && startsOk && coverOk
    })
  }

  test("chunking is deterministic") {
    checkProp(Prop.forAll(document) { doc =>
      Chunker.chunk(doc) == Chunker.chunk(doc)
    })
  }

  test("threshold batch/driver equivalence over random score sets") {
    val scores = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 1000).map(_ / 1000.0)))
    checkProp(Prop.forAll(scores, Gen.choose(1, 8)) { (ss, target) =>
      val st = graft.operators.VectorSearch.dynamicThresholdSelect(ss, target, 0.05)
      // invariants: final_hits = count(score >= final_threshold) when any
      // scores exist; reached iff that count meets the target
      val cnt = ss.count(_ >= st.final_threshold)
      (ss.isEmpty || st.final_hits == cnt) &&
        (st.target_reached == (cnt >= target && ss.nonEmpty)) &&
        st.attempts >= 1 && st.attempts <= 21
    })
  }
}
