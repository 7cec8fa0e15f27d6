package graft

import graft.operators.LlmParsing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F4/F5 parsing parity with the reference
  * (`components/optimization/response_evaluator.py:176-189`,
  * `components2/task_executor.py:493-547`). */
class LlmParsingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def score(text: String): Double =
    Seq(text).toDF("r").select(LlmParsing.parseScore($"r")).as[Double].head()

  test("parseScore: reference-accepted forms") {
    assert(score("Perustelut: hyvä\nPisteet: 0.85") == 0.85)
    assert(score("Pisteet: .85") == 0.85)
    assert(score("Pisteet: 1") == 1.0)
    assert(score("Pisteet: 1.0") == 1.0)
    assert(score("pisteet: 0.3") == 0.3) // case-insensitive
  }

  test("parseScore: fallback to first score-shaped number, else 0.5") {
    assert(score("the quality is about 0.7 overall") == 0.7)
    assert(score("no numbers whatsoever") == 0.5)
    assert(score("") == 0.5)
  }

  test("parseScore: clamped to [0,1]") {
    // '1.75' primary-matches '1' (reference regex behaves identically)
    assert(score("Pisteet: 1.75") == 1.0)
  }

  test("parseReasoning: multi-line, stops at Pisteet") {
    val r = Seq("Perustelut: foo\nbar\nPisteet: 0.8").toDF("r")
      .select(LlmParsing.parseReasoning($"r")).as[String].head()
    assert(r == "foo\nbar\n")
    val noScore = Seq("Perustelut: only reasoning").toDF("r")
      .select(LlmParsing.parseReasoning($"r")).as[String].head()
    assert(noScore == "only reasoning")
  }

  test("parseVerdict: defaults for missing fields, garbage is invalid") {
    val rows = Seq(
      """{"is_valid": true, "score": 88, "reason": "ok"}""",
      """```json
        |{"is_valid": true, "score": 150}
        |```""".stripMargin,
      "not json"
    ).toDF("r").select(LlmParsing.parseVerdict($"r").as("v"))
      .select("v.is_valid", "v.score", "v.reason")
      .collect()
    assert(rows(0).getBoolean(0) && rows(0).getInt(1) == 88 && rows(0).getString(2) == "ok")
    assert(rows(1).getBoolean(0) && rows(1).getInt(1) == 100) // clamped, reason defaulted
    assert(!rows(2).getBoolean(0) && rows(2).getInt(1) == 0)
  }
}
