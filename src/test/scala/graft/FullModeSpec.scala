package graft

import graft.operators.Optimization
import org.scalatest.funsuite.AnyFunSuite

/** Full-mode facade (`components/modes/full_mode.py:43-135`): one entry
  * point chaining dynamic retrieval → temperature sweep → iterative
  * improvement, with the complete ST1 event catalog. */
class FullModeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join vector search", "a.txt"),
    (2L, "stream merge window batch", "b.txt"),
    (3L, "customer order line total", "c.txt"),
    (4L, "group sort shuffle partition", "d.txt"),
    (5L, "vector stream spark merge", "e.txt")
  ).toDF("doc_id", "text", "source")

  test("fullQuery chains retrieval -> sweep -> improvement and returns the best") {
    // generate: longer response at higher temperature; evaluate: length/100
    // capped; improve: +10 chars per iteration.
    val res = FullMode.fullQuery(spark, corpus, "spark vector stream",
      generate = (_, t) => "x" * (20 + (t * 40).toInt),
      evaluate = r => math.min(r.length, 100).toDouble / 100.0,
      improve = (cur, _) => cur + ("y" * 10))
    // sweep best = highest temperature (longest response), ties impossible
    assert(res.sweep.bestParams == 1.25)
    assert(res.sweep.attempts.length == 5)
    // improvement runs until score 1.0 (len >= 100), +10/iter from 70
    assert(res.improvement.stopReason == Optimization.StopReason.TargetReached)
    assert(res.score == 1.0 && res.response.length >= 100)
    assert(res.retrieval.stats.final_hits == res.retrieval.docs.length)
  }

  test("event log covers the full ST1 catalog with consistent counts") {
    val res = FullMode.fullQuery(spark, corpus, "spark vector stream",
      generate = (_, t) => "x" * (20 + (t * 40).toInt),
      evaluate = r => math.min(r.length, 100).toDouble / 100.0,
      improve = (cur, _) => cur + ("y" * 10))
    val byType = res.events.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("retrieval_start") == 1 && byType("retrieval_complete") == 1)
    assert(byType("threshold_attempt") == res.retrieval.stats.attempts)
    assert(byType("temperature_test") == 5 && byType("temperature_evaluation") == 5)
    assert(byType("improvement_iteration") == 2 * res.improvement.iterations)
    assert(byType("improvement_evaluation") == res.improvement.iterations)
    assert(byType("llm_stream_start") == 1 && byType("llm_stream_complete") == 1)
    assert(byType("llm_stream_chunk") ==
      math.ceil(res.response.length / 32.0).toLong)
    // chunk value sums reassemble the full response length
    val chunkSum = res.events.filter($"event_type" === "llm_stream_chunk")
      .agg(org.apache.spark.sql.functions.sum("value")).as[Long].head()
    assert(chunkSum == res.response.length)
    // seq preserves emission order: retrieval first, stream completion last
    val ordered = res.events.orderBy("seq").select("event_type")
      .as[String].collect()
    assert(ordered.head == "retrieval_start" && ordered.last == "llm_stream_complete")
  }

  test("initial response already at target -> zero improvement iterations") {
    val res = FullMode.fullQuery(spark, corpus, "spark vector stream",
      generate = (_, _) => "z" * 300,
      evaluate = r => math.min(r.length, 100).toDouble / 100.0,
      improve = (cur, _) => cur)
    assert(res.improvement.iterations == 0)
    assert(res.improvement.stopReason == Optimization.StopReason.TargetReached)
    assert(res.events.filter($"event_type" === "improvement_iteration").count() == 0)
  }
}
