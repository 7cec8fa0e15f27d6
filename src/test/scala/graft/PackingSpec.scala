package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget sequence packing (operators/Packing.scala). */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming-pack semantics: bin = cumsum-before div budget, per shard") {
    // shard A: token counts 3, 4, 5, 2 with budget 6:
    //   doc 1 starts at 0  -> bin 0
    //   doc 2 starts at 3  -> bin 0 (straddles into bin 1 — never split)
    //   doc 3 starts at 7  -> bin 1
    //   doc 4 starts at 12 -> bin 2
    val docs = Seq(
      (1L, "a", "w w w"),
      (2L, "a", "w w w w"),
      (3L, "a", "w w w w w"),
      (4L, "a", "w w"),
      (5L, "b", "w w w w w w w") // other shard: independent cumsum
    ).toDF("doc_id", "source", "text")
    val bins = Packing.assignBins(docs, budget = 6)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 0L))
  }

  test("bin summary accounts for every document and token exactly once") {
    val r = new scala.util.Random(11)
    val docs = (0 until 200).map { i =>
      (i.toLong, s"src${i % 5}", (0 to r.nextInt(40)).map(_ => "tok").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val summary = Packing.packBins(docs, budget = 64)
    val (nDocs, nTok) = summary.agg(sum("n_docs"), sum("n_tokens"))
      .as[(Long, Long)].head()
    assert(nDocs == 200L)
    val direct = docs.select(Packing.tokenCount(col("text"))).as[Long]
      .collect().sum
    assert(nTok == direct)
    // invariant: every document STARTS inside its bin's budget window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val bad = Packing.assignBins(docs, budget = 64)
      .withColumn("start", sum("n_tokens").over(w) - col("n_tokens"))
      .filter(col("start") < col("bin") * 64 || col("start") >= (col("bin") + 1) * 64)
    assert(bad.count() == 0)
    // plan shape: ONE hash exchange (the shard partitioning), which the
    // window AND the bin aggregation both reuse — a second exchange here
    // would mean the agg re-shuffled what the window already clustered
    val plan = Packing.packBins(docs, budget = 64)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("packSequences emits id-ordered EOS-joined member text per bin") {
    val docs = Seq(
      (1L, "s1", "one two three"), // 3 tokens
      (2L, "s1", "four five"),     // 2 -> bin 0 full at budget 4? cum: 3,5
      (3L, "s1", "six"),
      (10L, "s2", "alpha")
    ).toDF("doc_id", "source", "text")
    val got = Packing.packSequences(docs, budget = 4, sep = "|")
      .select("source", "bin", "n_docs", "seq")
      .as[(String, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // s1 cumsums: doc1 starts at 0 -> bin 0; doc2 starts at 3 -> bin 0;
    // doc3 starts at 5 -> bin 1
    assert(got == Seq(
      ("s1", 0L, 2L, "one two three|four five"),
      ("s1", 1L, 1L, "six"),
      ("s2", 0L, 1L, "alpha")))
  }
}
