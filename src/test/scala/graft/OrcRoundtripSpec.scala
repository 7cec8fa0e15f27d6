package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q235's plan and value contract: a lang-partitioned ORC store read
  * with a lang + n_chars predicate must (a) prune partitions, (b) push
  * the range filter into the ORC scan, and (c) roundtrip values
  * byte-exactly. */
class OrcRoundtripSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("ORC roundtrip prunes lang partitions and pushes the n_chars filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-spec").toString
    val docs = (1L to 200L).map { i =>
      (i, if (i % 3 == 0) "en" else "de", s"src${i % 4}", (i * 13 % 900).toInt,
        s"text $i")
    }.toDF("doc_id", "lang", "source", "n_chars", "text")
    docs.write.mode("overwrite").partitionBy("lang").orc(dir)

    val read = spark.read.orc(dir)
      .filter(col("lang") === "en" && col("n_chars") > 500)
    read.count() // materialize so AQE finalizes the plan
    val plan = read.queryExecution.executedPlan.toString
    // non-empty PartitionFilters mentioning lang (the round-11 assert rule:
    // the empty list prints too, so match the bracket contents)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"no lang partition prune in:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(n_chars,500)"),
      s"n_chars not pushed in:\n$plan")

    // value roundtrip: ORC-read rows == source rows under the same predicate
    val got = read.select("doc_id", "source", "n_chars")
      .as[(Long, String, Int)].collect().toSet
    val want = docs.filter(col("lang") === "en" && col("n_chars") > 500)
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Int)].collect().toSet
    assert(got == want && got.nonEmpty)
  }
}
