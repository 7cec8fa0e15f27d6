package graft

import graft.sources.JsonlIngest
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonlIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("gzip JSONL round-trips hostile text byte-for-byte") {
    val hostile = Seq(
      (1L, "plain text"),
      (2L, "with \"quotes\" and \\backslashes\\"),
      (3L, "newlines\nand\ttabs\randvertical"),
      (4L, "unicode: café • 中文 emoji 😀"),
      (5L, "{\"looks\": \"like json\"}"),
      (6L, ""),
      (7L, "control  chars"))
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/docs"
    JsonlIngest.writeJsonl(hostile.toDF("doc_id", "text"), dir)
    // shards actually compressed
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty, "expected gzip shards")
    val back = JsonlIngest.readJsonlStrict(spark, dir, schema)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // Spark's JSON writer drops null-equivalent empty strings? It must not:
    // equality over the full tuple set is the contract.
    assert(back == hostile.sortBy(_._1))
  }

  test("PERMISSIVE read surfaces corrupt lines; strict read fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlbad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-0.json"),
      ("""{"doc_id": 1, "text": "good"}""" + "\n" +
        """not json at all""" + "\n" +
        """{"doc_id": 2, "text": "also good"}""" + "\n").getBytes("UTF-8"))
    val df = JsonlIngest.readJsonl(spark, dir, schema)
    assert(JsonlIngest.corruptCount(df) == 1)
    val parsed = df.localCheckpoint(true)
    assert(parsed.filter(org.apache.spark.sql.functions.col("_corrupt").isNull)
      .count() == 2)
    val strict = JsonlIngest.readJsonlStrict(spark, dir, schema)
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }
}
