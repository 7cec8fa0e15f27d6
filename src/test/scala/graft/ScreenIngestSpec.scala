package graft

import graft.streaming.ScreenIngest
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ScreenIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val goodTail = " That sentence will have to be part of the " +
    "document, and it ends with a period.\nAnother proper sentence " +
    "finishes the document."

  private def docs(ids: Range): Seq[(Long, String)] = ids.map { i =>
    val body = (1 to 60).map(j => s"token$j").mkString(" ")
    val text =
      if (i % 3 == 0) body // no sentences, no stopwords -> fails
      else body + goodTail
    (i.toLong, text)
  }

  test("streamed verdicts over two micro-batches == one-shot batch verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("screeningest").toString
    val staging = s"$dir/staging"
    val b1 = docs(0 until 40)
    val b2 = docs(40 until 90)
    b1.toDF("doc_id", "text").write.mode("append").parquet(staging)

    val q = ScreenIngest.screenedQualityIngest(
      spark.readStream.schema(schema).parquet(staging),
      s"$dir/verdicts", s"$dir/ckpt")
    try {
      q.processAllAvailable()
      b2.toDF("doc_id", "text").write.mode("append").parquet(staging)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = ScreenIngest.loadVerdicts(spark, s"$dir/verdicts")
      .select("doc_id", "lang_pred", "gopher_keep", "c4_keep", "kept")
      .as[(Long, String, Boolean, Boolean, Boolean)].collect().toMap2
    val batch = ScreenIngest.verdicts((b1 ++ b2).toDF("doc_id", "text"))
      .as[(Long, String, Boolean, Boolean, Boolean)].collect().toMap2
    assert(streamed == batch, "streamed verdicts deviate from the batch form")
    // both polarities must occur, or the test proves nothing
    assert(batch.values.exists(_._4) && batch.values.exists(!_._4))
  }

  test("retry of a batch id is an idempotent overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("screenretry").toString
    val b = docs(0 until 30).toDF("doc_id", "text")
    ScreenIngest.screenBatch(b, 7L, s"$dir/verdicts", "text", "doc_id",
      50, 100000, 3, 2)
    val first = ScreenIngest.loadVerdicts(spark, s"$dir/verdicts").collect()
    // simulate the at-least-once re-run of the SAME batch
    ScreenIngest.screenBatch(b, 7L, s"$dir/verdicts", "text", "doc_id",
      50, 100000, 3, 2)
    val second = ScreenIngest.loadVerdicts(spark, s"$dir/verdicts").collect()
    assert(second.length == 30 && first.length == 30,
      "retry duplicated or dropped verdict rows")
  }

  private implicit class TupleSeqOps(
      rows: Array[(Long, String, Boolean, Boolean, Boolean)]) {
    def toMap2: Map[Long, (String, Boolean, Boolean, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
