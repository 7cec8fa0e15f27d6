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

  test("html crawl leg: streamed extract+screen == batch form; text is corpus-ready") {
    val dir = java.nio.file.Files.createTempDirectory("htmlingest").toString
    val staging = s"$dir/staging"
    val pageSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("html", StringType)))
    def pages(ids: Range): Seq[(Long, String)] = docs(ids).map { case (id, text) =>
      (id, s"<html><head><title>Page $id</title><style>b{}</style></head>" +
        s"<body><script>reject();</script><p>${text.replace("\n", "</p><p>")}" +
        "</p></body></html>")
    }
    val b1 = pages(0 until 40)
    b1.toDF("doc_id", "html").write.mode("append").parquet(staging)
    val q = ScreenIngest.htmlScreenedIngest(
      spark.readStream.schema(pageSchema).parquet(staging),
      s"$dir/out", s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.option("basePath", s"$dir/out")
      .parquet(s"$dir/out/batch=*")
      .select("doc_id", "title", "text", "kept")
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1).toSeq
    val batch = ScreenIngest.extractAndScreen(b1.toDF("doc_id", "html"))
      .select("doc_id", "title", "text", "kept")
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "streamed html leg deviates from batch form")
    // extraction really ran: markup gone, title captured, both verdict
    // polarities present (the %3 docs fail the sentence rules)
    assert(streamed.forall { case (id, title, text, _) =>
      title == s"Page $id" && !text.contains("<") && !text.contains("reject()")
    })
    assert(streamed.exists(_._4) && streamed.exists(!_._4))
  }

  private implicit class TupleSeqOps(
      rows: Array[(Long, String, Boolean, Boolean, Boolean)]) {
    def toMap2: Map[Long, (String, Boolean, Boolean, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
