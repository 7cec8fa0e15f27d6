package graft

import graft.operators.{IvfIndex, PqIndex}
import graft.streaming.QueryServe
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class QueryServeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(ids: Range, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(4242)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat * 5f))
    ids.map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, a.map(x => x + (i % 13) * 0.004f))
    }
  }

  private val schema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("streamed serving == direct batch search; retry overwrite is idempotent") {
    val corpus = clustered(0 until 300, 6)
    val docs = corpus.toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 6)
    val withCells = IvfIndex.assign(docs, ivf)
    val (enc0, pq) = PqIndex.buildIvfAdc(withCells, ivf, m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("serve").toString
    enc0.select("doc_id", "cell_id", "codes")
      .write.partitionBy("cell_id").parquet(s"$dir/index")
    val encoded = spark.read.parquet(s"$dir/index")

    // Two request batches through the stream.
    val staging = s"$dir/requests"
    val reqs1 = Seq(100L -> corpus(5)._2, 101L -> corpus(17)._2)
    val reqs2 = Seq(102L -> corpus(40)._2)
    reqs1.toDF("query_id", "embedding").write.mode("append").parquet(staging)
    val q = QueryServe.servedSearch(
      spark.readStream.schema(schema).parquet(staging),
      ivf, pq, encoded, s"$dir/results", s"$dir/ckpt", k = 5, nprobe = 2)
    try {
      q.processAllAvailable()
      reqs2.toDF("query_id", "embedding").write.mode("append").parquet(staging)
      q.processAllAvailable()
    } finally q.stop()

    // Every served row matches the direct batch search over all queries.
    val served = QueryServe.loadResults(spark, s"$dir/results")
      .select("query_id", "doc_id", "adc", "doc_rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val direct = PqIndex.searchIvfAdcBatch(
        encoded, ivf, pq, reqs1 ++ reqs2, k = 5, nprobe = 2)
      .select("query_id", "doc_id", "adc", "doc_rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == direct, "streamed serving diverged from the direct batch")

    // An at-least-once redelivery of a batch id overwrites in place:
    // same rows, no duplicates.
    val before = QueryServe.loadResults(spark, s"$dir/results").count()
    QueryServe.serveBatch(reqs1.toDF("query_id", "embedding"), 0L,
      ivf, pq, encoded, s"$dir/results", 5, 2, "query_id", "embedding")
    val after = QueryServe.loadResults(spark, s"$dir/results")
      .select("query_id", "doc_id", "adc", "doc_rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(QueryServe.loadResults(spark, s"$dir/results").count() == before)
    assert(after == direct)

    // An empty micro-batch writes nothing (no empty batch dirs).
    QueryServe.serveBatch(Seq.empty[(Long, Array[Float])]
        .toDF("query_id", "embedding"), 99L,
      ivf, pq, encoded, s"$dir/results", 5, 2, "query_id", "embedding")
    assert(!new java.io.File(s"$dir/results/batch=99").exists())
  }
}
