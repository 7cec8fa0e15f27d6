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

  test("graph-tier serving == direct batched walk; retry idempotent") {
    import graft.operators.KnnGraph
    val corpus = clustered(0 until 300, 6)
    val docs = corpus.toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 6)
    val withCells = IvfIndex.assign(docs, ivf)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("serve-graph").toString
    val staging = s"$dir/requests"
    val reqs1 = Seq(100L -> corpus(5)._2, 101L -> corpus(17)._2)
    val reqs2 = Seq(102L -> corpus(40)._2)
    reqs1.toDF("query_id", "embedding").write.mode("append").parquet(staging)
    val q = QueryServe.servedGraphSearch(
      spark.readStream.schema(schema).parquet(staging),
      graph, withCells, ivf, s"$dir/results", s"$dir/ckpt",
      k = 5, nprobe = 2, beamWidth = 6, hops = 3)
    try {
      q.processAllAvailable()
      reqs2.toDF("query_id", "embedding").write.mode("append").parquet(staging)
      q.processAllAvailable()
    } finally q.stop()

    val served = QueryServe.loadResults(spark, s"$dir/results")
      .select("query_id", "rnk", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val direct = graft.operators.GraphSearch.searchBeamBatch(
        graph, withCells, ivf, reqs1 ++ reqs2,
        k = 5, nprobe = 2, beamWidth = 6, hops = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == direct, "graph serving diverged from the direct batched walk")

    // Redelivery of a batch id overwrites in place.
    val before = QueryServe.loadResults(spark, s"$dir/results").count()
    QueryServe.serveGraphBatch(reqs1.toDF("query_id", "embedding"), 0L,
      graph, withCells, ivf, s"$dir/results", 5, 2, 6, 3,
      "query_id", "embedding")
    assert(QueryServe.loadResults(spark, s"$dir/results").count() == before)
  }

  test("graph-serve chunking: a burst micro-batch split into bounded walk calls ≡ one call") {
    import graft.operators.KnnGraph
    val corpus = clustered(0 until 300, 6)
    val docs = corpus.toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 6)
    val withCells = IvfIndex.assign(docs, ivf)
    val graph = KnnGraph.cellBlocked(docs, ivf, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("serve-chunk").toString
    // A 5-query burst with chunkSize=2 → three searchBeamBatch calls
    // unioned; rows must be identical to the single unchunked call.
    val burst = (0 until 5).map(i => (200L + i) -> corpus(i * 11)._2)
    QueryServe.serveGraphBatch(burst.toDF("query_id", "embedding"), 0L,
      graph, withCells, ivf, s"$dir/results", 5, 2, 6, 3,
      "query_id", "embedding", chunkSize = 2)
    val served = QueryServe.loadResults(spark, s"$dir/results")
      .select("query_id", "rnk", "doc_id", "score")
      .as[(Long, Long, Long, Double)].collect().toSet
    val direct = graft.operators.GraphSearch.searchBeamBatch(
        graph, withCells, ivf, burst, k = 5, nprobe = 2,
        beamWidth = 6, hops = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(served == direct, "chunked graph serve diverged from one unchunked call")
  }

  test("results retention: watermark prune + compaction keep loadResults exact and the listing bounded") {
    val corpus = clustered(0 until 300, 6)
    val docs = corpus.toDF("doc_id", "embedding")
    val ivf = IvfIndex.train(docs, nlist = 6)
    val withCells = IvfIndex.assign(docs, ivf)
    val (enc0, pq) = PqIndex.buildIvfAdc(withCells, ivf, m = 4, ksub = 8)
    val dir = java.nio.file.Files.createTempDirectory("serve-retain").toString
    enc0.select("doc_id", "cell_id", "codes")
      .write.partitionBy("cell_id").parquet(s"$dir/index")
    val encoded = spark.read.parquet(s"$dir/index")
    val results = s"$dir/results"

    // Five served micro-batches, one query each.
    (0 until 5).foreach { b =>
      QueryServe.serveBatch(
        Seq((100L + b) -> corpus(b * 7)._2).toDF("query_id", "embedding"),
        b.toLong, ivf, pq, encoded, results, 5, 2, "query_id", "embedding")
    }
    def rows() = QueryServe.loadResults(spark, results)
      .select("query_id", "doc_id", "adc", "doc_rank", "batch_id")
      .as[(Long, Long, Double, Int, Long)].collect().toSet
    val all = rows()
    assert(all.map(_._5) == Set(0L, 1L, 2L, 3L, 4L))

    // Consumer acknowledges through batch 2: exactly those dirs go,
    // loadResults is the pre-prune set minus the pruned batches.
    val removed = QueryServe.pruneResults(spark, results, upToBatchId = 2L)
    assert(removed == 3)
    assert(rows() == all.filter(_._5 > 2L))
    // Idempotent: nothing at/below the watermark remains.
    assert(QueryServe.pruneResults(spark, results, upToBatchId = 2L) == 0)

    // Compaction folds the surviving dirs into ONE negative-id dir with
    // identical row content — the listing is bounded regardless of how
    // many micro-batches were served.
    val beforeCompact = rows()
    QueryServe.compactResults(spark, results)
    val dirs = new java.io.File(results).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs == Set("batch=-1"), s"expected one compacted dir, got $dirs")
    assert(rows() == beforeCompact)

    // A later micro-batch appends beside the compacted dir; the
    // watermark prune removes it but never the compacted history.
    QueryServe.serveBatch(
      Seq(200L -> corpus(11)._2).toDF("query_id", "embedding"),
      7L, ivf, pq, encoded, results, 5, 2, "query_id", "embedding")
    assert(rows().map(_._5) == beforeCompact.map(_._5) + 7L)
    assert(QueryServe.pruneResults(spark, results, upToBatchId = 7L) == 1)
    assert(rows() == beforeCompact)
  }
}
