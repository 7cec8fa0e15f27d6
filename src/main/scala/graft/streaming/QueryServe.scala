package graft.streaming

import graft.operators.{IvfIndex, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming query serving — the reference's request loop
  * (`components/server.py:110-122` answers WebSocket search requests
  * one at a time against the in-RAM index) re-expressed engine-side:
  * a STREAM of query vectors is answered in micro-batches against the
  * PERSISTED cell-partitioned IVFADC index, each batch through
  * [[PqIndex.searchIvfAdcBatch]] — one union-of-probed-cells scan per
  * micro-batch regardless of how many requests it carries, which is
  * exactly the batching a serving tier buys by queueing requests.
  *
  * The micro-batch's query vectors round-trip through the driver
  * deliberately (requests are the tiny side — the same driver-known-key
  * posture as every single-query fetch); the corpus is never collected
  * and never shuffled: probed partitions are scanned, the broadcast
  * (query, cell, slot) join fans rows out to their queries, and the
  * bounded aggregator ships only partial top-k lists.
  *
  * Results land at `resultsPath/batch=<id>` — the per-batch-id overwrite
  * makes an at-least-once retry idempotent (the [[IndexIngest]]
  * contract), and a results consumer tails the dir in batch order. */
object QueryServe {

  /** Max queries per [[graft.operators.GraphSearch.searchBeamBatch]]
    * call inside a graph-served micro-batch: each query adds a vector
    * literal + a dot column to every scan, so the per-call width is
    * bounded well under codegen's 64KB-method / constant-pool limits
    * while keeping the batched walk's shared-read win (measured
    * 3.7–10.5× at N=4–16 — already saturating inside this bound).
    * Round-10 driver-finding closure: burst micro-batches are split
    * into ≤GraphChunkSize walk calls, chunked ≡ one-call — QueryServeSpec
    * "graph-serve chunking: a burst micro-batch split into bounded walk
    * calls ≡ one call". */
  val GraphChunkSize = 32

  def servedSearch(queries: DataFrame, ivf: IvfIndex.Ivf, pq: PqIndex.Pq,
                   encoded: DataFrame, resultsPath: String,
                   checkpointPath: String, k: Int, nprobe: Int,
                   queryIdCol: String = "query_id",
                   embCol: String = "embedding")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(queries.isStreaming, "servedSearch expects a streaming DataFrame")
    queries.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        serveBatch(batch.toDF(), batchId, ivf, pq, encoded, resultsPath,
          k, nprobe, queryIdCol, embCol)
      }
      .start()
  }

  /** One micro-batch, extracted so retry semantics are testable without
    * forcing a real foreachBatch crash (the ingestBatch pattern). */
  private[graft] def serveBatch(batch: DataFrame, batchId: Long,
                                ivf: IvfIndex.Ivf, pq: PqIndex.Pq,
                                encoded: DataFrame, resultsPath: String,
                                k: Int, nprobe: Int,
                                queryIdCol: String, embCol: String): Unit = {
    val qs = batch.select(col(queryIdCol), col(embCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    if (qs.isEmpty) return
    PqIndex.searchIvfAdcBatch(encoded, ivf, pq, qs, k, nprobe)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$resultsPath/batch=$batchId")
  }

  /** Graph-tier serving: the same micro-batch request loop answered by
    * the BATCHED beam walk ([[graft.operators.GraphSearch.searchBeamBatch]])
    * instead of IVFADC — per hop the whole batch costs TWO jobs (shared
    * `src IN (beams)` expansion + one multi-dot pruned scan), so
    * queueing requests buys the measured 3.7–10.5× over per-request
    * walks. Same results layout and retry idempotence as
    * [[servedSearch]]; [[pruneResults]]/[[compactResults]] apply. */
  def servedGraphSearch(queries: DataFrame, graph: DataFrame,
                        withCells: DataFrame, ivf: IvfIndex.Ivf,
                        resultsPath: String, checkpointPath: String,
                        k: Int, nprobe: Int = 4, beamWidth: Int = 8,
                        hops: Int = 3, queryIdCol: String = "query_id",
                        embCol: String = "embedding")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(queries.isStreaming, "servedGraphSearch expects a streaming DataFrame")
    queries.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        serveGraphBatch(batch.toDF(), batchId, graph, withCells, ivf,
          resultsPath, k, nprobe, beamWidth, hops, queryIdCol, embCol)
      }
      .start()
  }

  /** One graph-served micro-batch (testable retry form). */
  private[graft] def serveGraphBatch(batch: DataFrame, batchId: Long,
                                     graph: DataFrame, withCells: DataFrame,
                                     ivf: IvfIndex.Ivf, resultsPath: String,
                                     k: Int, nprobe: Int, beamWidth: Int,
                                     hops: Int, queryIdCol: String,
                                     embCol: String,
                                     chunkSize: Int = GraphChunkSize): Unit = {
    val qs = batch.select(col(queryIdCol), col(embCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    if (qs.isEmpty) return
    // A micro-batch is unbounded (a queued burst arrives as ONE batch),
    // but each searchBeamBatch call bakes one vector literal + one
    // dot_f32 column per query into every scan — past a few dozen
    // queries that blows codegen limits (64KB method / constant pool →
    // interpreted-projection fallback) and bloats the driver plan.
    // Bound the per-call width and union the chunk results instead;
    // within a chunk the batched walk's shared-read win is intact.
    val out = qs.grouped(chunkSize).map { chunk =>
      graft.operators.GraphSearch.searchBeamBatch(graph, withCells, ivf,
        chunk, k, nprobe, beamWidth, hops)
    }.reduce(_ unionAll _)
    out.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$resultsPath/batch=$batchId")
  }

  /** All served results so far: partition discovery yields the `batch`
    * dir column, and each row also carries the written `batch_id`, so a
    * consumer can order batches and drop retried duplicates. */
  def loadResults(spark: org.apache.spark.sql.SparkSession,
                  resultsPath: String): DataFrame =
    spark.read.parquet(resultsPath)

  /** Retention for the results dir — the serving-side analog of
    * [[IndexIngest.compactQuantizedCorpus]]: a long-lived stream
    * otherwise accumulates one `batch=<id>` dir per micro-batch forever,
    * and every [[loadResults]] pays the whole listing. Results are a
    * QUEUE, not a corpus — a consumer acknowledges a batch id watermark
    * and everything at or below it is dead. Deletes only
    * `batch=<id> <= upToBatchId` dirs (ids above the watermark and
    * non-batch paths are untouched), so a micro-batch landing
    * mid-prune is never dropped. Compacted dirs (negative ids, from
    * [[compactResults]]) hold long-retention history, not queue
    * entries, and are never pruned here. Returns the number of batch
    * dirs removed. */
  def pruneResults(spark: org.apache.spark.sql.SparkSession,
                   resultsPath: String, upToBatchId: Long): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(resultsPath), spark.sparkContext.hadoopConfiguration)
    val seen = fs.globStatus(new org.apache.hadoop.fs.Path(s"$resultsPath/batch=*"))
    if (seen == null) return 0
    val dead = seen.filter { s =>
      val id = s.getPath.getName.stripPrefix("batch=").toLong
      id >= 0 && id <= upToBatchId
    }
    dead.foreach(s => fs.delete(s.getPath, true))
    dead.length
  }

  /** Fold every retained `batch=<id>` dir into ONE compacted dir so the
    * listing stays bounded even for results kept long-term (audit /
    * replay). The [[IndexIngest.compactQuantizedCorpus]] discipline:
    * only the snapshot dirs are folded and deleted (a racing micro-batch
    * is neither folded nor dropped), retried-duplicate rows collapse via
    * full-row dropDuplicates (serving is deterministic), the rename into
    * a fresh NEGATIVE batch id happens before any delete and is
    * `require`d, so a failure leaves results intact. */
  def compactResults(spark: org.apache.spark.sql.SparkSession,
                     resultsPath: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(resultsPath), spark.sparkContext.hadoopConfiguration)
    val seen = fs.globStatus(new org.apache.hadoop.fs.Path(s"$resultsPath/batch=*"))
    require(seen != null && seen.nonEmpty, s"no served results at $resultsPath")
    val tmp = new org.apache.hadoop.fs.Path(resultsPath + "__compact_tmp")
    fs.delete(tmp, true)
    val seenPaths = seen.map(_.getPath.toString).toSeq
    spark.read.option("basePath", resultsPath).parquet(seenPaths: _*)
      .drop("batch")
      .dropDuplicates()
      .write.mode("overwrite").parquet(tmp.toString)
    val seenIds = seenPaths.map(_.split("batch=").last.toLong)
    val target = math.min(seenIds.min, 0L) - 1L
    val dest = new org.apache.hadoop.fs.Path(s"$resultsPath/batch=$target")
    require(fs.rename(tmp, dest),
      s"results compaction rename failed: $tmp -> $dest (results left untouched)")
    seen.foreach(s => fs.delete(s.getPath, true))
    ()
  }
}
