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

  /** All served results so far: partition discovery yields the `batch`
    * dir column, and each row also carries the written `batch_id`, so a
    * consumer can order batches and drop retried duplicates. */
  def loadResults(spark: org.apache.spark.sql.SparkSession,
                  resultsPath: String): DataFrame =
    spark.read.parquet(resultsPath)
}
