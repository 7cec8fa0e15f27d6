package graft.streaming

import graft.operators.{IvfIndex, PqIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming quantized ingest — the ANN-index half of the incremental
  * pipeline ([[graft.operators.Dedup.screenedIngest]] owns the dedup
  * half): new embedding batches are assigned to cells with the
  * PERSISTED coarse quantizer, residual-PQ encoded with the PERSISTED
  * codebooks, and appended to the cell-partitioned codes corpus — the
  * FAISS add-after-train lifecycle (`index.add` on a trained
  * `IndexIVFPQ`) as a `foreachBatch` stream.
  *
  * Layout: `corpusPath/batch=<id>/cell_id=<c>/…` — the per-batch-id dir
  * makes an at-least-once retry an idempotent overwrite (the
  * screenedIngest contract), and `cell_id` stays a partition column
  * UNDER it, so a probed search over the whole corpus still prunes to
  * `nprobe/nlist` of every batch's files. No shuffle anywhere: assign +
  * residual + encode is one codegen projection, and the write
  * partitions by a column the batch already carries.
  *
  * Index health rides along: each batch overwrites a one-row stats dir
  * (`statsPath/batch=<id>`) carrying the batch's occupancy imbalance
  * against the quantizer — the drift signal an operator watches to
  * decide a RETRAIN (which is an offline rebuild, exactly as in FAISS;
  * a streaming job never retrains the quantizer it is encoding with,
  * or batches before and after the flip would live in different
  * geometries). */
object IndexIngest {

  def quantizedIngest(newVecs: DataFrame, ivf: IvfIndex.Ivf, pq: PqIndex.Pq,
                      corpusPath: String, statsPath: String,
                      checkpointPath: String,
                      idCol: String = "doc_id", embCol: String = "embedding")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(newVecs.isStreaming, "quantizedIngest expects a streaming DataFrame")
    newVecs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, ivf, pq, corpusPath, statsPath,
          idCol, embCol)
      }
      .start()
  }

  /** One micro-batch, extracted so retry semantics are testable without
    * forcing a real foreachBatch crash (the screenBatch pattern). */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
                                 ivf: IvfIndex.Ivf, pq: PqIndex.Pq,
                                 corpusPath: String, statsPath: String,
                                 idCol: String, embCol: String): Unit = {
    val withCells = IvfIndex.assign(batch, ivf, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val withRes = withCells.withColumn("__res",
        PqIndex.residualColumn(ivf, col(embCol), col("cell_id")))
      PqIndex.encode(withRes, pq, "__res")
        .select(col(idCol), col("cell_id"), col("codes"))
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$corpusPath/batch=$batchId")
      IvfIndex.cellStats(withCells, ivf)
        .agg(sum("n_vectors").as("n_vectors"),
          first("imbalance_factor").as("imbalance_factor"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").parquet(s"$statsPath/batch=$batchId")
    } finally withCells.unpersist()
  }

  /** The full streamed corpus: partition discovery yields `batch` AND
    * `cell_id` columns, so [[PqIndex.searchIvfAdc]] over it prunes by
    * cell across every batch dir. */
  def loadCorpus(spark: SparkSession, corpusPath: String): DataFrame =
    spark.read.parquet(corpusPath)

  /** Fold the per-batch dirs of a streamed quantized corpus into ONE
    * compacted dir (`batch=-1/cell_id=<c>/…`, one file per cell) — the
    * [[graft.operators.Dedup.compactSignatureStore]] maintenance
    * contract for the codes corpus. A year of micro-batches otherwise
    * leaves thousands of `batch=<id>` dirs whose file listing and
    * per-file open cost tax every probed search.
    *
    * The `batch=`/`cell_id=` partition scheme is PRESERVED: later
    * micro-batches keep appending `batch=<id>` dirs beside the
    * compacted one (batch ids are non-negative, so `-1` never
    * collides), probed searches prune by `cell_id` across both, and a
    * later compaction folds everything again. `repartition(cell_id)`
    * gives each cell one write task → one file per cell. Run it
    * offline or between batches, like a FAISS merge; the health
    * history under `statsPath` is separate and untouched. */
  def compactQuantizedCorpus(spark: SparkSession, corpusPath: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(corpusPath), spark.sparkContext.hadoopConfiguration)
    val seen = fs.globStatus(new org.apache.hadoop.fs.Path(s"$corpusPath/batch=*"))
    require(seen != null && seen.nonEmpty, s"no quantized corpus at $corpusPath")
    val tmp = new org.apache.hadoop.fs.Path(corpusPath + "__compact_tmp")
    fs.delete(tmp, true)
    spark.read.parquet(corpusPath)
      .drop("batch")
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(tmp.toString)
    seen.foreach(s => fs.delete(s.getPath, true))
    fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$corpusPath/batch=-1"))
    ()
  }

  /** Per-batch health history (batch_id, n_vectors, imbalance_factor). */
  def loadStats(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.parquet(statsPath)
      .select(col("batch_id"), col("n_vectors"), col("imbalance_factor"))
}
