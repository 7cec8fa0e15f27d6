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
        // one file per touched cell per micro-batch (the RpForest
        // appendBatch rule): staged at full shuffle parallelism this
        // write sprays tasks × touched-cell files of dust per batch;
        // the batch is micro by contract, the extra exchange is noise
        .repartition(col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$corpusPath/batch=$batchId")
      // Health record: occupancy imbalance + the batch's mean residual
      // distance to its assigned centroids (the q137 drift metric, per
      // micro-batch — residuals growing across batches = the quantizer
      // drifting away from the incoming data; decimal idiom so the
      // number is partitioning-independent, ANSI-guarded for an empty
      // batch).
      val resid = withRes
        .select(graft.functions.GraftFunctions.normF32(col("__res")).as("__d"))
        .agg(count(lit(1)).as("__n"),
          sum(round(col("__d"), 6).cast("decimal(22,6)")).as("__sd"))
        .select(round(when(col("__n") > 0,
          col("__sd").cast("double") / col("__n").cast("double")), 4)
          .as("mean_resid"))
      IvfIndex.cellStats(withCells, ivf)
        .agg(sum("n_vectors").as("n_vectors"),
          first("imbalance_factor").as("imbalance_factor"))
        .crossJoin(resid)
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
    * compacted one (stream batch ids are non-negative; compacted dirs
    * take successive NEGATIVE ids, so they never collide), probed
    * searches prune by `cell_id` across both, and a later compaction
    * folds everything again. `repartition(cell_id)` gives each cell
    * one write task → one file per cell.
    *
    * Crash/racing discipline: ONLY the dirs in the initial snapshot are
    * read and later deleted, so a micro-batch landing mid-compaction is
    * neither folded nor dropped; the rename into place happens BEFORE
    * the snapshot dirs are deleted and its result is `require`d, so a
    * failure leaves the corpus intact (plus an orphan tmp dir that the
    * next run clears). A crash in the delete loop leaves some rows
    * visible twice — encode is deterministic, so the full-row
    * `dropDuplicates` here makes a re-run heal that exactly. The health
    * history under `statsPath` is separate and untouched. */
  def compactQuantizedCorpus(spark: SparkSession, corpusPath: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(corpusPath), spark.sparkContext.hadoopConfiguration)
    val seen = fs.globStatus(new org.apache.hadoop.fs.Path(s"$corpusPath/batch=*"))
    require(seen != null && seen.nonEmpty, s"no quantized corpus at $corpusPath")
    val tmp = new org.apache.hadoop.fs.Path(corpusPath + "__compact_tmp")
    fs.delete(tmp, true)
    val seenPaths = seen.map(_.getPath.toString).toSeq
    spark.read.option("basePath", corpusPath).parquet(seenPaths: _*)
      .drop("batch")
      .dropDuplicates()
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(tmp.toString)
    val seenIds = seenPaths.map(_.split("batch=").last.toLong)
    val target = math.min(seenIds.min, 0L) - 1L
    val dest = new org.apache.hadoop.fs.Path(s"$corpusPath/batch=$target")
    require(fs.rename(tmp, dest),
      s"compaction rename failed: $tmp -> $dest (corpus left untouched)")
    seen.foreach(s => fs.delete(s.getPath, true))
    ()
  }

  /** Per-batch health history
    * (batch_id, n_vectors, imbalance_factor, mean_resid). */
  def loadStats(spark: SparkSession, statsPath: String): DataFrame =
    spark.read.parquet(statsPath)
      .select(col("batch_id"), col("n_vectors"), col("imbalance_factor"),
        col("mean_resid"))
}
