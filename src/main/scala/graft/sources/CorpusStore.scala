package graft.sources

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus persistence + maintenance (SURVEY §2.1 S4/S5, §2.7, §2.10 ST4).
  *
  * Replaces the reference's FAISS-file + pickle-metadata sidecar pair
  * (`components/core/index_service.py:48-125`) with ONE Parquet table whose
  * embedding is a column — identity is the explicit `doc_id`, not FAISS row
  * position. Incremental growth (validated task outputs written back,
  * `components2/faiss_retriever.py:194-242`) is `unionByName` append;
  * rebuild is `mode("overwrite")`.
  */
object CorpusStore {

  def save(corpus: DataFrame, path: String): Unit =
    corpus.write.mode("overwrite").parquet(path)

  /** Load-or-create (`components/core/index_service.py:48-80`): empty
    * corpus with the given schema when the path doesn't exist. */
  def loadOrCreate(spark: SparkSession, path: String, like: => DataFrame): DataFrame =
    if (exists(spark, path)) spark.read.parquet(path)
    else like.limit(0)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Incremental append (metadata `extend` at
    * `components/core/index_service.py:188-189`): id-disjoint union. */
  def append(corpus: DataFrame, newRows: DataFrame, idCol: String = "doc_id"): DataFrame =
    corpus.unionByName(
      newRows.join(corpus.select(col(idCol)), Seq(idCol), "left_anti"),
      allowMissingColumns = true)

  /** Id-selector removal — FAISS `index.remove_ids(IDSelectorArray)`:
    * drop the listed ids from a corpus/codes table. Small removal sets
    * broadcast (`isin` for driver-known ids); arbitrary-size removal
    * frames anti-join. Works identically on float corpora and encoded
    * (codes-only) stores — the engine's indexes are id-keyed tables, so
    * removal is a filter, not a positional re-pack like FAISS's. */
  def removeIds(corpus: DataFrame, ids: Seq[Long],
                idCol: String = "doc_id"): DataFrame =
    corpus.filter(!col(idCol).isin(ids: _*))

  /** Frame form of [[removeIds]] for removal sets too large to hold on
    * the driver: left-anti join on the id column. */
  def removeIdsFrame(corpus: DataFrame, ids: DataFrame,
                     idCol: String = "doc_id"): DataFrame =
    corpus.join(ids.select(col(idCol)), Seq(idCol), "left_anti")

  /** Index merge — FAISS `merge_from` / `merge_ondisk`: id-disjoint
    * union of two stores trained with the SAME artifacts (quantizer /
    * codebooks / bounds); the caller owns that invariant, this owns the
    * id discipline (left store wins duplicate ids, [[append]]'s rule). */
  def merge(left: DataFrame, right: DataFrame,
            idCol: String = "doc_id"): DataFrame =
    append(left, right, idCol)

  /** Snapshot diff — the data-ops audit between two corpus versions:
    * every id classified `added` / `removed` / `changed` / `unchanged`
    * by content fingerprint (md5 — replicable cross-engine like every
    * hash in this codebase). ONE full-outer join on the id; both sides
    * reduce to (id, fp) before the exchange, so the shuffle carries
    * ~48 B/row regardless of document size, and bucketed-by-id corpus
    * layouts make the join co-partitioned. Callers usually filter
    * `status != 'unchanged'`. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    // NULL text gets a sentinel fingerprint ("null" is not a hex
    // digest, so it cannot collide): fp nullability must mean "id
    // absent from this snapshot" (the join-miss signal), never "text
    // was null" — otherwise a null-text row present in both snapshots
    // would misclassify as added/removed.
    def fp(df: DataFrame, as: String) = df.select(col(idCol),
      coalesce(md5(col(textCol).cast("binary")), lit("null")).as(as))
    fp(oldDf, "old_fp").join(fp(newDf, "new_fp"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged"))
  }

  /** Clear-then-rebuild (`components/core/index_service.py:127-141`). */
  def rebuild(spark: SparkSession, path: String, fresh: DataFrame): DataFrame = {
    save(fresh, path)
    spark.read.parquet(path)
  }

  /** S8 aux metadata sinks (`components/index_manager.py:132-143,172-176`):
    * the processed-files manifest and per-file detail records as one JSON
    * sink — derived FROM the corpus table (one aggregation row per source
    * file) rather than tracked imperatively alongside it, so the manifest
    * can never drift from the corpus it describes. Returns the manifest
    * for further use. */
  def writeProcessedManifest(corpus: DataFrame, path: String,
                             filenameCol: String = "filename"): DataFrame = {
    val manifest = corpus.groupBy(col(filenameCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum("size").cast("long").as("total_chars"),
        min("chunk_index").cast("long").as("first_chunk"),
        max("chunk_index").cast("long").as("last_chunk"))
      .orderBy(filenameCol)
    manifest.write.mode("overwrite").json(path)
    manifest
  }

  /** ST4 write-back + IVF maintenance: append validated outputs; retrain
    * the coarse quantizer only when it was untrained and the corpus now
    * clears the training threshold — the reference's bulk-add-only retrain
    * policy (`components/core/index_service.py:179-185`). Corpus written
    * partitioned by cell_id so probes prune parquet partitions. */
  def appendWithIvf(corpusWithCells: DataFrame, newRows: DataFrame,
                    ivf: IvfIndex.Ivf, nlist: Int = IvfIndex.DefaultNlist,
                    embCol: String = "embedding", idCol: String = "doc_id")
      : (DataFrame, IvfIndex.Ivf) = {
    val appended = append(corpusWithCells.drop("cell_id"), newRows, idCol)
    if (!ivf.isTrained && appended.count() >= IvfIndex.TrainMin)
      IvfIndex.build(appended, nlist, embCol)
    else (IvfIndex.assign(appended, ivf, embCol), ivf)
  }
}
