package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide k-NN graph construction — FAISS's `knn`/knn-graph
  * utilities (faiss/utils/distances.h `knn_inner_product`, and the graph
  * builds behind NSG/NN-descent): every vector's top-k neighbors, here
  * restricted to its IVF coarse cell (the nprobe=1 graph). The graph is
  * the substrate for clustering, SemDeDup-style analyses and
  * diversification passes over a training corpus.
  *
  * Scale shape:
  *  - The all-pairs problem is made tractable the same way the engine's
  *    other embedding-space ops are ([[SemanticDedup.pairs]]): an
  *    EQUALITY self-join on `cell_id` — never a cartesian — with cells
  *    truncated to `maxCellSize` lowest ids (a mega-cell means the
  *    quantizer needs more cells, not an O(m²) join).
  *  - Ranking partitions the window by `(cell_id, src)`: each doc lives
  *    in exactly ONE cell, so the join's `HashPartitioning(cell_id)`
  *    already satisfies the window's clustering requirement — Catalyst
  *    inserts a sort but NO second exchange (plan-asserted in the spec).
  *  - Output is `(src, dst, rnk, score)`; docs alone in their cell have
  *    no in-cell neighbors and are absent — at real nlist sizing that
  *    means "nothing within coarse range", the same contract as an IVF
  *    probe finding an empty list.
  */
object KnnGraph {

  /** Cell-blocked k-NN graph over an IVF-assigned corpus. */
  def cellBlocked(docs: DataFrame, ivf: IvfIndex.Ivf, k: Int,
                  maxCellSize: Int = SemanticDedup.DefaultMaxCellSize,
                  idCol: String = "doc_id",
                  embCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val celled = IvfIndex.assign(docs, ivf, embCol)
      .select(col(idCol).as("id"), col(embCol).as("emb"), col("cell_id"))
    val capped = celled
      .withColumn("__rn",
        row_number().over(Window.partitionBy("cell_id").orderBy("id")))
      .filter(col("__rn") <= maxCellSize)
      .drop("__rn")
    val w = Window.partitionBy(col("cell_id"), col("src"))
      .orderBy(desc("score"), col("dst").asc)
    capped.select(col("id").as("src"), col("emb").as("ea"), col("cell_id"))
      .join(capped.select(col("id").as("dst"), col("emb").as("eb"),
        col("cell_id")), Seq("cell_id"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score", GraftFunctions.dotF32(col("ea"), col("eb")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("src"), col("dst"), col("rnk").cast("long").as("rnk"),
        col("score"))
  }
}
