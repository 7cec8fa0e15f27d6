package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-style approximate search (SURVEY §2.3 J3): the Spark analog of
  * `IndexIVFFlat(quantizer, d, nlist=100)` at
  * `components/core/index_service.py:91-95`.
  *
  * MLlib KMeans learns the coarse quantizer; every corpus row gets a
  * `cell_id` column. A query then probes only the `nprobe` nearest cells —
  * an ordinary `filter(cell_id IN …)`, which Catalyst turns into partition
  * pruning when the corpus is written `partitionBy("cell_id")`. Training
  * follows the reference's policy: only when the corpus has ≥ `TrainMin`
  * vectors (`components/core/index_service.py:179-185`); below that the
  * "index" stays untrained and search degrades to the exact scan.
  */
object IvfIndex {
  val DefaultNlist = 100
  val TrainMin = 100 // reference trains IVF only at ≥100 vectors
  val Seed = 42L

  final case class Ivf(model: Option[KMeansModel], nlist: Int) {
    def isTrained: Boolean = model.isDefined
  }

  /** Train the coarse quantizer and assign `cell_id` to every row.
    * Returns the augmented corpus plus the model; an untrained corpus gets
    * constant `cell_id = 0`. */
  def build(corpus: DataFrame, nlist: Int = DefaultNlist,
            embCol: String = "embedding"): (DataFrame, Ivf) = {
    val n = corpus.count()
    if (n < TrainMin) {
      (corpus.withColumn("cell_id", lit(0)), Ivf(None, nlist))
    } else {
      val k = math.min(nlist, n).toInt
      val featurized = corpus.withColumn("__features", array_to_vector(col(embCol)))
      // 10 iterations: coarse-quantizer cells need locality, not converged
      // centroids; each extra iteration is a full pass over the corpus.
      val model = new KMeans()
        .setK(k).setSeed(Seed).setMaxIter(10)
        .setFeaturesCol("__features").setPredictionCol("cell_id")
        .fit(featurized)
      (model.transform(featurized).drop("__features"), Ivf(Some(model), nlist))
    }
  }

  /** Cells to probe for a query vector: the `nprobe` centroids nearest by
    * inner product (centroid table is tiny — ranked at the driver). */
  def probeCells(ivf: Ivf, queryVec: Array[Float], nprobe: Int): Seq[Int] =
    ivf.model match {
      case None => Seq(0)
      case Some(m) =>
        m.clusterCenters.zipWithIndex
          .map { case (c, i) =>
            val arr = c.toArray
            var dot = 0.0
            var j = 0
            while (j < math.min(arr.length, queryVec.length)) {
              dot += arr(j) * queryVec(j); j += 1
            }
            (dot, i)
          }
          .sortBy { case (d, i) => (-d, i) }
          .take(nprobe).map(_._2).toSeq
    }

  /** IVF search: prune to probed cells, then exact top-k inside them. */
  def search(corpusWithCells: DataFrame, ivf: Ivf, queryVec: Array[Float],
             k: Int, nprobe: Int, embCol: String = "embedding",
             idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(corpusWithCells.sparkSession)
    val cells = probeCells(ivf, queryVec, nprobe)
    val pruned = corpusWithCells.filter(col("cell_id").isin(cells: _*))
    VectorSearch.knnSingle(pruned, queryVec, k, embCol, idCol)
  }

  /** Narrow IVF search returning only `(idCol, score)` — skips the
    * fetch-back join when hit payloads aren't needed. */
  def searchScores(corpusWithCells: DataFrame, ivf: Ivf, queryVec: Array[Float],
                   k: Int, nprobe: Int, embCol: String = "embedding",
                   idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(corpusWithCells.sparkSession)
    val cells = probeCells(ivf, queryVec, nprobe)
    VectorSearch.knnScores(
      corpusWithCells.filter(col("cell_id").isin(cells: _*)),
      queryVec, k, embCol, idCol)
  }
}
