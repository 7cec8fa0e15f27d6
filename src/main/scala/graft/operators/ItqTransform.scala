package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ITQ — Iterative Quantization (Gong & Lazebnik, CVPR 2011; FAISS
  * `ITQMatrix`/`ITQTransform`, faiss/VectorTransform.cpp): learn an
  * orthogonal rotation of the PCA-reduced space that minimizes the
  * binarization error `‖B − V R‖²_F` (B = sign(V R)), so the sign bits
  * of the rotated projection quantize the data better than raw PCA
  * axes. The trained front feeds the ordinary binary pipeline
  * (`ITQ<k>,LSH` factory chains → sign codes → Hamming scans).
  *
  * Spark shape (the [[OpqTransform]] posture):
  *  - TRAIN: the PCA front is the corpus-side [[PcaTransform.train]]
  *    (treeAggregated moments, driver eigendecomposition); the ITQ
  *    alternation itself runs on a DRIVER-SIDE SAMPLE (deterministic
  *    lowest-id order) — B = sign(V R) then orthogonal Procrustes via
  *    SVD is inherently iterative k×k work, exactly FAISS's
  *    `ITQMatrix::train` shape.
  *  - The result is ONE composed [[PcaTransform.Pca]] artifact
  *    (mean, Rᵀ·components): rotation folded into the projection, so
  *    the codegen `pca_project_f32` kernel, the text artifact format,
  *    and the strict-left-fold oracle replay are all reused verbatim —
  *    and ENCODE is `sign_pack(project(x))`, one narrow codegen map.
  *  - SEARCH is [[BinaryIndex.searchHamming]] over the k-bit codes
  *    (k ≤ 64 → one word per row).
  *
  * Determinism: identity-rotation init (the paper and FAISS use a
  * seeded random orthogonal; identity makes retrains bit-reproducible
  * with no RNG in the artifact lifecycle — iteration 1's Procrustes
  * immediately replaces it, and the spec pins that the alternation
  * still strictly reduces the objective vs raw PCA signs), ordered
  * sample, LAPACK SVD.
  */
object ItqTransform {

  /** Train the composed PCA+ITQ transform to `k` bits. */
  def train(corpus: DataFrame, k: Int, niter: Int = 20,
            sampleSize: Int = 2000, embCol: String = "embedding",
            idCol: String = "doc_id"): PcaTransform.Pca = {
    val pca = PcaTransform.train(corpus, k, embCol)
    val sample = corpus.orderBy(col(idCol)).limit(sampleSize)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.length >= IvfIndex.TrainMin,
      s"ITQ needs >= ${IvfIndex.TrainMin} training vectors")

    import breeze.linalg.{DenseMatrix, svd => bsvd}
    val n = sample.length
    val d = pca.mean.length
    // PCA-projected sample in full double precision (train-time only;
    // the query/corpus path uses the shared float kernel).
    val v = DenseMatrix.zeros[Double](n, k)
    for (i <- 0 until n; j <- 0 until k) {
      var acc = 0.0
      var l = 0
      while (l < d) {
        acc += pca.components(j)(l) * (sample(i)(l).toDouble - pca.mean(l))
        l += 1
      }
      v(i, j) = acc
    }

    var r = DenseMatrix.eye[Double](k)
    var iter = 0
    while (iter < niter) {
      val y = v * r
      val b = y.map(e => if (e > 0) 1.0 else -1.0)
      // orthogonal Procrustes: min_R ‖B − V R‖_F ⇒ M = VᵀB = USWᵀ, R = UWᵀ
      val dec = bsvd(v.t * b)
      r = dec.U * dec.Vt
      iter += 1
    }

    // Fold the rotation into the projection: z = y R with y_j = c_j·(x−μ)
    // ⇒ z_i = (Σ_j R[j][i] c_j)·(x−μ).
    val comps2 = Array.tabulate(k) { i =>
      val row = new Array[Double](d)
      var j = 0
      while (j < k) {
        val rji = r(j, i)
        var l = 0
        while (l < d) { row(l) += rji * pca.components(j)(l); l += 1 }
        j += 1
      }
      row
    }
    PcaTransform.Pca(pca.mean, comps2)
  }

  /** Binarization objective `‖sign(P) − P‖²_F / n` of a projected
    * driver matrix — what ITQ minimizes; exposed for the spec's
    * ITQ-beats-raw-PCA property and tuning audits. */
  private[graft] def quantError(pts: Array[Array[Float]],
                                t: PcaTransform.Pca): Double = {
    var err = 0.0
    for (p <- pts) {
      val y = PcaTransform.projectOne(t, p)
      for (e <- y) {
        val diff = (if (e > 0) 1.0 else -1.0) - e.toDouble
        err += diff * diff
      }
    }
    err / math.max(pts.length, 1)
  }

  /** Encode a corpus to k-bit sign codes under the composed transform:
    * project (codegen, no shuffle) then [[BinaryIndex.encode]]. */
  def encode(corpus: DataFrame, itq: PcaTransform.Pca,
             embCol: String = "embedding",
             idCol: String = "doc_id"): DataFrame =
    BinaryIndex.encode(
      PcaTransform.project(corpus, itq, embCol, outCol = "itq"),
      embCol = "itq", idCol = idCol)

  /** Hamming top-k under the composed transform: project+pack the query
    * on the driver, scan the codes table. */
  def search(codes: DataFrame, itq: PcaTransform.Pca, queryVec: Array[Float],
             k: Int, idCol: String = "doc_id"): DataFrame =
    BinaryIndex.searchHamming(codes,
      BinaryIndex.packOne(PcaTransform.projectOne(itq, queryVec)), k, idCol)
}
