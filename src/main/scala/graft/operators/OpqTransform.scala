package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OPQ — Optimized Product Quantization (Ge et al., CVPR 2013; FAISS
  * `OPQMatrix`, faiss/VectorTransform.cpp): learn an orthogonal rotation
  * `R` that minimizes PQ reconstruction error, so subspace splits cut
  * across the data's correlated dimensions instead of its raw axes. The
  * trained rotation then fronts the ordinary PQ pipeline
  * (`OPQm,...,PQm` factory chains).
  *
  * Spark shape:
  *  - TRAIN runs on a DRIVER-SIDE SAMPLE — exactly FAISS's posture
  *    (`OPQMatrix::train` subsamples to `max_train_points`); the
  *    alternation (rotate → per-subspace k-means → orthogonal Procrustes
  *    via SVD) is inherently iterative small-matrix work, d×d per step.
  *    Nothing corpus-sized touches the driver: the sample is
  *    `sampleSize` rows by deterministic lowest-id order.
  *  - The result is returned as a [[PcaTransform.Pca]] with ZERO mean —
  *    a rotation IS a mean-free projection, so the codegen
  *    `pca_project_f32` kernel, the text artifact format, and the
  *    strict-left-fold oracle replay are all reused verbatim.
  *  - APPLY corpus-wide is [[PcaTransform.project]]; the rotated corpus
  *    feeds the gated PQ train/encode/search path unchanged.
  *
  * Determinism: ordered sample, seeded k-means++-free Lloyd (first-k
  * init over id order), LAPACK SVD — retrains reproduce the artifact.
  */
object OpqTransform {

  /** Train the OPQ rotation. `m` must divide the dimension. */
  def train(corpus: DataFrame, m: Int, ksub: Int = 16, niter: Int = 8,
            sampleSize: Int = 2000, embCol: String = "embedding",
            idCol: String = "doc_id"): PcaTransform.Pca = {
    val sample = corpus.orderBy(col(idCol)).limit(sampleSize)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= IvfIndex.TrainMin,
      s"OPQ needs >= ${IvfIndex.TrainMin} training vectors")
    val d = sample.head.length
    require(d % m == 0, s"m=$m must divide dim=$d")
    val dsub = d / m
    val n = sample.length

    import breeze.linalg.{DenseMatrix, svd => bsvd}
    val x = DenseMatrix.zeros[Double](n, d)
    for (i <- 0 until n; j <- 0 until d) x(i, j) = sample(i)(j)

    var r = DenseMatrix.eye[Double](d) // rotation, applied as y = x * r.t
    var iter = 0
    while (iter < niter) {
      val y = x * r.t
      // per-subspace Lloyd k-means (deterministic first-k init)
      val yhat = DenseMatrix.zeros[Double](n, d)
      for (s <- 0 until m) {
        val cols = s * dsub until (s + 1) * dsub
        val pts = Array.tabulate(n)(i => cols.map(y(i, _)).toArray)
        val assign = localKmeans(pts, math.min(ksub, n))
        for (i <- 0 until n; (j, ci) <- cols.zipWithIndex)
          yhat(i, j) = assign(i)(ci)
      }
      // orthogonal Procrustes: min_R ||X Rᵀ − Ŷ||_F  ⇒  M = XᵀŶ = USVᵀ,
      // Rᵀ = U Vᵀ
      val mmat = x.t * yhat
      val decomp = bsvd(mmat)
      r = (decomp.U * decomp.Vt).t
      iter += 1
    }
    PcaTransform.Pca(Array.fill(d)(0.0),
      Array.tabulate(d)(i => Array.tabulate(d)(j => r(i, j))))
  }

  /** Rotate a corpus with a trained OPQ rotation — delegates to the
    * codegen PCA projection (zero mean ⇒ pure rotation). */
  def rotate(df: DataFrame, rot: PcaTransform.Pca,
             embCol: String = "embedding", outCol: String = "rot"): DataFrame =
    PcaTransform.project(df, rot, embCol, outCol)

  /** Driver-side single-vector rotation (query path). */
  def rotateOne(rot: PcaTransform.Pca, v: Array[Float]): Array[Float] =
    PcaTransform.projectOne(rot, v)

  /** Mean per-point squared quantization error of a plain per-subspace
    * PQ on a driver matrix — the objective OPQ minimizes; exposed for
    * the spec's OPQ-beats-PQ property and for tuning audits. */
  private[graft] def quantError(pts: Array[Array[Double]], m: Int,
                                ksub: Int): Double = {
    val d = pts.head.length
    val dsub = d / m
    var err = 0.0
    for (s <- 0 until m) {
      val sub = pts.map(p => p.slice(s * dsub, (s + 1) * dsub))
      val rec = localKmeans(sub, math.min(ksub, pts.length))
      for (i <- pts.indices; j <- 0 until dsub) {
        val diff = sub(i)(j) - rec(i)(j)
        err += diff * diff
      }
    }
    err / pts.length
  }

  /** Deterministic Lloyd: centroids init to the first k points (input
    * order), 10 sweeps, ties to the lower centroid index. Returns each
    * point's reconstructed (assigned-centroid) vector. */
  private def localKmeans(pts: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val d = pts.head.length
    var cents = Array.tabulate(k)(i => pts(i).clone())
    val assign = new Array[Int](pts.length)
    var sweep = 0
    while (sweep < 10) {
      var i = 0
      while (i < pts.length) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0
          var j = 0
          while (j < d) {
            val t = pts(i)(j) - cents(c)(j); d2 += t * t; j += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      i = 0
      while (i < pts.length) {
        val c = assign(i)
        counts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
      sweep += 1
    }
    pts.indices.map(i => cents(assign(i))).toArray
  }
}
