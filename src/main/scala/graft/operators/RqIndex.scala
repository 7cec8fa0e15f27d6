package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Residual (additive) quantizer — FAISS `IndexResidualQuantizer` /
  * `ResidualQuantizer` (faiss/impl/ResidualQuantizer.h) with the greedy
  * (beam = 1) encoder: `nlevels` FULL-dimension codebooks trained
  * sequentially, each on the residuals the previous level leaves
  * behind; a vector's code is one argmin per level and its
  * reconstruction is the SUM of the chosen centroids — the additive
  * family, where PQ is the concatenative one.
  *
  * Everything composes from pieces the engine already gates:
  *  - TRAIN is `nlevels` sequential [[IvfIndex.train]] fits (seeded
  *    MLlib KMeans), each on a residual projection of the previous —
  *    the residual chain is the codegen'd `nearest_centroid_f32` +
  *    `residual_f32` kernels, so level-(l+1) training data is
  *    bit-identical to what encode computes.
  *  - ENCODE is one narrow projection per corpus row: L chained
  *    (argmin, residual) kernel pairs, emitting `array<int>` codes of
  *    length L — `L·⌈log2 k⌉` bits/vector, the same codes-only
  *    compression posture as [[PqIndex]].
  *  - SEARCH is reconstructed-inner-product through the SHARED
  *    `adc_lut` kernel: per-level LUT entry `lut[l][c] = q · cent_l[c]`
  *    (double fold in dim order), per-row score = sum over levels in
  *    level order — exactly `q · decode(codes)` with distributivity,
  *    no decode materialized. Zero-shuffle TakeOrdered top-k.
  *
  * Artifacts reuse the [[PqIndex]] codebook format verbatim
  * (levels ⇔ subspaces, k ⇔ ksub, d ⇔ dsub), so save/load and the
  * generated-oracle lifecycle need nothing new. */
object RqIndex {

  /** levels(l)(code) = full-dim centroid of level l. */
  final case class Rq(levels: Option[Array[Array[Array[Double]]]],
                      nlevels: Int, k: Int) {
    def isTrained: Boolean = levels.isDefined
  }

  /** Sequential residual training: level l fits on what levels 0..l−1
    * failed to explain. Below [[IvfIndex.TrainMin]] stays untrained
    * (zero codes, the PQ posture). */
  def train(corpus: DataFrame, nlevels: Int = 2, k: Int = 16,
            embCol: String = "embedding"): Rq = {
    GraftFunctions.register(corpus.sparkSession)
    val n = corpus.count()
    if (n < IvfIndex.TrainMin) return Rq(None, nlevels, k)
    var cur = corpus.select(col(embCol).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lvls = (0 until nlevels).map { _ =>
        val ivf = IvfIndex.train(cur, k, "__v")
        val cents = ivf.centroids.getOrElse(
          throw new IllegalStateException("level fit below TrainMin"))
        val litc = typedLit(cents.map(_.toSeq).toSeq)
        val next = cur.select(GraftFunctions.residualF32(col("__v"), litc,
            GraftFunctions.nearestCentroidF32(col("__v"), litc)).as("__v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cur.unpersist()
        cur = next
        cents
      }.toArray
      Rq(Some(lvls), nlevels, k)
    } finally cur.unpersist()
  }

  /** Greedy per-level encode: `(idCol, codes)` with `codes(l)` the
    * level-l argmin — L chained kernel pairs in ONE projection, no
    * shuffle. Untrained degrades to zero codes. */
  def encode(corpus: DataFrame, rq: Rq, embCol: String = "embedding",
             idCol: String = "doc_id",
             keepCols: Seq[String] = Nil): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val kept = keepCols.map(col)
    rq.levels match {
      case None =>
        corpus.select(col(idCol) +: kept :+
          array(Seq.fill(rq.nlevels)(lit(0)): _*).as("codes"): _*)
      case Some(lvls) =>
        var df = corpus
        var cur: org.apache.spark.sql.Column = col(embCol)
        lvls.zipWithIndex.foreach { case (cents, l) =>
          val litc = typedLit(cents.map(_.toSeq).toSeq)
          df = df.withColumn(s"__c$l",
              GraftFunctions.nearestCentroidF32(cur, litc))
            .withColumn(s"__r$l",
              GraftFunctions.residualF32(cur, litc, col(s"__c$l")))
          cur = col(s"__r$l")
        }
        df.select(col(idCol) +: kept :+
          array(lvls.indices.map(l => col(s"__c$l")): _*).as("codes"): _*)
    }
  }

  /** Per-level reconstructed-dot LUT: `lut(l)(c) = q · levels(l)(c)`,
    * double accumulation in dim order (the [[SqIndex.reconDotLut]]
    * posture). */
  def reconDotLut(rq: Rq, queryVec: Array[Float]): Array[Array[Double]] = {
    val lvls = rq.levels.getOrElse(
      throw new IllegalStateException("RQ search needs a trained index"))
    lvls.map { cents =>
      cents.map { c =>
        var dot = 0.0
        var j = 0
        while (j < math.min(c.length, queryVec.length)) {
          dot += queryVec(j).toDouble * c(j); j += 1
        }
        dot
      }
    }
  }

  /** Top-k by reconstructed inner product over a codes-only corpus:
    * score = Σ_l lut[l][codes[l]] (= q · decode, distributed over the
    * sum), one shared-`adc_lut`-kernel projection + zero-shuffle
    * TakeOrdered, ties id ASC. */
  def search(encoded: DataFrame, rq: Rq, queryVec: Array[Float], k: Int,
             idCol: String = "doc_id"): DataFrame = {
    GraftFunctions.register(encoded.sparkSession)
    val lut = reconDotLut(rq, queryVec).map(_.toSeq).toSeq
    encoded
      .select(col(idCol),
        GraftFunctions.adcLut(col("codes"), typedLit(lut)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Decode codes to the additive reconstruction — FAISS
    * `IndexResidualQuantizer::reconstruct`: element j is
    * `float(Σ_l levels[l][codes[l]][j])` (double sum in level order,
    * one float cast at the end — the engine-wide "accumulate double,
    * store float" rule). Diagnostic/recovery path, not the query scan
    * (the [[PqIndex.decode]] posture). */
  def decode(encoded: DataFrame, rq: Rq, codesCol: String = "codes",
             outCol: String = "recon"): DataFrame =
    rq.levels match {
      case Some(lvls) =>
        val lit3 = typedLit(lvls.map(_.map(_.toSeq).toSeq).toSeq)
        val d = lvls(0)(0).length
        encoded.withColumn(outCol,
          transform(sequence(lit(0), lit(d - 1)), j =>
            aggregate(
              zip_with(col(codesCol),
                sequence(lit(1), lit(rq.nlevels)),
                (c, l) => element_at(element_at(element_at(lit3, l), c + 1),
                  j + 1)),
              lit(0.0), (acc, v) => acc + v).cast("float")))
      case None =>
        encoded.withColumn(outCol,
          transform(col(codesCol), c => (c * 0).cast("float")))
    }

  /** Per-vector reconstruction error `‖x − decode(encode(x))‖₂` — the
    * additive-quantizer quality audit, completing the triple with
    * [[SqIndex.reconstructionError]] (q88) and
    * [[PqIndex.reconstructionError]] (q99). One narrow projection,
    * no join with the codes store (encode is deterministic). */
  def reconstructionError(corpus: DataFrame, rq: Rq,
                          embCol: String = "embedding",
                          idCol: String = "doc_id",
                          outCol: String = "err"): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    decode(encode(corpus, rq, embCol, idCol, keepCols = Seq(embCol)), rq)
      .select(col(idCol),
        GraftFunctions.l2DistanceF32(col(embCol), col("recon")).as(outCol))
  }

  /** Artifact round-trip through the [[PqIndex]] codebook format
    * (levels ⇔ subspaces). */
  def save(spark: SparkSession, rq: Rq, path: String): Unit =
    PqIndex.save(spark, PqIndex.Pq(rq.levels, rq.nlevels, rq.k), path)

  def load(spark: SparkSession, path: String): Rq = {
    val pq = PqIndex.load(spark, path)
    Rq(pq.codebooks, pq.m, pq.ksub)
  }
}
