package graft

import graft.operators.{OpqTransform, PcaTransform}
import org.scalatest.funsuite.AnyFunSuite

class OpqTransformSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 16
  private val m = 4

  /** Per-subspace clustered latents mixed by a fixed orthogonal matrix —
    * the structure OPQ exists to undo: axis-aligned subspace splits see
    * correlated dimensions until the rotation is learned. */
  private def mixed(n: Int): (Seq[(Long, Array[Float])], Array[Array[Double]]) = {
    val r = new scala.util.Random(515)
    val dsub = dim / m
    // orthogonal mixer via Gram-Schmidt on a random matrix
    val q = Array.fill(dim)(Array.fill(dim)(r.nextGaussian()))
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val dot = (0 until dim).map(c => q(i)(c) * q(j)(c)).sum
        for (c <- 0 until dim) q(i)(c) -= dot * q(j)(c)
      }
      val norm = math.sqrt(q(i).map(x => x * x).sum)
      for (c <- 0 until dim) q(i)(c) /= norm
    }
    val anchors = Array.fill(8)(Array.fill(dim)(r.nextGaussian() * 3))
    val data = (0 until n).map { i =>
      val z = new Array[Double](dim)
      // independent cluster choice PER SUBSPACE in latent space
      for (s <- 0 until m) {
        val a = anchors(r.nextInt(8))
        for (j <- s * dsub until (s + 1) * dsub)
          z(j) = a(j) + r.nextGaussian() * 0.05
      }
      val x = Array.tabulate(dim)(row =>
        (0 until dim).map(c => q(row)(c) * z(c)).sum.toFloat)
      (i.toLong, x)
    }
    (data, q)
  }

  test("trained rotation is orthogonal and reproducible") {
    val (data, _) = mixed(300)
    val docs = data.toDF("doc_id", "embedding")
    val rot = OpqTransform.train(docs, m, niter = 4, sampleSize = 300)
    val r = rot.components
    // R Rᵀ = I
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(c => r(i)(c) * r(j)(c)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"RRᵀ[$i][$j] = $dot")
    }
    assert(rot.mean.forall(_ == 0.0), "OPQ rotation must be zero-mean")
    val again = OpqTransform.train(docs, m, niter = 4, sampleSize = 300)
    assert(again.components.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq,
      "retrain on identical data must reproduce the rotation")
  }

  test("OPQ rotation reduces PQ quantization error on mixed data") {
    val (data, _) = mixed(400)
    val docs = data.toDF("doc_id", "embedding")
    val rot = OpqTransform.train(docs, m, niter = 8, sampleSize = 400)
    val raw = data.map(_._2.map(_.toDouble)).toArray
    val rotated = data
      .map(d => OpqTransform.rotateOne(rot, d._2).map(_.toDouble)).toArray
    val errRaw = OpqTransform.quantError(raw, m, ksub = 16)
    val errRot = OpqTransform.quantError(rotated, m, ksub = 16)
    assert(errRot < errRaw * 0.9,
      s"OPQ did not reduce quantization error: raw=$errRaw rotated=$errRot")
  }

  test("rotation preserves norms (search geometry intact)") {
    val (data, _) = mixed(120)
    val docs = data.toDF("doc_id", "embedding")
    val rot = OpqTransform.train(docs, m, niter = 2, sampleSize = 120)
    data.take(10).foreach { case (_, v) =>
      val y = OpqTransform.rotateOne(rot, v)
      val n0 = math.sqrt(v.map(x => x.toDouble * x).sum)
      val n1 = math.sqrt(y.map(x => x.toDouble * x).sum)
      assert(math.abs(n0 - n1) < 1e-3 * math.max(n0, 1.0))
    }
  }

  test("artifact round-trips through the PCA format") {
    val (data, _) = mixed(150)
    val docs = data.toDF("doc_id", "embedding")
    val rot = OpqTransform.train(docs, m, niter = 2, sampleSize = 150)
    val path = java.nio.file.Files.createTempDirectory("opq").toString + "/rot.txt"
    PcaTransform.save(spark, rot, path)
    val back = PcaTransform.load(spark, path)
    assert(back.components.map(_.toSeq).toSeq ==
      rot.components.map(_.toSeq).toSeq)
  }
}
