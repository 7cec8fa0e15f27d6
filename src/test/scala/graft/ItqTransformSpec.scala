package graft

import graft.operators.{BinaryIndex, ItqTransform, PcaTransform}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ItqTransformSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 16
  private val k = 8

  /** Anisotropic clustered data — raw PCA axes cut the clusters badly,
    * which is the failure mode the ITQ rotation exists to fix. */
  private def fixture(n: Int): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(1137)
    val anchors = Array.fill(6)(Array.fill(dim)(r.nextGaussian() * 2))
    (0 until n).map { i =>
      val a = anchors(r.nextInt(6))
      (i.toLong, Array.tabulate(dim)(j =>
        (a(j) + r.nextGaussian() * 0.3 * (1.0 + j % 4)).toFloat))
    }
  }

  test("ITQ beats raw PCA signs on the binarization objective; deterministic") {
    val data = fixture(400)
    val docs = data.toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k)
    val itq = ItqTransform.train(docs, k, niter = 12, sampleSize = 400)
    val pts = data.map(_._2).toArray
    val rawErr = ItqTransform.quantError(pts, pca)
    val itqErr = ItqTransform.quantError(pts, itq)
    assert(itqErr < rawErr,
      s"ITQ objective $itqErr must beat raw PCA signs $rawErr")
    // identity init + LAPACK SVD: retrain reproduces the artifact
    val again = ItqTransform.train(docs, k, niter = 12, sampleSize = 400)
    assert(again.mean.toSeq == itq.mean.toSeq)
    assert(again.components.map(_.toSeq).toSeq ==
      itq.components.map(_.toSeq).toSeq)
  }

  test("the composed transform is a rotation of the PCA projection") {
    val data = fixture(300)
    val docs = data.toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k)
    val itq = ItqTransform.train(docs, k, niter = 6, sampleSize = 300)
    assert(itq.mean.toSeq == pca.mean.toSeq, "mean is the PCA mean")
    // orthogonal composition preserves projected norms
    for ((_, v) <- data.take(20)) {
      val np = PcaTransform.projectOne(pca, v).map(x => x.toDouble * x).sum
      val ni = PcaTransform.projectOne(itq, v).map(x => x.toDouble * x).sum
      assert(math.abs(np - ni) < 1e-4 * math.max(np, 1.0),
        s"rotation must preserve norms: $np vs $ni")
    }
  }

  test("encode/search parity with a driver-side replay; artifact round trip") {
    val data = fixture(250)
    val docs = data.toDF("doc_id", "embedding")
    val itq = ItqTransform.train(docs, k, niter = 6, sampleSize = 250)
    val codes = ItqTransform.encode(docs, itq)
    val qVec = data.head._2
    val got = ItqTransform.search(codes.filter($"doc_id" =!= 0L), itq, qVec, 5)
      .as[(Long, Long)].collect().toSeq
    // driver replay: same projection, same sign rule, same (dist, id) order
    val qc = BinaryIndex.packOne(PcaTransform.projectOne(itq, qVec))
    val exp = data.tail.map { case (id, v) =>
      val c = BinaryIndex.packOne(PcaTransform.projectOne(itq, v))
      (id, c.zip(qc).map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(5)
    assert(got == exp)
    // text artifact round trip reproduces the search exactly
    val tmp = java.nio.file.Files.createTempDirectory("itq-artifact")
    PcaTransform.save(spark, itq, s"$tmp/itq.txt")
    val loaded = PcaTransform.load(spark, s"$tmp/itq.txt")
    val again = ItqTransform
      .search(ItqTransform.encode(docs, loaded).filter($"doc_id" =!= 0L),
        loaded, qVec, 5)
      .as[(Long, Long)].collect().toSeq
    assert(again == got)
  }
}
