package graft

import graft.operators.PcaTransform
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaTransformSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clustered(n: Int, nClusters: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(2024)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat * 3f))
    (0 until n).map { i =>
      val a = anchors(i % nClusters)
      (i.toLong, a.map(x => x + r.nextGaussian().toFloat * 0.1f))
    }
  }

  test("below TrainMin refuses to train") {
    val small = clustered(40, 4).toDF("doc_id", "embedding")
    assertThrows[IllegalArgumentException](PcaTransform.train(small, k = 4))
  }

  test("components are sign-canonicalized and variance-ordered") {
    val docs = clustered(300, 6).toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k = 6)
    pca.components.foreach { row =>
      val best = row.indices.maxBy(i => (math.abs(row(i)), -i))
      assert(row(best) > 0, "largest-|loading| element must be positive")
    }
    // descending explained variance over the training data itself
    val proj = PcaTransform.project(docs, pca)
      .select("pca").as[Seq[Float]].collect()
    val vars = (0 until 6).map { j =>
      val xs = proj.map(_(j).toDouble)
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(vars == vars.sorted.reverse,
      s"component variances not descending: $vars")
  }

  test("distributed projection == driver replay, bit-for-bit") {
    val data = clustered(250, 5)
    val docs = data.toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k = 8)
    val dist = PcaTransform.project(docs, pca)
      .select("doc_id", "pca").as[(Long, Seq[Float])].collect().toMap
    data.foreach { case (id, v) =>
      assert(dist(id) == PcaTransform.projectOne(pca, v).toSeq,
        s"projection drift for doc $id")
    }
  }

  test("full-rank PCA is an isometry: pairwise L2 distances preserved") {
    val data = clustered(200, 5, dim = 12)
    val docs = data.toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k = 12)
    val y = data.map { case (id, v) => id -> PcaTransform.projectOne(pca, v) }.toMap
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, z) => (x.toDouble - z) * (x.toDouble - z) }.sum
    for (i <- 0 until 20; j <- (i + 1) until 20) {
      val orig = d2(data(i)._2, data(j)._2)
      val proj = d2(y(data(i)._1), y(data(j)._1))
      assert(math.abs(orig - proj) <= 1e-3 * math.max(orig, 1.0),
        s"rotation broke distance ($i,$j): $orig vs $proj")
    }
  }

  test("save/load round-trips the artifact exactly") {
    val docs = clustered(150, 4).toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k = 5)
    val path = java.nio.file.Files.createTempDirectory("pca").toString + "/pca.txt"
    PcaTransform.save(spark, pca, path)
    val back = PcaTransform.load(spark, path)
    assert(back.mean.toSeq == pca.mean.toSeq)
    assert(back.components.map(_.toSeq).toSeq == pca.components.map(_.toSeq).toSeq)
    // buildOrLoad must hit the artifact, not retrain
    val again = PcaTransform.buildOrLoad(spark, docs.limit(0), k = 5, path)
    assert(again.components.map(_.toSeq).toSeq == pca.components.map(_.toSeq).toSeq)
  }

  test("projection and search plans: no exchange, codegen'd kernel") {
    val docs = clustered(300, 6).toDF("doc_id", "embedding")
    val pca = PcaTransform.train(docs, k = 8)
    // Plan-assert over parquet scans — a LocalRelation input would be
    // constant-folded into a LocalTableScan before the kernel is visible.
    val rawDir = java.nio.file.Files.createTempDirectory("pcaraw").toString
    docs.write.mode("overwrite").parquet(rawDir)
    val rawDocs = spark.read.parquet(rawDir)
    val dir = java.nio.file.Files.createTempDirectory("pcaplan").toString
    PcaTransform.project(rawDocs, pca).select("doc_id", "pca")
      .write.mode("overwrite").parquet(dir)
    val projected = spark.read.parquet(dir)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val projPlan = PcaTransform.project(rawDocs, pca).queryExecution.executedPlan
    assert(projPlan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"projection shuffled:\n$projPlan")
    assert(projPlan.toString.contains("pca_project_f32"),
      s"expected the pca_project_f32 kernel:\n$projPlan")
    val searchPlan = PcaTransform
      .search(projected, pca, clustered(1, 1).head._2, k = 5)
      .queryExecution.executedPlan
    assert(searchPlan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"PCA search shuffled:\n$searchPlan")
    assert(searchPlan.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k:\n$searchPlan")
    assert(searchPlan.collect { case w: WholeStageCodegenExec => w }.nonEmpty,
      s"PCA search fell out of codegen:\n$searchPlan")
  }
}
